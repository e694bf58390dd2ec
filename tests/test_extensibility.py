"""Extensibility surfaces: custom WKT shape parser (ParseShapeByType
analog, WktCustomShapeParserTest.cs:84-113) and spark.udf.register of
the st_* kernel UDFs for SQL text queries."""
import pytest

from spatial4n_spark.kernels import wkt as W


def test_custom_shape_parser_round():
    def parse_custom(st, geo):
        # reference test shape: "custom(...)" with an empty body
        st.expect("(")
        st.expect(")")
        d = W._empty()
        d["kind"] = 99
        return d

    W.register_shape_parser("CUSTOMSHAPE", parse_custom)
    try:
        rec = W.parse_shape("CUSTOMSHAPE ( )")
        assert rec["kind"] == 99
        # built-in grammar is untouched
        assert W.parse_shape("POINT (1 2)")["kind"] == W.KIND_POINT
        # batch path consults the registry too
        recs, errs = W.parse_wkt_batch(["CUSTOMSHAPE()", "POINT (3 4)"])
        assert errs == [None, None]
        assert recs[0]["kind"] == 99 and recs[1]["x"] == 3.0
    finally:
        W.unregister_shape_parser("CUSTOMSHAPE")
    # unregistered -> back to an error
    _, errs = W.parse_wkt_batch(["CUSTOMSHAPE()"])
    assert errs[0] is not None


def test_custom_parser_can_fall_through():
    def maybe(st, geo):
        return None  # decline -> built-in grammar runs

    W.register_shape_parser("POINT", maybe)
    try:
        assert W.parse_shape("POINT (5 6)")["x"] == 5.0
    finally:
        W.unregister_shape_parser("POINT")


def test_sql_function_registration(spark):
    from spatial4n_spark import functions as SF
    names = SF.register_sql_functions(spark)
    assert "st_from_wkt" in names
    spark.createDataFrame([("POINT (10.5 -3.25)",)], ["wkt"]) \
        .createOrReplaceTempView("shapes_sql_test")
    row = spark.sql("""
        SELECT st_from_wkt(wkt).x AS x, st_from_wkt(wkt).y AS y,
               st_buffer(1, st_from_wkt(wkt).x, st_from_wkt(wkt).y,
                         cast(null as double), cast(null as double),
                         cast(null as double), cast(null as double),
                         cast(null as double),
                         cast(null as array<double>),
                         cast(null as array<double>),
                         cast(null as array<int>), 2.5).radius AS r
        FROM shapes_sql_test""").first()
    assert (row.x, row.y, row.r) == (10.5, -3.25, 2.5)
