"""Polygon validation/repair rules + rect demotion + dateline rules.

Mirrors the reference's parser tests:
- rect demotion: NtsWktShapeParserTest.TestPolyToRect, PolyToRect180Rule,
  PolyToRectCcwRule (reference NtsWktShapeParser.cs:125-158)
- validation/repair: NtsWktShapeParserTest.TestWrapTopologyException,
  TestPolygonRepair (NtsWktShapeParser.cs:266-297, enums :304-368)
"""
import numpy as np
import pytest

from spatial4n_spark.context import SpatialEngineContext
from spatial4n_spark.kernels import wkt
from spatial4n_spark.kernels.pip import relate_polygon_polygon
from spatial4n_spark.kernels.relation import CONTAINS


P = wkt.parse_shape

BOWTIE = "POLYGON((0 0, 10 0, 10 20, 5 -5, 0 20, 0 0))"  # self-intersects
UNCLOSED = "POLYGON((0 0, 10 0, 10 20))"                  # doesn't connect


# ---- rect demotion -------------------------------------------------------

def test_poly_to_rect():
    # NtsWktShapeParserTest.TestPolyToRect
    r = P("POLYGON((0 5, 10 5, 10 20, 0 20, 0 5))")
    assert r["kind"] == wkt.KIND_RECT
    assert (r["minx"], r["maxx"], r["miny"], r["maxy"]) == (0, 10, 5, 20)


def test_poly_to_rect_180_rule():
    # PolyToRect180Rule: >180-wide rect ring crosses under Width180,
    # regardless of point order
    for w in ["POLYGON((160 0, -170 0, -170 10, 160 10, 160 0))",   # ccw
              "POLYGON((160 10, -170 10, -170 0, 160 0, 160 10))"]:  # cw
        r = P(w)
        assert r["kind"] == wkt.KIND_RECT
        assert (r["minx"], r["maxx"], r["miny"], r["maxy"]) == (160, -170, 0, 10)


def test_poly_to_rect_ccw_rule():
    # PolyToRectCcwRule: CCW => normal, CW => dateline-crossing
    ccw = P("POLYGON((160 0, -170 0, -170 10, 160 10, 160 0))",
            dateline_rule="ccwRect")
    assert (ccw["minx"], ccw["maxx"]) == (160, -170)
    cw = P("POLYGON((160 10, -170 10, -170 0, 160 0, 160 10))",
           dateline_rule="ccwRect")
    assert (cw["minx"], cw["maxx"]) == (-170, 160)


def test_poly_to_rect_dateline_none():
    # DatelineRule.None: no polygon crosses the dateline
    r = P("POLYGON((160 0, -170 0, -170 10, 160 10, 160 0))",
          dateline_rule="none")
    assert r["kind"] == wkt.KIND_RECT
    assert (r["minx"], r["maxx"]) == (-170, 160)


def test_non_rect_polygon_not_demoted():
    r = P("POLYGON((0 0, 10 0, 5 5, 0 0))")
    assert r["kind"] == wkt.KIND_POLYGON


def test_rect_ring_with_hole_not_demoted():
    r = P("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0),"
          "(2 2, 8 2, 8 8, 2 8, 2 2))")
    assert r["kind"] == wkt.KIND_POLYGON


# ---- validation (default = error, reference default) ---------------------

def test_unclosed_ring_always_errors():
    # reference: LinearRing construction throws even with validation off
    for rule in ("none", "error", "repairConvexHull", "repairBuffer0"):
        with pytest.raises(wkt.WktParseError):
            P(UNCLOSED, validation_rule=rule)


def test_self_intersect_errors_by_default():
    # TestWrapTopologyException second case
    with pytest.raises(wkt.WktParseError):
        P(BOWTIE)


def test_validation_none_accepts_self_intersect():
    r = P(BOWTIE, validation_rule="none")
    assert r["kind"] == wkt.KIND_POLYGON
    assert len(r["xs"]) == 6


def test_valid_polygon_with_hole_passes_validation():
    r = P("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0),"
          "(2 2, 8 2, 8 8, 2 8, 2 2))")
    assert r["kind"] == wkt.KIND_POLYGON
    assert len(r["ring_offsets"]) == 3


def test_hole_outside_shell_invalid():
    bad = ("POLYGON((0 0, 10 0, 5 5, 0 0),"
           "(20 20, 21 20, 21 21, 20 21, 20 20))")
    with pytest.raises(wkt.WktParseError):
        P(bad)
    assert P(bad, validation_rule="none")["kind"] == wkt.KIND_POLYGON


# ---- repair (TestPolygonRepair) ------------------------------------------

def _area2(rec):
    total = 0.0
    ro = rec["ring_offsets"]
    for a, b in zip(ro[:-1], ro[1:]):
        ring = list(zip(rec["xs"][a:b], rec["ys"][a:b]))
        total += abs(wkt._signed_area2(ring))
    return total


def test_repair_buffer0():
    rec = P(BOWTIE, validation_rule="repairBuffer0")
    assert rec["kind"] in (wkt.KIND_POLYGON, wkt.KIND_MULTIPOLYGON)
    assert _area2(rec) > 0
    # every lobe is a simple ring now
    ro = rec["ring_offsets"]
    for a, b in zip(ro[:-1], ro[1:]):
        ring = list(zip(rec["xs"][a:b], rec["ys"][a:b]))
        assert wkt._ring_invalid_reason(ring) is None


def test_repair_convex_hull_contains_buffer0():
    hull = P(BOWTIE, validation_rule="repairConvexHull")
    buf0 = P(BOWTIE, validation_rule="repairBuffer0")
    assert hull["kind"] == wkt.KIND_POLYGON
    assert _area2(hull) > 0
    rel = relate_polygon_polygon(
        np.asarray(hull["xs"]), np.asarray(hull["ys"]),
        np.asarray(hull["ring_offsets"]),
        np.asarray(buf0["xs"]), np.asarray(buf0["ys"]),
        np.asarray(buf0["ring_offsets"]))
    assert rel == CONTAINS


def test_repair_leaves_valid_polygons_alone():
    tri = "POLYGON((0 0, 10 0, 5 5, 0 0))"
    for rule in ("error", "repairConvexHull", "repairBuffer0"):
        r = P(tri, validation_rule=rule)
        assert r["kind"] == wkt.KIND_POLYGON
        assert len(r["xs"]) == 4


def test_buffer0_bowtie_lobes_cover_expected_points():
    rec = P(BOWTIE, validation_rule="repairBuffer0")
    from spatial4n_spark.kernels.pip import points_in_polygon
    xs, ys = np.asarray(rec["xs"]), np.asarray(rec["ys"])
    ro = np.asarray(rec["ring_offsets"])
    # interior of the big left lobe and the right lobe
    inside = points_in_polygon(np.array([1.0, 9.0]), np.array([2.0, 5.0]),
                               xs, ys, ro)
    assert inside.all()


# ---- batch/Spark surface -------------------------------------------------

def test_batch_parse_reports_validation_errors():
    recs, errs = wkt.parse_wkt_batch(
        ["POINT (1 2)", BOWTIE, UNCLOSED,
         "POLYGON((0 5, 10 5, 10 20, 0 20, 0 5))"])
    assert recs[0]["kind"] == wkt.KIND_POINT and errs[0] is None
    assert recs[1] is None and "invalid polygon" in errs[1]
    assert recs[2] is None and "unclosed" in errs[2]
    assert recs[3]["kind"] == wkt.KIND_RECT


def test_columns_parse_rules_roundtrip():
    cols = wkt.parse_wkt_columns(
        [BOWTIE], validation_rule="repairConvexHull")
    assert cols["error"][0] is None
    assert cols["kind"][0] == wkt.KIND_POLYGON
    cols2 = wkt.parse_wkt_columns([BOWTIE])
    assert cols2["error"][0] is not None


def test_context_factory_rules():
    ctx = SpatialEngineContext.from_args(
        {"datelineRule": "CcwRect", "validationRule": "RepairBuffer0"})
    assert ctx.dateline_rule == "ccwRect"
    assert ctx.validation_rule == "repairBuffer0"
    rec = ctx.parse_wkt(BOWTIE)
    assert _area2(rec) > 0
    with pytest.raises(ValueError):
        SpatialEngineContext.from_args({"validationRule": "fixItPlease"})


def test_spark_st_from_wkt_configured(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    from spatial4n_spark import functions as SF
    df = spark.createDataFrame(pd.DataFrame({"w": [BOWTIE]}))
    default = df.withColumn("s", SF.st_from_wkt(F.col("w"))).select("s.*")
    row = default.collect()[0]
    assert row["error"] is not None
    repaired = df.withColumn(
        "s", SF.st_from_wkt(F.col("w"), validation_rule="repairBuffer0")
    ).select("s.*").collect()[0]
    assert repaired["error"] is None and len(repaired["xs"]) >= 8


def test_multipolygon_member_validation_and_repair():
    """Validation/repair applies per MULTIPOLYGON member (the reference
    runs MakeShapeFromGeometry per parsed part)."""
    bad_mp = ("MULTIPOLYGON(((0 0, 4 0, 2 3, 0 0)),"
              "((10 0, 20 0, 20 20, 15 -5, 10 20, 10 0)))")
    with pytest.raises(wkt.WktParseError):
        P(bad_mp)
    ok = P(bad_mp, validation_rule="none")
    assert ok["kind"] == wkt.KIND_MULTIPOLYGON
    rep = P(bad_mp, validation_rule="repairBuffer0")
    assert rep["kind"] == wkt.KIND_MULTIPOLYGON
    # first member intact (4 coords) + second planarized into lobes
    assert len(rep["ring_offsets"]) - 1 >= 3
    for a, b in zip(rep["ring_offsets"][:-1], rep["ring_offsets"][1:]):
        ring = list(zip(rep["xs"][a:b], rep["ys"][a:b]))
        assert wkt._ring_invalid_reason(ring) is None
    hull = P(bad_mp, validation_rule="repairConvexHull")
    assert _area2(hull) > 0
