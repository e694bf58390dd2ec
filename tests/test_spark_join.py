"""End-to-end distributed spatial join vs local kernel ground truth.

The RectIntersectionTest philosophy (RectIntersectionTestHelper.cs:46-170)
applied to the distributed path: verdicts from the Spark cell-join must
equal verdicts computed by the local kernels on the same pairs.
"""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spatial4n_spark import functions as SF
from spatial4n_spark.kernels import relation as REL
from spatial4n_spark.kernels.relate_rect import relate_rect_point
from spatial4n_spark.operators.joins import (distance_join, knn_join,
                                             point_in_shape_join)
from spatial4n_spark.plans.strategy import JoinPlan, plan_point_shape_join
from spatial4n_spark.sources.docs import extract_geo_spans, generate_docs


@pytest.fixture(scope="module")
def points_df(spark):
    rng = np.random.RandomState(11)
    n = 4000
    pdf = pd.DataFrame({
        "point_id": np.arange(n),
        "x": rng.uniform(-180, 180, n),
        "y": rng.uniform(-90, 90, n),
    })
    return spark.createDataFrame(pdf), pdf


@pytest.fixture(scope="module")
def rects_pdf():
    rng = np.random.RandomState(12)
    m = 40
    cx = rng.uniform(-180, 180, m)
    w = rng.uniform(1, 40, m)
    minx = ((cx - w / 2 + 180) % 360) - 180
    maxx = ((cx + w / 2 + 180) % 360) - 180
    y1 = rng.uniform(-85, 75, m)
    h = rng.uniform(1, 15, m)
    return pd.DataFrame({"rect_id": np.arange(m), "minx": minx, "maxx": maxx,
                         "miny": y1, "maxy": y1 + h})


def test_point_in_rect_join_matches_kernel(spark, points_df, rects_pdf):
    sdf, pdf = points_df
    rects = spark.createDataFrame(rects_pdf).withColumn(
        "shape", F.struct(
            F.lit(2).cast("tinyint").alias("kind"),
            F.lit(None).cast("double").alias("x"),
            F.lit(None).cast("double").alias("y"),
            F.lit(None).cast("double").alias("radius"),
            F.col("minx"), F.col("maxx"), F.col("miny"), F.col("maxy"),
            F.lit(None).cast("array<double>").alias("xs"),
            F.lit(None).cast("array<double>").alias("ys"),
            F.lit(None).cast("array<int>").alias("ring_offsets"),
            F.lit(None).cast("string").alias("error"),
        ))
    plan = JoinPlan(precision=2, broadcast_shapes=True, salt=None, max_cover_cells=4096)
    got = (point_in_shape_join(sdf, rects, plan)
           .select("point_id", "rect_id").toPandas()
           .sort_values(["point_id", "rect_id"]).reset_index(drop=True))

    # local ground truth: full cross product through the kernel
    px = np.repeat(pdf["x"].to_numpy(), len(rects_pdf))
    py = np.repeat(pdf["y"].to_numpy(), len(rects_pdf))
    rx1 = np.tile(rects_pdf["minx"].to_numpy(), len(pdf))
    rx2 = np.tile(rects_pdf["maxx"].to_numpy(), len(pdf))
    ry1 = np.tile(rects_pdf["miny"].to_numpy(), len(pdf))
    ry2 = np.tile(rects_pdf["maxy"].to_numpy(), len(pdf))
    rel = relate_rect_point(rx1, rx2, ry1, ry2, px, py, geo=True)
    hits = rel == REL.CONTAINS
    want = pd.DataFrame({
        "point_id": np.repeat(pdf["point_id"].to_numpy(), len(rects_pdf))[hits],
        "rect_id": np.tile(rects_pdf["rect_id"].to_numpy(), len(pdf))[hits],
    }).sort_values(["point_id", "rect_id"]).reset_index(drop=True)
    assert len(want) > 50, "test data should produce hits"
    pd.testing.assert_frame_equal(got, want)


def test_join_strategies_agree(spark, points_df, rects_pdf):
    """broadcast / shuffle / salted plans return identical pair sets."""
    sdf, _ = points_df
    rects = spark.createDataFrame(rects_pdf).withColumn(
        "shape", F.struct(
            F.lit(2).cast("tinyint").alias("kind"),
            F.lit(None).cast("double").alias("x"),
            F.lit(None).cast("double").alias("y"),
            F.lit(None).cast("double").alias("radius"),
            F.col("minx"), F.col("maxx"), F.col("miny"), F.col("maxy"),
            F.lit(None).cast("array<double>").alias("xs"),
            F.lit(None).cast("array<double>").alias("ys"),
            F.lit(None).cast("array<int>").alias("ring_offsets"),
            F.lit(None).cast("string").alias("error"),
        ))
    plans = [
        JoinPlan(precision=3, broadcast_shapes=True, salt=None, max_cover_cells=4096),
        JoinPlan(precision=3, broadcast_shapes=False, salt=None, max_cover_cells=4096),
        JoinPlan(precision=3, broadcast_shapes=False, salt=8, max_cover_cells=4096),
    ]
    results = [sorted(map(tuple, point_in_shape_join(sdf, rects, p)
                          .select("point_id", "rect_id").collect()))
               for p in plans]
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 50


def test_docs_pipeline_pip_join(spark):
    """Flagship slice: docs -> explode spans -> st_from_wkt -> PIP join."""
    docs = generate_docs(spark, 2000, 8)
    geo = extract_geo_spans(docs)
    n_geo = geo.count()
    assert n_geo == 2000  # every doc has exactly one WKT span
    pts = (geo.where(F.col("shape.kind") == 1)
              .select("doc_id", F.col("shape.x").alias("x"), F.col("shape.y").alias("y")))
    rects = spark.createDataFrame(pd.DataFrame({
        "rect_id": [0, 1, 2],
        "minx": [-180.0, 100.0, 170.0], "maxx": [0.0, 140.0, -170.0],
        "miny": [-90.0, -30.0, -20.0], "maxy": [90.0, 30.0, 20.0],
    })).withColumn("shape", F.struct(
        F.lit(2).cast("tinyint").alias("kind"),
        F.lit(None).cast("double").alias("x"),
        F.lit(None).cast("double").alias("y"),
        F.lit(None).cast("double").alias("radius"),
        F.col("minx"), F.col("maxx"), F.col("miny"), F.col("maxy"),
        F.lit(None).cast("array<double>").alias("xs"),
        F.lit(None).cast("array<double>").alias("ys"),
        F.lit(None).cast("array<int>").alias("ring_offsets"),
        F.lit(None).cast("string").alias("error")))
    plan = plan_point_shape_join(2000, 3, 40.0, 40.0)
    out = point_in_shape_join(pts, rects, plan).select("doc_id", "rect_id")
    counts = dict((r["rect_id"], r["cnt"]) for r in
                  out.groupBy("rect_id").agg(F.count("*").alias("cnt")).collect())
    # rect 0 is the western hemisphere: roughly half the docs
    assert counts.get(0, 0) > 600
    assert counts.get(1, 0) > 0


def test_distance_and_knn_join(spark, points_df):
    sdf, pdf = points_df
    queries = pd.DataFrame({"query_id": [0, 1, 2],
                            "qx": [0.0, 100.0, -170.0],
                            "qy": [0.0, 45.0, -60.0]})
    qdf = spark.createDataFrame(queries)
    plan = JoinPlan(precision=2, broadcast_shapes=True, salt=None, max_cover_cells=4096)
    R = 25.0
    got = (distance_join(sdf, qdf, R, plan).select("query_id", "point_id", "dist_deg")
           .toPandas())
    # ground truth
    from spatial4n_spark.kernels.distance import geo_distance_deg
    for _, q in queries.iterrows():
        d = geo_distance_deg(pdf["x"].to_numpy(), pdf["y"].to_numpy(),
                             q["qx"], q["qy"], "haversine")
        want_ids = set(pdf["point_id"].to_numpy()[d <= R].tolist())
        got_ids = set(got[got["query_id"] == q["query_id"]]["point_id"].tolist())
        assert got_ids == want_ids, q["query_id"]

    k = 7
    knn = knn_join(sdf, qdf, k, 40.0, plan, query_id="query_id",
                   tie_break="point_id").toPandas()
    from spatial4n_spark.kernels.distance import geo_distance_deg as gd
    for _, q in queries.iterrows():
        d = gd(pdf["x"].to_numpy(), pdf["y"].to_numpy(), q["qx"], q["qy"],
               "vincentySphere")
        order = np.lexsort((pdf["point_id"].to_numpy(), d))
        want_top = set(pdf["point_id"].to_numpy()[order[:k]].tolist())
        got_top = set(knn[knn["query_id"] == q["query_id"]]["point_id"].tolist())
        assert got_top == want_top


def test_knn_ladder_equals_single_pass(spark):
    """The multi-rung escalation ladder must return EXACTLY the
    single-pass bounded-radius answer (rung-resolved queries are
    provably identical; stragglers fall through)."""
    import numpy as np

    from spatial4n_spark.operators.joins import knn_join
    from spatial4n_spark.plans.strategy import JoinPlan
    rng = np.random.default_rng(23)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
            zip(rng.uniform(-170, 170, 4000), rng.uniform(-80, 80, 4000)))],
        ["point_id", "x", "y"])
    qs = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
            zip(rng.uniform(-170, 170, 30), rng.uniform(-80, 80, 30)))],
        ["query_id", "qx", "qy"])
    plan = JoinPlan(precision=2, broadcast_shapes=True, salt=None,
                    max_cover_cells=4096)
    kw = dict(k=3, radius_deg=60.0, plan=plan, query_id="query_id",
              tie_break="point_id")
    direct = {(r.query_id, r.point_id, r.knn_rank) for r in
              knn_join(pts, qs, **kw).collect()}
    ladder = {(r.query_id, r.point_id, r.knn_rank) for r in
              knn_join(pts, qs, prefilter_radius=(4.0, 15.0), **kw).collect()}
    single_rung = {(r.query_id, r.point_id, r.knn_rank) for r in
                   knn_join(pts, qs, prefilter_radius=8.0, **kw).collect()}
    assert ladder == direct
    assert single_rung == direct
