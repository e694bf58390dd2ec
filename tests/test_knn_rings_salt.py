"""Ring-expansion kNN internals + the salted shuffle-join path."""
import dataclasses

import pytest
from pyspark.sql import functions as F

from spatial4n_spark import contract
from spatial4n_spark.operators.joins import point_in_shape_join
from spatial4n_spark.operators.knn_rings import (d_safe_value, knn_ring_join,
                                                 _window_cells)
from spatial4n_spark.plans.strategy import plan_point_shape_join

SF_DIR = "/root/testdata/sf0.001"


def test_window_cells_counts_and_wrap(spark):
    # query near the dateline: window must wrap lon without duplicates
    q = spark.createDataFrame([(1, 179.9, 10.0), (2, 0.0, 89.9)],
                              "query_id int, qx double, qy double")
    cells = _window_cells(q, "qx", "qy", precision=2, r=1)
    counts = {r.query_id: r.n for r in
              cells.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert counts[1] == 9          # full 3x3 window, wrapped at dateline
    assert counts[2] == 6          # top row clamped at the pole -> 3x2
    # all codes distinct per query
    assert cells.count() == cells.dropDuplicates(["query_id", "cell_id"]).count()


def test_d_safe_bound_behavior():
    # equatorial: bound grows with the window
    prev = 0.0
    for r in (1, 2, 4, 8):
        d = d_safe_value(0.0, r, precision=2)
        assert d >= prev
        prev = d
    # polar regime: once the window can touch the pole, the longitude
    # term legitimately collapses toward 0 (all meridians converge) —
    # termination then comes from the full-lon / full-grid rules
    assert d_safe_value(85.0, 2, 2) < d_safe_value(0.0, 2, 2)
    assert d_safe_value(85.0, 2, 2) >= 0.0
    # full-lon wrap switches to the latitude-only bound
    lon_n = 32  # precision 2 -> 5 lon bits
    r_full = (lon_n - 1) // 2 + 1
    from spatial4n_spark.kernels.geohash import HASH_LEN_TO_LAT_HEIGHT
    assert d_safe_value(85.0, r_full, 2) == r_full * HASH_LEN_TO_LAT_HEIGHT[2]


def test_knn_rings_matches_brute_force(spark):
    pts = contract.customer_points(spark, SF_DIR) \
        .withColumnRenamed("c_custkey", "point_id")
    qs = contract.supplier_circles(spark, SF_DIR).selectExpr(
        "circle_id AS query_id", "cx AS qx", "cy AS qy")
    got = knn_ring_join(pts, qs, k=3, precision=2,
                        query_id="query_id", tie_break="point_id")
    got_set = {(r.query_id, r.point_id, r.knn_rank) for r in got.collect()}

    from spatial4n_spark import functions as SFN
    from pyspark.sql import Window
    brute = pts.crossJoin(qs).withColumn(
        "d", SFN.st_distance_deg(F.col("x"), F.col("y"), F.col("qx"),
                                 F.col("qy"), "vincentySphere"))
    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(),
                                               F.col("point_id").asc())
    want = {(r.query_id, r.point_id, r.rk) for r in
            brute.withColumn("rk", F.row_number().over(w))
                 .where("rk <= 3").collect()}
    assert got_set == want
    assert len(got_set) > 0


def test_salted_join_path_equals_broadcast(spark):
    """Force the salted shuffle join and compare with broadcast."""
    pts = contract.customer_points(spark, SF_DIR)
    rects = contract.nation_rects(spark, SF_DIR)
    base = plan_point_shape_join(1500, 25, 34.0, 18.0, shape_kinds=(2,))
    plan_b = dataclasses.replace(base, broadcast_shapes=True, salt=None)
    plan_s = dataclasses.replace(base, broadcast_shapes=False, salt=8)

    b = {(r.c_custkey, r.rect_id) for r in
         point_in_shape_join(pts, rects, plan_b)
         .select("c_custkey", "rect_id").collect()}
    s = {(r.c_custkey, r.rect_id) for r in
         point_in_shape_join(pts, rects, plan_s)
         .select("c_custkey", "rect_id").collect()}
    assert b == s and len(b) > 0


def test_hot_cell_ratio_drives_salting(spark):
    from spatial4n_spark.plans.strategy import (estimate_hot_cell_ratio,
                                                plan_point_shape_join)
    # uniform points: no single hot cell
    uni = spark.range(20000).selectExpr(
        "((id * 7919) % 71989) / 200.0 - 179.97 AS x",
        "((id * 104729) % 35993) / 200.0 - 89.97 AS y")
    r_uni = estimate_hot_cell_ratio(uni, precision=3, sample_fraction=0.5)
    assert r_uni < 0.05

    # 60% of points piled on one spot: hot cell dominates
    skew = spark.range(20000).selectExpr(
        "CASE WHEN id % 10 < 6 THEN 10.001 ELSE ((id * 7919) % 71989) / 200.0 - 179.97 END AS x",
        "CASE WHEN id % 10 < 6 THEN 45.001 ELSE ((id * 104729) % 35993) / 200.0 - 89.97 END AS y")
    r_skew = estimate_hot_cell_ratio(skew, precision=3, sample_fraction=0.5)
    assert r_skew > 0.5

    # the planner salts only for the skewed, non-broadcast case
    p = plan_point_shape_join(10**9, 10**6, 1.0, 1.0,
                              hot_cell_ratio=r_skew)
    assert not p.broadcast_shapes and p.salt
    p2 = plan_point_shape_join(10**9, 10**6, 1.0, 1.0,
                               hot_cell_ratio=r_uni)
    assert p2.salt is None


def test_knn_rings_parquet_stage_equals_in_memory(spark, tmp_path):
    """stage_dir: parquet-staged ring rounds == localCheckpoint rounds."""
    import os

    from spatial4n_spark.operators.knn_rings import knn_ring_join

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
    pts = (spark.read.parquet(os.path.join(sf, "customer.parquet"))
           .selectExpr("c_custkey AS pid",
                       "(((c_custkey * 9973) % 72000) / 200.0 - 180.0) AS x",
                       "(((c_custkey * 9967) % 36000) / 200.0 - 90.0) AS y"))
    qs = (spark.read.parquet(os.path.join(sf, "nation.parquet"))
          .selectExpr("n_nationkey AS query_id",
                      "(((n_nationkey * 131) % 360) - 180.0) AS qx",
                      "(((n_nationkey * 67) % 180) - 90.0) AS qy"))
    a = knn_ring_join(pts, qs, k=3, tie_break="pid")
    b = knn_ring_join(pts, qs, k=3, tie_break="pid",
                      stage_dir=str(tmp_path / "knn_stage"))
    ka = {(r["query_id"], r["knn_rank"], r["pid"]) for r in a.collect()}
    kb = {(r["query_id"], r["knn_rank"], r["pid"]) for r in b.collect()}
    assert ka == kb and len(ka) > 0
