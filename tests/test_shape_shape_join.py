"""Distributed polygon x polygon join vs brute-force kernel oracle,
plus the no-dedup-shuffle plan property."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from spatial4n_spark import functions as SF
from spatial4n_spark.kernels.pip import relate_polygon_polygon
from spatial4n_spark.kernels.relation import CONTAINS, DISJOINT, WITHIN
from spatial4n_spark.operators.joins import shape_shape_join


def _tri_wkt(cx, cy, s):
    p = [(cx, cy), (cx + 2.0 * s, cy + 0.3 * s), (cx + 0.9 * s, cy + 1.7 * s)]
    pts = ", ".join(f"{x} {y}" for x, y in p + [p[0]])
    return f"POLYGON(({pts}))"


@pytest.fixture(scope="module")
def layers(spark):
    rng = np.random.default_rng(17)
    lrows = [(i, _tri_wkt(rng.uniform(-60, 40), rng.uniform(-40, 30),
                          rng.uniform(4, 14))) for i in range(40)]
    rrows = [(j, _tri_wkt(rng.uniform(-60, 40), rng.uniform(-40, 30),
                          rng.uniform(1, 8))) for j in range(60)]
    left = (spark.createDataFrame(lrows, ["lid", "lwkt"])
            .withColumn("lshape", SF.st_from_wkt(F.col("lwkt"))))
    right = (spark.createDataFrame(rrows, ["rid", "rwkt"])
             .withColumn("rshape", SF.st_from_wkt(F.col("rwkt"))))
    return left, right, lrows, rrows


def _local_pairs(lrows, rrows, keep):
    from spatial4n_spark.kernels.wkt import parse_wkt_batch
    lrecs, _ = parse_wkt_batch([w for _, w in lrows])
    rrecs, _ = parse_wkt_batch([w for _, w in rrows])
    out = set()
    for (lid, _), lr in zip(lrows, lrecs):
        for (rid, _), rr in zip(rrows, rrecs):
            rel = relate_polygon_polygon(
                np.asarray(lr["xs"]), np.asarray(lr["ys"]), lr["ring_offsets"],
                np.asarray(rr["xs"]), np.asarray(rr["ys"]), rr["ring_offsets"])
            if keep(rel):
                out.add((lid, rid))
    return out


@pytest.mark.parametrize("predicate,keep", [
    ("intersects", lambda r: r != DISJOINT),
    ("contains", lambda r: r == CONTAINS),
    ("within", lambda r: r == WITHIN),
])
def test_join_matches_bruteforce(spark, layers, predicate, keep):
    left, right, lrows, rrows = layers
    got = {(r.lid, r.rid) for r in
           shape_shape_join(left, right, precision=2, predicate=predicate)
           .select("lid", "rid").collect()}
    want = _local_pairs(lrows, rrows, keep)
    assert got == want, (len(got), len(want),
                         sorted(got - want)[:5], sorted(want - got)[:5])


def test_reference_point_dedup_no_distinct(spark, layers):
    left, right, _, _ = layers
    out = shape_shape_join(left, right, precision=2, predicate="all")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # dedup is the reference-point predicate: no aggregate/distinct and
    # no shuffle exchange anywhere in the joined plan
    assert "HashAggregate" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    # and each surviving pair is unique without any dedup operator
    rows = out.select("lid", "rid").collect()
    assert len(rows) == len({(r.lid, r.rid) for r in rows})


def test_salted_shuffle_path_set_equal_to_broadcast(spark, layers):
    left, right, _, _ = layers
    base = {(r.lid, r.rid, r.relation) for r in
            shape_shape_join(left, right, precision=2, predicate="all")
            .collect()}
    salted = {(r.lid, r.rid, r.relation) for r in
              shape_shape_join(left, right, precision=2, predicate="all",
                               broadcast_right=False, salt=4).collect()}
    plain_shuffle = {(r.lid, r.rid, r.relation) for r in
                     shape_shape_join(left, right, precision=2,
                                      predicate="all",
                                      broadcast_right=False).collect()}
    assert salted == base
    assert plain_shuffle == base


def test_no_codegen_compile_fallback(spark, layers):
    """VERDICT r02 item 2: the two-layer join must stay in compiled
    whole-stage codegen — no Janino 64 KB interpreted fallback.

    The filter-context reference-cell expression used to blow the method
    limit (spread-bits duplication of a greatest-of-struct-fields tree);
    the ERROR is only observable via the JVM's log4j console appender,
    so capture the process stderr at the fd level during execution.
    """
    import os
    import tempfile

    left, right, _, _ = layers
    out = shape_shape_join(left, right, precision=2, predicate="all")
    saved = os.dup(2)
    with tempfile.NamedTemporaryFile("w+", delete=False) as tf:
        path = tf.name
    fd = os.open(path, os.O_WRONLY | os.O_TRUNC)
    os.dup2(fd, 2)
    try:
        out.count()
    finally:
        os.dup2(saved, 2)
        os.close(fd)
        os.close(saved)
    with open(path) as fh:
        log = fh.read()
    os.unlink(path)
    assert "Failed to compile the generated Java code" not in log, log[:4000]
    assert "grows beyond 64 KB" not in log, log[:4000]


def test_closure_right_path_set_equal_to_struct(spark, layers):
    """right_id closure path (right vertices in the UDF closure, only
    left arrays cross Arrow) == the struct path, for every predicate
    incl. relation codes."""
    left, right, _, _ = layers
    for predicate in ("intersects", "contains", "within", "all"):
        a = shape_shape_join(left, right, precision=2, predicate=predicate)
        b = shape_shape_join(left, right, precision=2, predicate=predicate,
                             right_id="rid")
        cols = ["lid", "rid"] + (["relation"] if predicate == "all" else [])
        sa = {tuple(r) for r in a.select(*cols).collect()}
        sb = {tuple(r) for r in b.select(*cols).collect()}
        assert sa == sb, predicate


def test_closure_right_falls_back_above_vertex_cap(spark, layers, monkeypatch):
    from spatial4n_spark.operators import refine
    left, right, _, _ = layers
    monkeypatch.setattr(refine, "MAX_CLOSURE_VERTICES", 5)
    a = shape_shape_join(left, right, precision=2, predicate="intersects")
    b = shape_shape_join(left, right, precision=2, predicate="intersects",
                         right_id="rid")
    assert ({(r.lid, r.rid) for r in a.select("lid", "rid").collect()}
            == {(r.lid, r.rid) for r in b.select("lid", "rid").collect()})
