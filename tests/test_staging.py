"""Session-default parquet staging (round 5): with
spark.spatial4n.stageDir set, every iterative/materialized stage
routes through parquet — results must be identical to the in-memory
localCheckpoint path, and stage files must actually appear."""
import os

import pytest

from spatial4n_spark.staging import STAGE_CONF, resolve_stage_dir, stage


@pytest.fixture
def stage_conf(spark, tmp_path):
    d = str(tmp_path / "stage")
    spark.conf.set(STAGE_CONF, d)
    yield d
    spark.conf.unset(STAGE_CONF)


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_resolve_precedence(spark, stage_conf):
    assert resolve_stage_dir(spark, None) == stage_conf
    assert resolve_stage_dir(spark, "/explicit") == "/explicit"
    spark.conf.unset(STAGE_CONF)
    assert resolve_stage_dir(spark, None) is None
    spark.conf.set(STAGE_CONF, stage_conf)


def test_stage_roundtrip_writes_parquet(spark, stage_conf):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    out = stage(df, "unit")
    assert _rowset(out) == _rowset(df)
    stages = [p for p in os.listdir(stage_conf) if p.startswith("unit-")]
    assert len(stages) == 1


def _docs(spark):
    rows = [(i, ("alpha beta gamma delta epsilon zeta eta theta "
                 * 3 + f"tail{i % 7}")) for i in range(80)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_pairs_identical_both_paths(spark, stage_conf, tmp_path):
    from spatial4n_spark.operators.dedup import minhash_lsh_pairs
    docs = _docs(spark)
    with_stage = _rowset(minhash_lsh_pairs(docs))
    spark.conf.unset(STAGE_CONF)
    try:
        in_memory = _rowset(minhash_lsh_pairs(docs))
    finally:
        spark.conf.set(STAGE_CONF, str(tmp_path / "stage"))
    assert with_stage == in_memory and len(with_stage) > 0
    assert any(p.startswith("lsh_bands-")
               for p in os.listdir(stage_conf))


def test_simhash_pairs_identical_both_paths(spark, stage_conf, tmp_path):
    from spatial4n_spark.operators.dedup import simhash_neardup_pairs
    docs = _docs(spark)
    with_stage = _rowset(simhash_neardup_pairs(docs, bits=16, bands=4,
                                               max_hamming=3))
    spark.conf.unset(STAGE_CONF)
    try:
        in_memory = _rowset(simhash_neardup_pairs(docs, bits=16, bands=4,
                                                  max_hamming=3))
    finally:
        spark.conf.set(STAGE_CONF, str(tmp_path / "stage"))
    assert with_stage == in_memory and len(with_stage) > 0


def test_knn_rungs_identical_both_paths(spark, stage_conf, tmp_path):
    from spatial4n_spark.operators.joins import knn_join
    from spatial4n_spark.plans.strategy import plan_point_shape_join
    pts = spark.createDataFrame(
        [(i, (i * 7) % 40 - 20.0, (i * 13) % 30 - 15.0) for i in range(200)],
        "pid long, x double, y double")
    qs = spark.createDataFrame(
        [(q, q * 3.0 - 10.0, q * 2.0 - 5.0) for q in range(8)],
        "query_id long, qx double, qy double")
    plan = plan_point_shape_join(200, 8, 34.0, 18.0)

    def run():
        return _rowset(knn_join(pts, qs, k=3, radius_deg=25.0, plan=plan,
                                query_x="qx", query_y="qy",
                                prefilter_radius=[2.0, 8.0]))
    with_stage = run()
    spark.conf.unset(STAGE_CONF)
    try:
        in_memory = run()
    finally:
        spark.conf.set(STAGE_CONF, str(tmp_path / "stage"))
    assert with_stage == in_memory and len(with_stage) > 0
    assert any(p.startswith("knn_rung-")
               for p in os.listdir(stage_conf))


def test_components_session_default(spark, stage_conf):
    from spatial4n_spark.operators.components import connected_components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long")
    out = _rowset(connected_components(edges))
    assert (1, 1) in out and (3, 1) in out and (11, 10) in out
    # session conf routed the rounds through parquet
    assert any(p.startswith("cc_") or "labels" in p
               for p in os.listdir(stage_conf))
