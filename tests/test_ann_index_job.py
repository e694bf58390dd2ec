"""Resumable ANN index job: build -> probe == in-memory ivf_topk,
partition pruning reaches the scan, resume skips completed centroids."""
import pytest
from pyspark.sql import functions as F

from spatial4n_spark import checkpoint as cp
from spatial4n_spark.jobs import ann_index as ai
from spatial4n_spark.operators.similarity import ivf_seeds, ivf_topk

K_CENTROIDS = 16
SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    seeds = ivf_seeds(emb, k=K_CENTROIDS)
    in_path = str(tmp_path_factory.mktemp("ann") / "in")
    out_path = str(tmp_path_factory.mktemp("ann") / "out")
    ai.write_embeddings_by_centroid(emb, seeds, in_path)
    summary = ai.run_ann_index_job(spark, in_path, out_path, K_CENTROIDS)
    return emb, seeds, in_path, out_path, summary


def test_build_covers_every_row_and_centroid(spark, built):
    emb, seeds, _, out_path, summary = built
    assert summary["buckets_run"] == K_CENTROIDS
    got = cp.read_output(spark, out_path)
    assert got.count() == emb.count()
    # norms precomputed and positive
    assert got.where(F.col("norm") <= 0).count() == 0


def test_probe_matches_in_memory_ivf(spark, built):
    emb, seeds, _, out_path, _ = built
    qrows = [(int(r["vec_id"]), list(r["embedding"])) for r in
             emb.where("vec_id % 100 = 7").limit(5).collect()]
    queries = spark.createDataFrame(
        qrows, "q_id long, q_embedding array<double>")
    want = {(r.q_id, r.vec_id, r.sim_rank) for r in
            ivf_topk(emb, queries, k=5, seeds=seeds, nprobe=4).collect()}
    got = {(r.q_id, r.vec_id, r.sim_rank) for r in
           ai.probe_index(spark, out_path, qrows, seeds, k=5,
                          nprobe=4).collect()}
    assert got == want


def test_probe_scan_is_partition_pruned(spark, built):
    emb, seeds, _, out_path, _ = built
    qrows = [(int(r["vec_id"]), list(r["embedding"])) for r in
             emb.limit(1).collect()]
    df = ai.probe_index(spark, out_path, qrows, seeds, k=3, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the bucket IN (...) predicate must be a partition filter, not a
    # post-scan data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf, plan[:2000]


def test_rebuild_skips_all_centroids(spark, built):
    _, _, in_path, out_path, _ = built
    again = ai.run_ann_index_job(spark, in_path, out_path, K_CENTROIDS)
    assert again["buckets_run"] == 0
    assert again["buckets_skipped"] == K_CENTROIDS
