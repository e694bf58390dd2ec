"""Resumable ANN (IVF) index build: the third production flow on the
checkpoint skeleton (after jobs/tile_index.py and jobs/dedup_index.py).

Layout choice IS the index: embeddings are written partitioned by
their IVF centroid assignment (``bucket = centroid_id``), so a probe
of `nprobe` centroids reads exactly `nprobe` partition directories —
storage-level partition pruning does the candidate selection, no scan
of the other k-nprobe partitions ever happens. The per-bucket
transform precomputes the vector L2 norm (the only per-row value the
cosine re-rank needs besides the vector itself).

At 1e12 rows each centroid partition is independently committable and
resumable via the lineage manifests; a restart replays only missing
centroids.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import BUCKET_COL, read_output, run_checkpointed
from ..operators.similarity import ivf_assign


def write_embeddings_by_centroid(df: DataFrame, seeds, path: str,
                                 id_col: str = "vec_id",
                                 emb: str = "embedding") -> None:
    """Write embeddings partitioned by nearest-centroid id (the IVF
    partition transform; Iceberg analog: partitionedBy(centroid_id))."""
    assigned = ivf_assign(df, seeds, id_col, emb)
    (assigned.withColumn(BUCKET_COL, F.col("centroid_id").cast("int"))
             .drop("centroid_id")
             .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path))


def ann_transform(df: DataFrame) -> DataFrame:
    """Per-bucket index payload: vector + precomputed L2 norm."""
    norm = F.expr("sqrt(aggregate(embedding, cast(0 as double), "
                  "(a, v) -> a + cast(v as double) * cast(v as double)))")
    return df.withColumn("norm", norm)


def run_ann_index_job(spark: SparkSession, in_path: str, out_path: str,
                      n_centroids: int, buckets_per_job: int = 8) -> dict:
    return run_checkpointed(spark, in_path, out_path, ann_transform,
                            n_centroids, buckets_per_job)


def probe_index(spark: SparkSession, out_path: str, queries, seeds,
                k: int = 5, nprobe: int = 4) -> DataFrame:
    """ANN search against the built index.

    `queries`: list of (q_id, vector). Probe centroids are picked
    driver-side (k x dim GEMM on the tiny seed matrix); the scan then
    carries ``bucket IN (probed)`` — a PARTITION filter, so only the
    probed directories are read. Exact cosine re-rank within the
    candidates, row_number <= k per query (same ranking contract as
    operators/similarity.ivf_topk).
    """
    from pyspark.sql import Window

    S = np.asarray([v for _, v in seeds], dtype=np.float64)
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    seed_ids = np.asarray([i for i, _ in seeds], dtype=np.int64)

    probe_rows = []
    needed = set()
    for q_id, vec in queries:
        qv = np.asarray(vec, dtype=np.float64)
        qn = qv / np.linalg.norm(qv)
        order = np.argsort(-(Sn @ qn))[:nprobe]
        cids = [int(seed_ids[i]) for i in order]
        needed.update(cids)
        probe_rows.append((q_id, list(vec), cids))

    idx = read_output(spark, out_path).where(
        F.col(BUCKET_COL).isin(sorted(needed)))
    qdf = spark.createDataFrame(
        probe_rows, "q_id long, q_embedding array<double>, probes array<int>")
    j = (idx.join(F.broadcast(qdf),
                  F.expr(f"array_contains(probes, {BUCKET_COL})"), "inner")
            .where(F.col("vec_id") != F.col("q_id")))  # same contract as ivf_topk
    dot = F.expr("aggregate(zip_with(embedding, q_embedding, "
                 "(a, b) -> cast(a as double) * b), cast(0 as double), "
                 "(acc, x) -> acc + x)")
    qnorm = F.expr("sqrt(aggregate(q_embedding, cast(0 as double), "
                   "(a, v) -> a + v * v))")
    j = j.withColumn("cosine", dot / (F.col("norm") * qnorm))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                           F.col("vec_id").asc())
    return (j.withColumn("sim_rank", F.row_number().over(w))
             .where(F.col("sim_rank") <= k)
             .select("q_id", "vec_id", "sim_rank",
                     F.round("cosine", 6).alias("cosine_r")))
