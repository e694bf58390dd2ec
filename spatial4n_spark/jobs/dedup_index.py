"""Resumable exact-dedup job: the second production flow on the
checkpoint skeleton (jobs/tile_index.py is the first).

Key design point: the input is bucketed by the CONTENT HASH (not
doc_id), so every copy of a given text lands in the same bucket and
per-bucket dedup IS globally exact — the checkpointed per-bucket loop
needs no cross-bucket reconciliation, which is precisely what makes it
resumable at 10^12 docs (each bucket commits independently with its
lineage manifest; a restart replays only missing buckets).

Output per bucket: (text_hash, canonical_id = min doc_id, dup_count).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import BUCKET_COL, read_output, run_checkpointed


def write_docs_by_content_hash(df: DataFrame, path: str, n_buckets: int,
                               text_expr: str = "spans[0].text") -> None:
    """Write docs partitioned by bucket(md5(text)) — the dedup layout."""
    hashed = df.withColumn("text_hash", F.md5(F.expr(text_expr)))
    bucketed = hashed.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col("text_hash")),
                           F.lit(n_buckets)).cast("int"))
    bucketed.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)


def dedup_transform(docs: DataFrame) -> DataFrame:
    """Per-bucket exact dedup (globally exact given content-hash
    bucketing). Keeps the bucket column for the checkpoint writer."""
    return (docs.groupBy("text_hash", BUCKET_COL)
                .agg(F.min("doc_id").alias("canonical_id"),
                     F.count("*").alias("dup_count")))


def run_dedup_job(spark: SparkSession, in_path: str, out_path: str,
                  n_buckets: int, buckets_per_job: int = 8) -> dict:
    return run_checkpointed(spark, in_path, out_path, dedup_transform,
                            n_buckets, buckets_per_job)


def read_dedup_index(spark: SparkSession, out_path: str) -> DataFrame:
    return read_output(spark, out_path)
