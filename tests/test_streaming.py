"""Structured Streaming tile assignment: incremental exactly-once
processing equals the batch path, and the windowed rollup aggregates
with watermark-bounded state."""
import os

import pytest
from pyspark.sql import functions as F

from spatial4n_spark.sources.docs import generate_docs
from spatial4n_spark.streaming import tile_stream as ts


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    d = {k: str(root / k) for k in ("in", "out", "ckpt", "ckpt2")}
    os.makedirs(d["in"], exist_ok=True)
    return d


def _land(spark, dirs, lo, hi):
    # deterministic docs slice landed as one parquet file batch
    (generate_docs(spark, hi).where(
        F.regexp_extract("doc_id", r"(\d+)$", 1).cast("long") >= lo)
     .coalesce(1).write.mode("append").parquet(dirs["in"]))


def test_streaming_assign_incremental_equals_batch(spark, dirs):
    _land(spark, dirs, 0, 400)
    stream = ts.tile_assign_stream(ts.read_docs_stream(spark, dirs["in"]))
    ts.run_assign_available_now(stream, dirs["out"], dirs["ckpt"])
    n1 = spark.read.parquet(dirs["out"]).count()
    assert n1 > 0

    # second landing: only NEW files processed (exactly-once resume)
    _land(spark, dirs, 400, 700)
    stream = ts.tile_assign_stream(ts.read_docs_stream(spark, dirs["in"]))
    ts.run_assign_available_now(stream, dirs["out"], dirs["ckpt"])
    out = spark.read.parquet(dirs["out"])

    # batch oracle over the full landed input
    batch = ts.tile_assign_stream(spark.read.schema(ts.DOCS_SCHEMA)
                                  .parquet(dirs["in"]))
    want = {(r.doc_id, r.cell_id) for r in batch.collect()}
    got = [(r.doc_id, r.cell_id) for r in out.collect()]
    assert len(got) == len(want)          # no duplicates: exactly-once
    assert set(got) == want               # same assignments as batch
    assert out.count() > n1               # second batch added rows


def test_streaming_windowed_rollup(spark, dirs):
    stream = ts.cell_counts_stream(
        ts.tile_assign_stream(ts.read_docs_stream(spark, dirs["in"])),
        window="10 minutes", watermark="30 minutes")
    ts.run_counts_to_memory(stream, "cell_counts", dirs["ckpt2"])
    got = {(str(r.window_start), r.cell_id): r.n_points
           for r in spark.sql("select * from cell_counts").collect()}
    assert got

    batch = ts.tile_assign_stream(spark.read.schema(ts.DOCS_SCHEMA)
                                  .parquet(dirs["in"]))
    want = {(str(r.ws), r.cell_id): r.n
            for r in (batch.groupBy(
                F.window("event_ts", "10 minutes").alias("w"), "cell_id")
                .agg(F.count("*").alias("n"))
                .select(F.col("w.start").alias("ws"), "cell_id", "n")
                .collect())}
    assert got == want


def test_stateful_streaming_dedup(spark, tmp_path_factory):
    """applyInPandasWithState first-seen dedup: exactly one emission per
    distinct content across micro-batches, state survives restart."""
    import pandas as pd
    from pyspark.sql import functions as F

    from spatial4n_spark.streaming import dedup_stream as dd

    root = tmp_path_factory.mktemp("sdedup")
    in_dir, out_dir, ckpt = str(root / "in"), str(root / "out"), str(root / "ck")
    os.makedirs(in_dir, exist_ok=True)

    def land(rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        (spark.createDataFrame(pdf)
         .select("doc_id", F.array(F.struct(
             F.lit("text").alias("kind"), F.col("text").alias("text"),
             F.lit(None).cast("string").alias("media_ref"),
             F.lit(0).alias("offset"))).alias("spans"))
         .coalesce(1).write.mode("append").parquet(in_dir))

    land([("d1", "alpha"), ("d2", "alpha"), ("d3", "beta")])
    stream = dd.dedup_stream(ts.read_docs_stream(spark, in_dir))
    dd.run_dedup_available_now(stream, out_dir, ckpt)
    got1 = {(r.text_hash, r.doc_id) for r in spark.read.parquet(out_dir).collect()}
    assert len(got1) == 2                       # alpha once, beta once
    assert {d for _, d in got1} == {"d1", "d3"}  # smallest doc_id wins

    # second landing: repeats + one new; restart drains only new state
    land([("d4", "alpha"), ("d5", "gamma"), ("d6", "beta")])
    stream = dd.dedup_stream(ts.read_docs_stream(spark, in_dir))
    dd.run_dedup_available_now(stream, out_dir, ckpt)
    got2 = {(r.text_hash, r.doc_id) for r in spark.read.parquet(out_dir).collect()}
    assert len(got2) == 3                       # only gamma added
    assert {d for _, d in got2} == {"d1", "d3", "d5"}
