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
