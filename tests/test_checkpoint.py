"""Checkpoint/resume: per-bucket manifests, lineage, exact resume.

North-rule: restart skips completed partitions; manifests carry
lineage (input path, transform, kernel version) + row counts; the
resumed output equals a straight-through run exactly.
"""
import json
import os

import pytest
from pyspark.sql import functions as F

from spatial4n_spark import checkpoint as cp

N_DOCS = 3000
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_input(spark, tmp_path_factory):
    from spatial4n_spark.sources.docs import generate_docs
    path = str(tmp_path_factory.mktemp("ckpt") / "docs")
    cp.write_docs_bucketed(generate_docs(spark, N_DOCS), path, N_BUCKETS)
    return path


def simple_transform(df):
    """Keeps `bucket`; filters and derives — a stand-in engine job."""
    return (df.withColumn("n_spans", F.size("spans"))
              .where(F.size("spans") > 0)
              .select("doc_id", "n_spans", "bucket"))


def test_full_run_writes_all_manifests(spark, bucketed_input, tmp_path):
    out = str(tmp_path / "out")
    summary = cp.run_checkpointed(spark, bucketed_input, out,
                                  simple_transform, N_BUCKETS,
                                  buckets_per_job=3)
    assert summary["buckets_run"] == N_BUCKETS
    assert summary["buckets_skipped"] == 0
    assert summary["input_rows"] == N_DOCS
    assert summary["output_rows"] == N_DOCS  # every doc has 3 spans

    manifests = cp.load_manifests(out)
    assert sorted(manifests) == list(range(N_BUCKETS))
    for m in manifests.values():
        assert m.input_path == bucketed_input          # lineage
        assert m.transform == "simple_transform"       # lineage
        assert m.kernel_version == cp.kernel_version()
        assert m.input_rows > 0 and m.output_rows > 0  # metrics
        assert m.wall_s >= 0

    # output equals a straight-through (non-checkpointed) run
    got = cp.read_output(spark, out).orderBy("doc_id").collect()
    src = spark.read.parquet(bucketed_input)
    want = simple_transform(src).orderBy("doc_id").collect()
    assert [(r.doc_id, r.n_spans) for r in got] == \
           [(r.doc_id, r.n_spans) for r in want]
    assert len(got) == N_DOCS


def test_resume_skips_completed_buckets(spark, bucketed_input, tmp_path):
    out = str(tmp_path / "out")

    boom = {"armed": True}

    def flaky_transform(df):
        if boom["armed"]:
            # arm a failure for the SECOND job group: the closure checks
            # at plan time, so fail after >=1 group committed
            if len(cp.load_manifests(out)) >= 3:
                raise RuntimeError("simulated mid-job crash")
        return simple_transform(df)
    flaky_transform.__name__ = "simple_transform"

    with pytest.raises(RuntimeError):
        cp.run_checkpointed(spark, bucketed_input, out, flaky_transform,
                            N_BUCKETS, buckets_per_job=3)

    done_before = set(cp.load_manifests(out))
    assert 0 < len(done_before) < N_BUCKETS  # partial progress committed

    boom["armed"] = False
    summary = cp.run_checkpointed(spark, bucketed_input, out,
                                  flaky_transform, N_BUCKETS,
                                  buckets_per_job=3)
    assert summary["buckets_skipped"] == len(done_before)
    assert summary["buckets_run"] == N_BUCKETS - len(done_before)

    # resumed output identical to straight-through
    got = cp.read_output(spark, out)
    assert got.count() == N_DOCS
    assert got.select("doc_id").distinct().count() == N_DOCS

    # idempotent third call: nothing to do
    summary2 = cp.run_checkpointed(spark, bucketed_input, out,
                                   flaky_transform, N_BUCKETS)
    assert summary2["buckets_run"] == 0
    assert summary2["buckets_skipped"] == N_BUCKETS


def test_kernel_version_invalidates_manifests(spark, bucketed_input, tmp_path):
    out = str(tmp_path / "out")
    cp.run_checkpointed(spark, bucketed_input, out, simple_transform,
                        N_BUCKETS)
    # tamper with one manifest: pretend an older kernel wrote bucket 2
    mf = os.path.join(out, "_manifests", "bucket=2.json")
    with open(mf) as fh:
        m = json.load(fh)
    m["kernel_version"] = "deadbeef00000000"
    with open(mf, "w") as fh:
        json.dump(m, fh)
    assert cp.pending_buckets(out, bucketed_input, N_BUCKETS) == [2]

    summary = cp.run_checkpointed(spark, bucketed_input, out,
                                  simple_transform, N_BUCKETS)
    assert summary["buckets_run"] == 1
    assert cp.pending_buckets(out, bucketed_input, N_BUCKETS) == []


def test_different_input_lineage_not_skipped(spark, bucketed_input, tmp_path):
    out = str(tmp_path / "out")
    cp.run_checkpointed(spark, bucketed_input, out, simple_transform,
                        N_BUCKETS)
    # same output dir, different claimed input => all buckets pending
    assert len(cp.pending_buckets(out, "/other/input", N_BUCKETS)) == N_BUCKETS


def test_rerun_with_empty_bucket_replaces_stale_output(spark, bucketed_input,
                                                       tmp_path):
    """A re-run bucket that now produces 0 rows must not leave the old
    run's bucket=K data behind (exact-resume contract: read_output
    rows == sum of manifest output_rows)."""
    out = str(tmp_path / "out")
    cp.run_checkpointed(spark, bucketed_input, out, simple_transform,
                        N_BUCKETS)
    n_before = cp.read_output(spark, out).where(F.col("bucket") == 1).count()
    assert n_before > 0

    def empty_bucket1_transform(df):
        return simple_transform(df).where(F.col("bucket") != 1)

    # new transform name invalidates every manifest; bucket 1 now empty
    summary = cp.run_checkpointed(spark, bucketed_input, out,
                                  empty_bucket1_transform, N_BUCKETS)
    assert summary["buckets_run"] == N_BUCKETS
    assert cp.read_output(spark, out).where(F.col("bucket") == 1).count() == 0
    ms = cp.load_manifests(out)
    assert ms[1].output_rows == 0
    total = sum(m.output_rows for m in ms.values())
    assert cp.read_output(spark, out).count() == total


def test_transform_and_bucket_count_in_validity(spark, bucketed_input,
                                                tmp_path):
    out = str(tmp_path / "out")
    cp.run_checkpointed(spark, bucketed_input, out, simple_transform,
                        N_BUCKETS)
    # different transform name -> all pending
    assert len(cp.pending_buckets(out, bucketed_input, N_BUCKETS,
                                  transform_name="other_fn")) == N_BUCKETS
    # different bucket count -> all pending
    assert len(cp.pending_buckets(out, bucketed_input, N_BUCKETS + 1)) \
        == N_BUCKETS + 1
    # matching identity -> none pending
    assert cp.pending_buckets(out, bucketed_input, N_BUCKETS,
                              transform_name="simple_transform") == []


def test_legacy_manifest_without_bucket_count_still_valid(
        spark, bucketed_input, tmp_path):
    """ADVICE r02: manifests written before the n_buckets field existed
    deserialize with n_buckets=0 and must be accepted as a legacy
    wildcard, not mass-invalidated on upgrade."""
    out = str(tmp_path / "out")
    cp.run_checkpointed(spark, bucketed_input, out, simple_transform,
                        N_BUCKETS)
    # strip the field from every manifest, simulating pre-upgrade files
    mdir = os.path.join(out, "_manifests")
    for f in os.listdir(mdir):
        p = os.path.join(mdir, f)
        with open(p) as fh:
            d = json.load(fh)
        d.pop("n_buckets")
        with open(p, "w") as fh:
            json.dump(d, fh)
    assert cp.pending_buckets(out, bucketed_input, N_BUCKETS,
                              transform_name="simple_transform") == []
    # but a DIFFERENT bucket count still needs its extra buckets
    assert cp.pending_buckets(out, bucketed_input, N_BUCKETS + 2,
                              transform_name="simple_transform") \
        == [N_BUCKETS, N_BUCKETS + 1]


def test_remote_uri_out_path_rejected(spark, bucketed_input, tmp_path):
    """ADVICE r02: the local-FS manifest/pre-delete layer must refuse
    hdfs:///s3a:// paths instead of silently resurrecting the
    stale-partition bug."""
    with pytest.raises(ValueError, match="non-local URI"):
        cp.run_checkpointed(spark, bucketed_input,
                            "s3a://bucket/out", simple_transform, N_BUCKETS)
    with pytest.raises(ValueError, match="non-local URI"):
        cp.run_checkpointed(spark, "hdfs://nn/docs", str(tmp_path / "o2"),
                            simple_transform, N_BUCKETS)
