"""End-to-end corpus-clean job: filters, global exact dedup via
content-hash buckets, near-dup cluster removal, and bucket-granular
resume."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_corpus_clean_end_to_end(spark, docs, tmp_path_factory):
    from spatial4n_spark.jobs.corpus_clean import run_corpus_clean

    wd = str(tmp_path_factory.mktemp("cc") / "run")
    summary = run_corpus_clean(spark, docs, wd, n_buckets=4,
                               rules={"min_words": 3},
                               text_expr="text")
    clean = spark.read.parquet(summary["clean_path"] + "/data")
    n = clean.count()
    assert n > 0
    # no exact dupes survive
    assert clean.groupBy("text").count().where("count > 1").count() == 0
    # every near-dup cluster kept exactly its canonical doc: re-running
    # the cluster step over the CLEAN corpus finds no non-canonical doc
    from spatial4n_spark.operators.dedup import dedup_clusters
    again = dedup_clusters(clean.select("doc_id", "text"))
    assert again.where(F.col("cluster_id") != F.col("doc_id")).count() == 0
    # filters actually applied
    assert clean.where(F.col("q_words") < 3).count() == 0


def test_corpus_clean_resume_skips_buckets(spark, docs, tmp_path_factory):
    from spatial4n_spark.jobs.corpus_clean import run_corpus_clean

    wd = str(tmp_path_factory.mktemp("cc2") / "run")
    s1 = run_corpus_clean(spark, docs, wd, n_buckets=4, text_expr="text")
    rows1 = spark.read.parquet(s1["clean_path"] + "/data").count()
    # second invocation: identical identity -> all buckets skipped in
    # both checkpointed stages, output unchanged
    s2 = run_corpus_clean(spark, docs, wd, n_buckets=4, text_expr="text")
    assert s2["filter"]["buckets_run"] == 0
    assert s2["filter"]["buckets_skipped"] == 4
    assert s2["emit"]["buckets_run"] == 0
    assert spark.read.parquet(s2["clean_path"] + "/data").count() == rows1


def test_corpus_clean_rules_change_invalidates_manifests(
        spark, docs, tmp_path_factory):
    """Regression (ADVICE r03): manifest identity must include the
    transform PARAMETERS — re-running the same workdir with different
    rules must re-run every bucket, not skip them under the old rules."""
    from spatial4n_spark.jobs.corpus_clean import run_corpus_clean

    wd = str(tmp_path_factory.mktemp("cc3") / "run")
    run_corpus_clean(spark, docs, wd, n_buckets=4,
                     rules={"min_words": 3}, text_expr="text")
    s2 = run_corpus_clean(spark, docs, wd, n_buckets=4,
                          rules={"min_words": 6}, text_expr="text")
    assert s2["filter"]["buckets_run"] == 4, s2["filter"]
    assert s2["filter"]["buckets_skipped"] == 0
    # the stricter rules really took effect in the final output
    clean = spark.read.parquet(s2["clean_path"] + "/data")
    assert clean.where(F.col("q_words") < 6).count() == 0
    # and a same-rules re-run still skips (identity is stable)
    s3 = run_corpus_clean(spark, docs, wd, n_buckets=4,
                          rules={"min_words": 6}, text_expr="text")
    assert s3["filter"]["buckets_run"] == 0


def test_corpus_clean_simhash_method(spark, docs, tmp_path_factory):
    """near_dup_method="simhash" runs the same pipeline with the
    hamming-banded candidate generator: clean corpus is exact-dup-free
    and simhash-canonical (no non-canonical near-dup survives its own
    method's re-run)."""
    from spatial4n_spark.jobs.corpus_clean import run_corpus_clean
    from spatial4n_spark.operators.dedup import dedup_clusters

    wd = str(tmp_path_factory.mktemp("ccs") / "run")
    summary = run_corpus_clean(spark, docs, wd, n_buckets=4,
                               rules={"min_words": 3}, text_expr="text",
                               near_dup_method="simhash")
    clean = spark.read.parquet(summary["clean_path"] + "/data")
    assert clean.count() > 0
    assert clean.groupBy("text").count().where("count > 1").count() == 0
    again = dedup_clusters(clean.select("doc_id", "text"),
                           method="simhash")
    assert again.where(F.col("cluster_id") != F.col("doc_id")).count() == 0
