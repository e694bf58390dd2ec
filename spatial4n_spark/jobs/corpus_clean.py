"""Resumable corpus-cleaning job — the fourth production flow on the
checkpoint skeleton (tile index, content-hash dedup, ANN index are the
others): the end-to-end pipe a training-data corpus runs before
tokenization.

Stages, each with the 10^12-doc shape:

1. FILTER (per content-hash bucket, checkpointed): token/quality/lang
   metrics (all JVM SQL expressions) -> threshold filters -> exact
   dedup. The input is bucketed by md5(text) (`dedup_index` layout), so
   per-bucket exact dedup is globally exact and every bucket commits
   independently with a lineage manifest.
2. NEAR-DUP (global, bounded): MinHash-LSH banding over the survivors
   -> candidate pairs -> connected components -> cluster_id per doc.
   Pairs exist only within LSH buckets (never all-pairs), CC shuffles
   O(edges) per round, and the removal list (docs whose cluster_id !=
   doc_id) is a narrow two-column table.
3. EMIT (per bucket, checkpointed): anti-join the survivors against
   the removal list -> final corpus, partitioned by bucket, with
   per-bucket rows-in/rows-out metrics in the manifests.

A killed run resumes at bucket granularity in stages 1 and 3; stage 2
is one bounded job over the (already much smaller) survivor set.
"""
from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..checkpoint import BUCKET_COL, read_output, run_checkpointed
from ..jobs.dedup_index import write_docs_by_content_hash


def _params_digest(*params) -> str:
    """Short stable digest of a transform's parameters, folded into the
    transform __name__ so the checkpoint manifest identity includes
    them: re-running the same workdir with different rules must NOT
    skip buckets completed under the OLD rules (they would be wrong)."""
    blob = json.dumps(params, sort_keys=True, default=str)
    return hashlib.sha1(blob.encode()).hexdigest()[:8]


DEFAULT_RULES = {
    "min_words": 3,
    "max_digit_ratio": 0.3,
    "lang": None,          # e.g. "en" to keep English-guessed docs only
}


def make_filter_transform(rules: dict | None = None,
                          text_expr: str = "spans[0].text"):
    """Stage-1 transform for run_checkpointed: metrics -> filters ->
    per-bucket exact dedup (keep min doc_id per text)."""
    rules = {**DEFAULT_RULES, **(rules or {})}

    def corpus_filter(docs: DataFrame) -> DataFrame:
        from ..operators.text import with_lang_guess, with_quality
        d = docs.withColumn("text", F.expr(text_expr))
        d = with_quality(d)
        d = with_lang_guess(d)
        keep = (F.col("q_words") >= rules["min_words"]) & \
               (F.col("q_digit_ratio") <= rules["max_digit_ratio"])
        if rules["lang"]:
            keep = keep & (F.col("lang_guess") == rules["lang"])
        d = d.where(keep)
        # exact dedup inside the bucket == global (content-hash layout)
        w = F.row_number().over(
            Window.partitionBy("text_hash").orderBy("doc_id"))
        return (d.withColumn("__rn", w).where(F.col("__rn") == 1)
                 .drop("__rn", "q_len", "q_mean_word_len",
                       "q_stopword_ratio", "en_score"))
    corpus_filter.__name__ = f"corpus_filter:{_params_digest(rules, text_expr)}"
    return corpus_filter


def make_emit_transform(removal: DataFrame, upstream_digest: str = ""):
    """Stage-3 transform: drop near-dup non-canonical docs. `removal`
    is the narrow (doc_id) list from stage 2 — broadcast anti-join.

    The transform identity folds in (a) an order-independent content
    checksum of the removal list (one O(1)-driver aggregate: bit_xor of
    xxhash64(doc_id)) and (b) the stage-1 parameter digest: the
    survivors parquet PATH is the same across runs even when the rules
    changed its content, so path-lineage alone would let a re-run with
    new rules skip stale emit buckets."""
    chk = removal.agg(
        F.coalesce(F.bit_xor(F.xxhash64("doc_id")), F.lit(0)).alias("c"),
        F.count("*").alias("n")).first()
    digest = _params_digest(upstream_digest, int(chk["c"]), int(chk["n"]))

    def corpus_emit(survivors: DataFrame) -> DataFrame:
        return survivors.join(F.broadcast(removal), "doc_id", "leftanti")
    corpus_emit.__name__ = f"corpus_emit:{digest}"
    return corpus_emit


def run_corpus_clean(spark: SparkSession, docs: DataFrame, workdir: str,
                     n_buckets: int = 8, rules: dict | None = None,
                     text_expr: str = "spans[0].text",
                     near_dup_method: str = "minhash") -> dict:
    """End-to-end: bucket by content hash -> filter/dedup (resumable)
    -> near-dup clusters -> emit clean corpus (resumable). Returns the
    stage summaries; the clean corpus lands at <workdir>/clean.

    `near_dup_method`: "minhash" (shingle-Jaccard LSH) or "simhash"
    (hamming banding, pigeonhole-exact) — dedup_clusters' method knob.
    The emit stage's manifest identity already folds in the removal
    list's content checksum, so switching methods on an existing
    workdir re-runs emit instead of skipping stale buckets."""
    from ..operators.dedup import dedup_clusters

    raw = f"{workdir}/raw"
    survivors_path = f"{workdir}/survivors"
    clean = f"{workdir}/clean"

    write_docs_by_content_hash(docs, raw, n_buckets, text_expr)
    filter_tf = make_filter_transform(rules, text_expr)
    s1 = run_checkpointed(spark, raw, survivors_path, filter_tf, n_buckets)

    survivors = read_output(spark, survivors_path)
    clusters = dedup_clusters(survivors.select("doc_id", "text"),
                              method=near_dup_method)
    removal = (clusters.where(F.col("cluster_id") != F.col("doc_id"))
                       .select("doc_id"))
    # materialize the narrow removal list once; both its size and the
    # emit stage's broadcast depend on it (spillable via
    # spark.spatial4n.stageDir)
    from ..staging import stage
    removal = stage(removal, "removal_list")
    n_removed = removal.count()

    # the survivors table was itself written by run_checkpointed, so
    # its parquet root is <survivors_path>/data (bucket-partitioned)
    s3 = run_checkpointed(
        spark, f"{survivors_path}/data", clean,
        make_emit_transform(removal,
                            upstream_digest=filter_tf.__name__),
        n_buckets)
    return {"filter": s1, "near_dup_removed": n_removed, "emit": s3,
            "clean_path": clean}
