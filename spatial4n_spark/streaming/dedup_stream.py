"""Streaming exact dedup: a custom stateful operator
(`applyInPandasWithState`) that emits only the FIRST document ever seen
for each content hash, across micro-batches and restarts.

The training-data-pipeline pattern: a landing stream of documents is
deduplicated against all history without a join against the full
output — state is one boolean per content hash, partitioned by the
hash (bounded per-key, shuffle only on the hash). The streaming
checkpoint persists the state store, so a restart resumes exactly
(the streaming complement of the batch manifests in checkpoint.py).

Scale notes: state size = distinct hashes x ~bytes; at 10^12 docs use
RocksDB state store (`spark.sql.streaming.stateStore.providerClass`)
and a TTL'd variant if dedup horizon is bounded. Emission is
deterministic per key: the lexicographically-smallest doc_id in the
first batch that carries the hash wins (batch arrival order decides
across batches, as in any online dedup).
"""
from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, StringType, StructField,
                               StructType)

OUT_SCHEMA = StructType([
    StructField("text_hash", StringType()),
    StructField("doc_id", StringType()),
])
STATE_SCHEMA = StructType([StructField("seen", BooleanType())])


def _first_seen(key: Any, pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        return  # hash already emitted in an earlier micro-batch
    best = None
    for pdf in pdfs:
        m = pdf["doc_id"].min()
        best = m if best is None or m < best else best
    state.update((True,))
    yield pd.DataFrame({"text_hash": [key[0]], "doc_id": [best]})


def dedup_stream(docs: DataFrame, text_expr: str = "spans[0].text") -> DataFrame:
    """Streaming docs -> one (text_hash, doc_id) per distinct content."""
    hashed = docs.select(
        F.md5(F.expr(text_expr)).alias("text_hash"), "doc_id")
    return (hashed.groupBy("text_hash")
            .applyInPandasWithState(_first_seen, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))


def run_dedup_available_now(out_df: DataFrame, out_path: str,
                            checkpoint_path: str) -> None:
    q = (out_df.writeStream.format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
