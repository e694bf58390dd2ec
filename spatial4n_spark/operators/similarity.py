"""Embedding similarity search: brute-force cosine top-k + LSH ANN.

Dot products run as sequential double folds in JVM whole-stage codegen
(`aggregate(zip_with(...))`) — empirically bit-identical to DuckDB's
list_dot_product, which makes the oracle exact. The LSH path buckets by
random-hyperplane sign bits (deterministic integer coefficients) and
joins within buckets — the 100TB-scale path where brute force is the
per-bucket refinement, not the global join.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
       "cast(0 as double), (acc, v) -> acc + v)")
NORM = ("sqrt(aggregate({a}, cast(0 as double), "
        "(acc, x) -> acc + cast(x as double) * cast(x as double)))")


def cosine_expr(a: str, b: str) -> str:
    return (f"({DOT.format(a=a, b=b)} / "
            f"({NORM.format(a=a)} * {NORM.format(a=b)}))")


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int,
                     id_col: str = "vec_id", q_id: str = "q_id",
                     emb: str = "embedding", q_emb: str = "q_embedding") -> DataFrame:
    """Exact cosine top-k per query via broadcast cross join + window.

    Baseline path: fine when the query side is small (broadcast);
    for query-side scale use lsh_topk.
    """
    from pyspark.sql import Window
    j = embeddings.crossJoin(F.broadcast(queries))
    j = j.where(F.col(id_col) != F.col(q_id))
    cos = F.expr(cosine_expr(emb, q_emb))
    j = j.withColumn("cosine", cos)
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (j.withColumn("sim_rank", F.row_number().over(w))
             .where(F.col("sim_rank") <= k)
             .select(q_id, id_col, "sim_rank", F.round("cosine", 6).alias("cosine_r")))


def hyperplane_bucket_expr(emb: str = "embedding", n_planes: int = 8) -> str:
    """LSH bucket id from sign bits of deterministic pseudo-random
    hyperplanes: coef(j, i) = ((j*78233 + i*40503) % 1000003) - 501001.

    Integer coefficients -> the oracle reproduces buckets exactly; the
    dot value is O(1e4), so float noise never flips a sign in practice.
    """
    bits = []
    for j in range(n_planes):
        dot = (f"aggregate(zip_with({emb}, sequence(0, size({emb}) - 1), "
               f"(v, i) -> cast(v as double) * "
               f"(cast(({j} * 78233 + i * 40503) % 1000003 as double) - 501001.0)), "
               f"cast(0 as double), (acc, x) -> acc + x)")
        bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int,
             id_col: str = "vec_id", q_id: str = "q_id",
             emb: str = "embedding", q_emb: str = "q_embedding",
             n_planes: int = 8) -> DataFrame:
    """ANN: bucket both sides by hyperplane signs, exact cosine within
    the bucket, top-k per query. Recall < 1 by design (candidates limited
    to the query's bucket) — the scale path for billion-row sides."""
    from pyspark.sql import Window
    eb = embeddings.withColumn("bucket", F.expr(hyperplane_bucket_expr(emb, n_planes)))
    qb = queries.withColumn("bucket", F.expr(hyperplane_bucket_expr(q_emb, n_planes)))
    j = eb.join(F.broadcast(qb), "bucket", "inner").where(F.col(id_col) != F.col(q_id))
    cos = F.expr(cosine_expr(emb, q_emb))
    j = j.withColumn("cosine", cos)
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (j.withColumn("sim_rank", F.row_number().over(w))
             .where(F.col("sim_rank") <= k)
             .select(q_id, id_col, "sim_rank", F.round("cosine", 6).alias("cosine_r"),
                     "bucket"))
