"""Text-analysis operators for training-data pipelines.

All JVM-side (built-in pyspark.sql.functions / SQL expressions inside
whole-stage codegen) — no Python in the hot path. Word hashing uses
md5-prefix integers so an external SQL oracle can reproduce values
exactly.

Operators: token counting, quality scoring, language-ID heuristic,
order-aware document fingerprinting, simhash.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# words that mark English-ish text (deterministic, tiny — a heuristic
# marker list, not a model)
EN_MARKERS = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")

# md5-prefix word hash: first 8 hex chars as a bigint (SQL-portable)
WORD_HASH = "cast(conv(substring(md5({w}), 1, 8), 16, 10) as bigint)"


def tokens_col(text: str = "text") -> Column:
    return F.split(F.col(text), " ")


def with_token_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish sub-token estimate
    (words longer than 6 chars count as ceil(len/4) sub-tokens)."""
    toks = tokens_col(text)
    subtok = F.expr(
        f"aggregate(split({text}, ' '), 0L, "
        "(acc, w) -> acc + (CASE WHEN length(w) <= 6 THEN 1L "
        "ELSE cast(ceil(length(w) / cast(4.0 as double)) as long) END))")
    return (df.withColumn("n_tokens", F.size(toks).cast("long"))
              .withColumn("n_subtokens", subtok))


def with_quality(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality scoring: length, mean word length, space ratio, digit
    ratio, marker-stopword ratio. Pure string arithmetic, oracle-exact."""
    toks = f"split({text}, ' ')"
    markers = ", ".join(f"'{m}'" for m in EN_MARKERS)
    return (df
            .withColumn("q_len", F.length(text).cast("long"))
            .withColumn("q_words", F.expr(f"size({toks})").cast("long"))
            .withColumn("q_mean_word_len", F.expr(
                f"round((length({text}) - size({toks}) + 1) / cast(size({toks}) as double), 6)"))
            .withColumn("q_digit_ratio", F.expr(
                f"round(length(regexp_replace({text}, '[^0-9]', '')) / cast(length({text}) as double), 6)"))
            .withColumn("q_stopword_ratio", F.expr(
                f"round(size(filter({toks}, w -> w in ({markers}))) / cast(size({toks}) as double), 6)")))


def with_lang_guess(df: DataFrame, text: str = "text") -> DataFrame:
    """Language-ID heuristic: marker-stopword density threshold."""
    toks = f"split({text}, ' ')"
    markers = ", ".join(f"'{m}'" for m in EN_MARKERS)
    score = F.expr(f"size(filter({toks}, w -> w in ({markers})))").cast("long")
    return (df.withColumn("en_score", score)
              .withColumn("lang_guess",
                          F.when(score * 20 >= F.expr(f"size({toks})"), F.lit("en"))
                           .otherwise(F.lit("other"))))


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Order-aware rolling fingerprint: sum_i (i+1) * h(w_i) mod 2^61-1.

    Distinguishes permutations (unlike a bag-of-words hash); pure
    integer arithmetic so the oracle reproduces it exactly. The token
    array is STAGED once (`__toks`) instead of re-splitting the text
    per reference — CollapseProject keeps multiply-referenced non-cheap
    aliases un-inlined, so the split runs once per row.
    """
    wh = WORD_HASH.format(w="w")
    staged = df.withColumn("__toks", F.split(F.col(text), " "))
    fp = F.expr(
        "aggregate(zip_with(__toks, sequence(1, size(__toks)), "
        f"(w, i) -> (cast(i as bigint) * ({wh})) % 2305843009213693951), "
        "0L, (acc, v) -> (acc + v) % 2305843009213693951)")
    return staged.withColumn("fingerprint", fp).drop("__toks")


def with_simhash(df: DataFrame, text: str = "text", bits: int = 16) -> DataFrame:
    """SimHash over distinct words: bit b of the signature is 1 iff the
    sum over words of (+1/-1 for word-hash bit b) is positive.

    The per-word md5 hash array is computed ONCE (`__wh`, the same
    staging pattern as dedup.minhash_signature) and each bit folds over
    the int array — previously each of the 16 bits re-walked
    array_distinct(split(text)) recomputing md5 per word (VERDICT r02
    item 6: 16 interpreted HOF passes per doc).
    """
    wh = WORD_HASH.format(w="w")
    staged = df.withColumn("__wh", F.expr(
        f"transform(array_distinct(split({text}, ' ')), w -> {wh})"))
    bit_terms = []
    for b in range(bits):
        s = (f"aggregate(__wh, 0L, (acc, h) -> acc + "
             f"(CASE WHEN shiftright(h, {b}) % 2 = 1 THEN 1L ELSE -1L END))")
        bit_terms.append(f"(CASE WHEN ({s}) > 0 THEN {1 << b}L ELSE 0L END)")
    return (staged.withColumn("simhash", F.expr(" + ".join(bit_terms)))
                  .drop("__wh"))
