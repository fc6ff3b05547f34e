"""Text-analysis operators over the ``documents`` table (engine [ext]).

Token counting, quality scoring, and per-language stats — all as built-in
column expressions (no Python UDFs in the hot path), so they stay inside
whole-stage codegen and scale linearly with no shuffle except the final
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

_STOPWORDS = ("the", "a", "of", "and", "to")


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token statistics: whitespace tokenization via split —
    the baseline token counter of a training-data pipeline."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " +")).cast("long")
    return (
        d.withColumn("n_tokens", toks)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg(F.col("n_chars") / F.col("n_tokens")), 4).alias("avg_chars_per_token"),
        )
    )


ORACLE_TOKEN_STATS = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 4) AS avg_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(CAST(n_chars AS DOUBLE) / n_tokens), 4) AS avg_chars_per_token
FROM (
  SELECT lang, n_chars,
         CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tokens
  FROM documents
)
GROUP BY lang
"""


def q_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token count, mean token length,
    stopword ratio, and a composite score — the length/stopword heuristics
    of C4-style quality filtering, as pure column expressions."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " +")
    n_tokens = F.size(tokens)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t)))
    mean_tok_len = (F.length("text") - (n_tokens - 1)) / n_tokens
    stop_ratio = n_stop / n_tokens
    return d.select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(
            F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * (1.0 - stop_ratio), 4
        ).alias("quality_score"),
    )


ORACLE_QUALITY = """
SELECT doc_id, lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round((length(text) - (n_tokens - 1)) / n_tokens, 4) AS mean_token_len,
       round(n_stop / n_tokens, 4) AS stopword_ratio,
       round(least(1.0, n_tokens / 100.0) * (1.0 - n_stop / n_tokens), 4) AS quality_score
FROM (
  SELECT doc_id, lang, text,
         CAST(len(string_split_regex(text, ' +')) AS DOUBLE) AS n_tokens,
         CAST(len(list_filter(string_split_regex(text, ' +'),
                              t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) AS n_stop
  FROM documents
)
"""


QUERIES = {
    "doc_token_stats": q_doc_token_stats,
    "doc_quality_score": q_doc_quality_score,
}

ORACLES = {
    "doc_token_stats": ORACLE_TOKEN_STATS,
    "doc_quality_score": ORACLE_QUALITY,
}
