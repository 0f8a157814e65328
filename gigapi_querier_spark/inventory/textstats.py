"""Text-analysis coverage over ``documents`` (operators/textstats.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gigapi_querier_spark.inventory import register
from gigapi_querier_spark.operators import textstats as T
from gigapi_querier_spark.sources import load_tables


@register(
    "text_token_stats",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       round(avg(len(string_split(text, ' '))), 4)       AS avg_tokens,
       round(avg(length(text)), 4)                       AS avg_chars
FROM documents GROUP BY source
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    n_tok = T.token_count(F.col("text"))
    return (
        t["documents"]
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tok.cast("long")).alias("total_tokens"),
            F.round(F.avg(n_tok), 4).alias("avg_tokens"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        )
    )


@register(
    "text_quality_scores",
    oracle="""
WITH f AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tok,
         length(text)                 AS n_chars,
         len(list_filter(string_split(text, ' '),
                         w -> w IN ('the', 'a', 'of', 'and'))) AS n_stop,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit
  FROM documents
)
SELECT doc_id,
       CAST(n_tok AS INT)                               AS n_tokens,
       round((n_chars - (n_tok - 1)) / n_tok, 4)        AS avg_word_len,
       round(n_stop / n_tok, 4)                         AS stopword_ratio,
       round(n_digit / n_chars, 4)                      AS digit_ratio,
       round(ln(1 + n_tok) - 2 * round(n_digit / n_chars, 4)
             + round(n_stop / n_tok, 4), 4)             AS quality_score
FROM f
""",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return T.quality_features(t["documents"])


@register(
    "text_lang_id",
    oracle="""
SELECT doc_id, lang,
       CASE WHEN len(list_filter(string_split(text, ' '),
                                 w -> w IN ('the', 'a', 'of', 'and')))
                 / len(string_split(text, ' ')) > 0.05
            THEN 'en' ELSE 'other' END AS pred_lang
FROM documents
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return T.lang_id(t["documents"])


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       substring(md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')), 1, 16)
         AS fingerprint
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return T.fingerprint(t["documents"])


@register(
    "text_subword_counts",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT)
         AS n_subwords,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
FROM documents
""",
)
def text_subword_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return t["documents"].select(
        "doc_id",
        T.subword_count(F.col("text")).alias("n_subwords"),
        T.token_count(F.col("text")).alias("n_tokens"),
    )


@register(
    "text_chunk_documents",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
  SELECT doc_id, w,
         unnest(range(0, greatest(CAST(ceil((len(w) - 8) / 56.0) AS BIGINT), 1)))
           AS chunk_idx
  FROM t
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(w[chunk_idx * 56 + 1 : chunk_idx * 56 + 64]) AS BIGINT)
         AS n_tokens,
       array_to_string(w[chunk_idx * 56 + 1 : chunk_idx * 56 + 64], ' ')
         AS chunk_text
FROM c
""",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (64-token windows, 8-token overlap) — the
    RAG/embedding-corpus preprocessing step; sequence+explode+slice, a
    shuffle-free map-side row multiplier."""
    t = load_tables(spark, sf_dir, ("documents",))
    out = T.chunk_documents(t["documents"], chunk_tokens=64, overlap=8)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "n_tokens",
        "chunk_text",
    )


@register(
    "text_redact_pii",
    oracle="""
WITH red AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\+?[0-9][0-9()\\- ]{7,14}[0-9]', '<PHONE>', 'g'),
             '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
           'https?://[^ ]+', '<URL>', 'g') AS clean_text
  FROM documents
)
SELECT doc_id, md5(clean_text) AS clean_fp,
       CAST(len(regexp_extract_all(clean_text, '<EMAIL>|<PHONE>|<SSN>|<URL>'))
            AS BIGINT) AS n_redactions
FROM red
""",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (emails/phones/SSN-shapes/URLs → placeholders);
    RE2-safe patterns so Spark's Java regex and RE2 engines agree
    byte-for-byte — verified via md5 of the redacted text."""
    t = load_tables(spark, sf_dir, ("documents",))
    out = T.redact_pii(t["documents"])
    return out.select(
        "doc_id", F.md5("clean_text").alias("clean_fp"), F.col("n_redactions")
    )


@register(
    "text_top_ngrams",
    oracle="""
WITH g AS (
  SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 1) + 1),
                               i -> array_to_string(w[i:i+1], ' '))) AS gram
  FROM (SELECT string_split(text, ' ') AS w FROM documents) x
)
SELECT gram, count(*) AS n
FROM g GROUP BY gram
ORDER BY n DESC, gram
LIMIT 20
""",
)
def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return T.top_ngrams(t["documents"], width=2, k=20)
