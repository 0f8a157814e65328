"""Text analysis operators: token counting, quality scoring, language-ID
heuristics, document fingerprinting.

Everything is built-in expression work (split / regexp / md5 / aggregate)
— scales as a single map pass over the corpus, no shuffle except final
aggregations, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword marker sets for the n-gram/stopword-ratio
#: language-ID heuristic. (Real corpora would use larger lists; the
#: mechanism — ratio of marker tokens per language, argmax — is the same.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(text, " "))


def subword_count(text: Column, pattern: str = "[a-z]+|[0-9]+|[^a-z0-9 ]") -> Column:
    """BPE-ish token estimate: alpha runs, digit runs, and symbols counted
    separately (regexp-based; a real BPE would be a Pandas UDF)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score.

    Features: token count, mean word length, stopword ratio, digit ratio.
    Score is a fixed linear blend — deterministic, reproducible in SQL.
    """
    text = F.col(text_col)
    n_tok = token_count(text)
    n_chars = F.length(text)
    avg_wlen = F.round((n_chars - (n_tok - 1)) / n_tok, 4)
    stop_ratio = F.round(
        F.size(F.filter(F.split(text, " "), lambda w: w.isin("the", "a", "of", "and")))
        / n_tok,
        4,
    )
    digit_ratio = F.round(
        F.size(F.regexp_extract_all(text, F.lit("[0-9]"), 0)) / n_chars, 4
    )
    score = F.round(
        F.log(1 + n_tok) - 2 * digit_ratio + stop_ratio, 4
    )
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        avg_wlen.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language-ID heuristic: classify as 'en' when English
    marker tokens exceed 5% of tokens, else 'other'."""
    text = F.col(text_col)
    n_tok = token_count(text)
    en_ratio = (
        F.size(F.filter(F.split(text, " "), lambda w: w.isin(*LANG_MARKERS["en"])))
        / n_tok
    )
    return df.select(
        "doc_id",
        "lang",
        F.when(en_ratio > 0.05, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", length: int = 16) -> DataFrame:
    """Deterministic 16-hex-char document fingerprint over normalized text
    (lower + trim + whitespace collapse). Cross-engine reproducible."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), " +", " ")
    return df.select(
        "doc_id", F.substring(F.md5(norm), 1, length).alias("fingerprint")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Context-window chunking: split each document's token stream into
    windows of ``chunk_tokens`` advancing by ``chunk_tokens - overlap``
    (the standard overlapping-chunk scheme for embedding/RAG corpora).

    Pure built-ins: one sequence() of chunk starts + explode + slice —
    a map-side row multiplier, no shuffle, fully parallel. Emits
    (id, chunk_idx, n_tokens, chunk_text).
    """
    stride = chunk_tokens - overlap
    assert stride > 0, "overlap must be smaller than chunk_tokens"
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    # chunk starts: 1, 1+stride, ... covering every token at least once
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    out = df.select(
        F.col(id_col),
        w.alias("w"),
        F.explode(starts).alias("chunk_idx"),
    )
    piece = F.slice(F.col("w"), F.col("chunk_idx") * stride + 1, chunk_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


#: Redaction patterns kept to RE2-safe syntax (no backrefs/lookarounds) so
#: Spark (Java regex) and any RE2-based engine agree byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    # SSN before PHONE: the looser phone pattern would consume SSN shapes
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    (r"\+?[0-9][0-9()\- ]{7,14}[0-9]", "<PHONE>"),
    (r"https?://[^ ]+", "<URL>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Chained regexp_replace PII scrubbing (emails, phones, SSN-shaped
    ids, URLs) — the redaction pass a training corpus runs before
    tokenization. One map pass, no shuffle; patterns are engine-portable
    by construction. Adds ``clean_text`` and ``n_redactions``."""
    text = F.col(text_col)
    clean = text
    for pat, token in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, token)
    # redaction count = how many placeholder tokens appeared
    placeholders = "|".join(t for _, t in PII_PATTERNS)
    n_red = F.size(F.regexp_extract_all(clean, F.lit(placeholders), 0)).cast("long")
    return df.withColumn("clean_text", clean).withColumn("n_redactions", n_red)


def top_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 2,
    k: int = 20,
) -> DataFrame:
    """Corpus-level most-frequent word n-grams — the vocabulary/phrase
    census step of corpus analysis (stopword mining, boilerplate
    detection, tokenizer sizing).

    Scale: explode → hash-aggregate is one shuffle with map-side partial
    aggregation (gram cardinality, not corpus size, crosses the wire);
    the deterministic (count desc, gram asc) top-k plans as
    TakeOrderedAndProject — k rows per partition reach the driver.
    """
    from gigapi_querier_spark.operators.dedup import shingle_relation, spread

    grams = shingle_relation(
        spread(df), id_col, text_col, width=width, distinct=False
    ).select(F.explode("shs").alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.col("gram"))
        .limit(k)
    )
