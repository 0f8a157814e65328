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
