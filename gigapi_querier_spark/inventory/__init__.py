"""Query inventory — the graded operator coverage (SURVEY.md §2).

Each entry pairs a Spark implementation (``fn(spark, sf_dir) -> DataFrame``)
with the equivalent ANSI SQL the DuckDB oracle runs over the same parquet
tables. Column names and types are aligned on both sides (the driver's
compare sorts columns by name and hashes values). Float aggregates are
rounded identically on both sides so cross-engine summation order can't
flip the hash.

Queries whose semantics aren't SQL-expressible (streaming, stubs over
binary payloads) register ``oracle=None`` → the driver records a weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Q:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for rows-only checks


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in REGISTRY, f"duplicate query name {name}"
        REGISTRY[name] = Q(fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False

# Registration order doubles as the correctness-gate priority: the driver
# checks queries in queries() iteration order under a budget (round 1
# checked exactly the first 50 of 89). Queries never yet covered by a
# CORRECTNESS_r*.json row run first; the flagship/headline set follows so
# it stays inside the checked window; everything else (green in round 1)
# comes last. Update this list as rounds accumulate coverage.
_PRIORITY: tuple[str, ...] = (
    # -- new in round 2 (no CORRECTNESS row yet) --
    "ann_batch_topk",
    "dedup_neardup_clusters",
    "sample_split_counts",
    "pack_sequences_assign",
    "corpus_mixture_sample",
    "text_chunk_documents",
    "text_redact_pii",
    "ts_ohlc_hourly",
    "ts_range_join_window",
    # -- never checked as of round 1 (similarity / text / time-series /
    #    as-of / JSON / relational batches 3-5) --
    "ann_cosine_topk",
    "ann_lsh_bucket_counts",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_neardup_pairs",
    "text_token_stats",
    "text_quality_scores",
    "text_lang_id",
    "text_fingerprint",
    "text_subword_counts",
    "ts_bucket_5m",
    "ts_daily_top_type",
    "ts_sessionize",
    "ts_user_gaps",
    "json_extract_agg",
    "asof_purchase_click",
    "asof_signup_next_purchase",
    "expr_array_ops",
    "expr_null_funcs",
    "expr_interval_arith",
    "expr_map_ops",
    "expr_date_format",
    "expr_string_funcs2",
    "expr_bitwise",
    "expr_try_cast",
    "expr_greatest_least",
    "join_right_outer",
    "join_lateral",
    "set_intersect_all",
    "set_except_all",
    "agg_corr_regr",
    "agg_stats2_moments",
    "agg_histogram_bins",
    "agg_bool_bit",
    "agg_group_by_all",
    "select_star_except",
    "agg_percentile_within_group",
    "sample_fraction",
    "approx_distinct_sketch",
    # -- flagship set (green in round 1; keep inside the checked window) --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "dedup_exact_stats",
    "dedup_minhash_lsh_pairs",
    "dedup_jaccard_pairs",
    "dedup_simhash",
    "multimodal_asset_meta",
    "multimodal_frame_sample",
    "multimodal_decode_features",
    "window_rank_topn",
)


def _load() -> None:
    """Import the inventory modules (side effect: populate REGISTRY)."""
    global _LOADED
    if _LOADED:
        return
    from gigapi_querier_spark.inventory import (  # noqa: F401
        dedup,
        llmops,
        multimodal,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        similarity,
        textstats,
        timeseries,
    )

    # Reorder: priority names first (in _PRIORITY order), the rest in
    # module-registration order. dict preserves insertion order.
    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True
