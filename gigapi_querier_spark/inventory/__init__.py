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
    # -- round 3: re-verify the 48 queries last checked in round 1 (the
    #    engine changed in round 2: broadcast threshold, session confs,
    #    sketch UDF hardening — VERDICT r2 wrong#5). Headline/flagship
    #    members lead so a smaller budget still covers them. --
    "q5_local_supplier_volume",
    "window_rank_topn",
    "explode_words",
    "dedup_minhash_lsh_pairs",
    "dedup_jaccard_pairs",
    "dedup_simhash",
    "dedup_exact_stats",
    "dedup_exact_keep_first",
    "dedup_minhash_signatures",
    "multimodal_asset_meta",
    "multimodal_frame_sample",
    "multimodal_decode_features",
    "ts_gapfill_hourly",
    "ts_moving_avg_10m",
    "window_lag_lead",
    "window_running_sum",
    "window_first_last_nth",
    "window_ntile_pctrank",
    "agg_count_distinct",
    "agg_cube",
    "agg_filter_clause",
    "agg_grouping_sets",
    "agg_having",
    "agg_minmax_by",
    "agg_rollup",
    "agg_stats",
    "agg_string_concat",
    "cte_top_supplier",
    "recursive_cte_months",
    "expr_case_cast",
    "expr_datetime_funcs",
    "expr_math_funcs",
    "expr_string_funcs",
    "expr_struct_ops",
    "join_anti",
    "join_cross",
    "join_full_outer",
    "join_left_outer_agg",
    "join_semi",
    "order_limit_topk",
    "pivot_status_counts",
    "unpivot_metrics",
    "set_except",
    "set_intersect",
    "set_union",
    "subquery_exists_correlated",
    "subquery_in",
    "subquery_scalar",
    # -- implementation changed in round 3 (rows-only → full oracle);
    #    their round-2 rows are stale --
    "sample_fraction",
    "approx_distinct_sketch",
    # -- NEW in round 3 (no CORRECTNESS row yet) --
    "contamination_ngram_overlap",
    "text_top_ngrams",
    "skew_salted_agg",
    "skew_replicated_join",
    # -- flagships verified in BOTH prior rounds; first in line if the
    #    budget exceeds 54 --
    "q1_pricing_summary",
    "q3_shipping_priority",
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
