"""Skew-handling utilities: salted aggregation and salted broadcast-side
replication for joins whose key distribution is pathological.

AQE's skew-join splitting (on in session.py) handles most skew at runtime
by splitting oversized partitions; these helpers cover the two cases AQE
can't:

- ``salted_agg``: a single hot group overwhelms one reducer even after
  AQE splits the partition, because one GROUP BY key can't split. Salting
  the key fans the partial aggregation across N buckets; a second tiny
  aggregation merges the N partials. Works for any algebraic aggregate
  (sum/count/min/max — pass the merge expressions).
- ``replicate_join_skewed``: joining a skewed fact key against a small
  dimension: explode the dimension N ways (one row per salt) and salt the
  fact side randomly-but-deterministically, so each hot key's rows spread
  over N co-partitioned buckets. Exact same join result, N× smaller
  per-task key groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, n: int) -> Column:
    """Deterministic salt in [0, n): md5-derived so retries/replays land
    identically (no rand() — a task retry with rand() double-counts)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 7), 16, 10).cast("long") % n
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_src: str,
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for hot GROUP BY keys.

    ``aggs`` maps output name → (stage-1 aggregate over rows, stage-2
    merge over stage-1 partials); e.g. a count is ``(count(*),
    sum(partial))``, a sum is ``(sum(x), sum(partial))``, min/max merge
    with min/max. ``salt_src`` is any high-cardinality column (row id)
    used to spread rows of the same key.

    Stage 1 groups on (keys + salt) — the hot key fans over ``n_salts``
    reducers; stage 2 groups on keys alone over ``n_salts`` rows per key.
    """
    salted = df.withColumn("__salt", _salt(F.col(salt_src), n_salts))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
    merged = stage1.groupBy(*keys).agg(
        *[
            merge(F.col(f"__p_{name}")).alias(name)
            for name, (_, merge) in aggs.items()
        ]
    )
    return merged


def replicate_join_skewed(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed fact against a small dimension by replicating the
    dimension ``n_salts``× and salting the fact side.

    Exact result parity with ``fact.join(dim, on)``: every fact row meets
    exactly the one dimension replica carrying its salt. Use when the dim
    is too big to broadcast outright but hot fact keys overwhelm single
    reducers in a plain shuffle join.
    """
    fact_s = fact.withColumn("__salt", _salt(F.col(salt_src), n_salts))
    dim_r = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    joined = fact_s.join(dim_r, [on, "__salt"], how)
    return joined.drop("__salt")
