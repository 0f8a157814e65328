"""Flat-parquet table loading for the benchmark/correctness fixtures.

The driver materializes one parquet file per table under
``/root/testdata/sf{N}/`` (TESTDATA.md). This module loads them and
registers temp views so both the DataFrame-API and ``spark.sql`` paths see
the same names DuckDB's oracle sees.

``events.ts`` is parquet timestamp[ns]; with
``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as LongType epoch
nanoseconds — the reference's time model (int64 ns ``time`` column,
querier/queryClient.go:185-337).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables — always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


#: (applicationId, sf_dir, name) -> DataFrame. Loading a parquet DataFrame
#: reads footers for schema inference; memoizing keeps repeated queries from
#: re-paying that I/O (plans are immutable and reusable).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}

#: Planned-input threshold below which adaptive execution is skipped.
#: AQE exists to RE-PLAN LARGE SHUFFLES at runtime (stage-by-stage
#: materialization, re-optimization, skew splitting) — that machinery
#: costs ~20-40 ms of extra stage scheduling per query, pure overhead
#: when the whole input is a few hundred MB and every shuffle is tiny.
#: A query service sizes this by table stats: small interactive inputs
#: run the static plan with few shuffle partitions; anything at data
#: scale keeps AQE + env-scaled partitions (the 100 TB default). The
#: results are identical either way — AQE only changes physical
#: execution.
SMALL_INPUT_BYTES = 64 * 1024 * 1024
SMALL_INPUT_SHUFFLE = "8"

_SIZE_CACHE: dict[str, int] = {}
_TUNED_FOR: dict[str, str] = {}  # applicationId -> sf_dir last applied


def _dir_input_bytes(sf_dir: str) -> int:
    total = _SIZE_CACHE.get(sf_dir)
    if total is None:
        try:
            total = sum(
                e.stat().st_size
                for e in os.scandir(sf_dir)
                if e.name.endswith(".parquet")
            )
        except OSError:
            total = SMALL_INPUT_BYTES  # unknown → keep the scale defaults
        _SIZE_CACHE[sf_dir] = total
    return total


def tune_for_input(spark: SparkSession, sf_dir: str) -> None:
    """Apply the input-size-aware execution profile (idempotent per
    (session, sf_dir); both confs are runtime-settable)."""
    app = spark.sparkContext.applicationId
    if _TUNED_FOR.get(app) == sf_dir:
        return
    from gigapi_querier_spark.session import DEFAULT_SHUFFLE_PARTITIONS

    if _dir_input_bytes(sf_dir) < SMALL_INPUT_BYTES:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", SMALL_INPUT_SHUFFLE)
    else:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS)
        )
    _TUNED_FOR[app] = sf_dir


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (schema-memoized)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load fixture tables and register each as a temp view.

    Registration is idempotent and cheap (lazy plans; nothing is scanned
    until an action runs).
    """
    tune_for_input(spark, sf_dir)
    out: dict[str, DataFrame] = {}
    for name in names:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
