"""SparkSession bootstrap — counterpart of the reference's Initialize()
(/root/reference/querier/queryClient.go:46-64, which opens one shared DuckDB
handle). Here one shared SparkSession, tuned for Parquet analytics.

Scale notes (targets a 1000-executor cluster; tested on local[N]):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic broadcast selection.
- ``nanosAsLong``: the reference's data model stores ``time`` as int64 epoch
  nanoseconds (SURVEY.md §1.3). Spark's TimestampType is µs, so ns-unit
  parquet columns are surfaced as LongType ns — matching the reference
  exactly — and converted only at presentation edges.
- Session timezone pinned to UTC so timestamp semantics are stable across
  drivers/executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitions scale with data volume, not a constant: a 100 TB /
# 1000-executor deployment sets this to 2-3× total cores (or a high
# initialPartitionNum and lets AQE coalesce). The local default of 16 is
# sized for the single-node fixtures, where per-task launch overhead
# outweighs extra parallelism (measured: 16 beats both 8 and 32 here).
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "16"))


def get_spark(
    app_name: str = "gigapi-querier-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or return) the shared SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- time model (reference parity) ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # Broadcast threshold 2 MB (default 10 MB): the default is sized
        # for "fits in memory", not "worth collecting to the driver and
        # shipping to every executor" — at the default, a borderline FACT
        # side (lineitem at small SF) gets broadcast, paying a 600k-row
        # driver collect per query. 2 MB keeps genuinely fixed-size dims
        # (region/nation/supplier) on the broadcast path and pushes
        # anything that grows with data volume to shuffle joins — the
        # scale-correct default; AQE may still upgrade a join whose
        # runtime (post-filter) size fits.
        .config("spark.sql.autoBroadcastJoinThreshold", "2097152")
        # --- adaptive execution: runtime re-plan at scale ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Advisory size tuned for analytics where post-shuffle work is
        # CPU-heavy per byte (hashing, string ops): 8 MB keeps coalesced
        # partitions numerous enough to use the cluster; at 100 TB this
        # yields more, smaller tasks — safe, just more scheduling.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # InferFiltersFromGenerate duplicates the generator expression into
        # a pushed-down Filter; for expensive generators (shingle arrays,
        # per-row transforms ahead of explode) that doubles the dominant
        # cost and runs it below the parallelizing exchange. The rule only
        # saves work for rows with empty arrays — not worth it here.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        # --- scan shape ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Whole-stage-codegen class cache (STATIC conf — takes effect at
        # session creation). The default 100 entries thrashes under a
        # mixed workload: ~16 distinct queries generate ~100 classes per
        # cycle, so every query recompiled every cycle (~0.3-0.5 s each).
        # A query service compiles each plan once and keeps it.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # --- Python <-> JVM boundary is Arrow-batched everywhere ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _register_session_functions(spark)
    return spark


#: SQL scalar helpers registered on every session. Pure SQL expression
#: bodies — they inline into Catalyst plans and stay inside whole-stage
#: codegen (no Python UDF in the hot path).
_SQL_FUNCTIONS = (
    # epoch_ns(ts) -> int64 nanoseconds (reference rewrites time literals to
    # epoch_ns(...) — querier/queryClient.go:848-850). Spark timestamps are
    # µs precision, so the low 3 digits are zero.
    """CREATE OR REPLACE TEMPORARY FUNCTION epoch_ns(x TIMESTAMP)
       RETURNS BIGINT RETURN unix_micros(x) * 1000""",
    # DuckDB's epoch extraction family, so passthrough queries written
    # against the reference keep working on the fallback path.
    """CREATE OR REPLACE TEMPORARY FUNCTION epoch_ms(x TIMESTAMP)
       RETURNS BIGINT RETURN unix_micros(x) DIV 1000""",
    """CREATE OR REPLACE TEMPORARY FUNCTION epoch_us(x TIMESTAMP)
       RETURNS BIGINT RETURN unix_micros(x)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION epoch_s(x TIMESTAMP)
       RETURNS BIGINT RETURN unix_seconds(x)""",
    # time_bucket(width_ns, time_ns) -> bucket start in ns, for the int64-ns
    # time model (DuckDB/Influx-style time_bucket; SURVEY.md §2.B).
    """CREATE OR REPLACE TEMPORARY FUNCTION time_bucket_ns(width BIGINT, t BIGINT)
       RETURNS BIGINT RETURN (t DIV width) * width""",
)


def _register_session_functions(spark: SparkSession) -> None:
    for ddl in _SQL_FUNCTIONS:
        try:
            spark.sql(ddl)
        except Exception:
            # Older Spark without SQL scalar functions: engine falls back to
            # expression rewriting in plans/sqlpass.py.
            break
