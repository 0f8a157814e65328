"""Bucketed-table support — the co-located-join layout for repeated
fact⋈fact joins at scale.

A 100 TB deployment that repeatedly joins lineitem⋈orders on orderkey
pays a full shuffle of both sides per query. Writing both tables bucketed
(and sorted) by the join key makes the join exchange-free forever after:
each bucket pair streams through a sort-merge join with NO network
movement — the shuffle is paid once at write time.

This is Spark's native bucketing (``bucketBy``/``sortBy`` + the session
catalog); reading back requires no special code — Catalyst proves the
partitioning from table metadata and elides the Exchange (asserted by
tests/test_bucketing.py on the physical plan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table.

    ``n_buckets`` should be sized so each bucket's share of the largest
    co-bucketed table fits executor memory (at 100 TB that means
    thousands of buckets; both join sides MUST use the same count for
    the exchange to elide).
    """
    writer = df.write.mode(mode).bucketBy(int(n_buckets), *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back (plain catalog read — the bucket spec
    rides in the table metadata)."""
    return spark.table(table_name)
