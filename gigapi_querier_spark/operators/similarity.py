"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one pass over the table with the
query vector folded into the plan as a literal (no join, no shuffle until
the final top-k, which plans as TakeOrderedAndProject).

Scale path: sign-random-projection LSH — b hyperplanes → 2^b buckets;
candidates only within the probe's bucket, turning a full scan into a
bucket-pruned scan. Hyperplanes are passed in (deterministic), so results
are reproducible and oracle-checkable.

All vector math uses built-in higher-order functions (zip_with +
aggregate) over array<double> — JVM-side, no Python UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + left-fold aggregate (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lit_vector(values: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query vector is a plan literal → scan + per-row arithmetic +
    TakeOrderedAndProject; at 100 TB this is embarrassingly parallel with
    k rows per partition surviving to the driver.
    """
    q = lit_vector(query)
    sim = F.round(cosine(_as_double(F.col(vec_col)), q), decimals).alias("cosine_sim")
    return (
        df.select(F.col(id_col), sim)
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def lsh_bucket(vec: Column, hyperplanes: Sequence[Sequence[float]]) -> Column:
    """Sign-random-projection bucket id: bit j = sign(vec · hyperplane_j)."""
    acc = F.lit(0)
    for j, h in enumerate(hyperplanes):
        bit = F.when(dot(_as_double(vec), lit_vector(h)) >= 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        acc = acc + bit
    return acc.cast("int")


def lsh_bucket_counts(
    df: DataFrame,
    hyperplanes: Sequence[Sequence[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Histogram of LSH buckets — the partition layout an ANN index would
    use (bucket == partition key at scale)."""
    return (
        df.select(lsh_bucket(F.col(vec_col), hyperplanes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    hyperplanes: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket (approximate: recall
    trades against the 2^b-fold scan reduction)."""
    qbucket = 0
    for j, h in enumerate(hyperplanes):
        if sum(float(x) * float(y) for x, y in zip(query, h)) >= 0:
            qbucket |= 1 << j
    bucketed = df.where(lsh_bucket(F.col(vec_col), hyperplanes) == F.lit(qbucket))
    return cosine_topk(bucketed, query, k=k, id_col=id_col, vec_col=vec_col, decimals=decimals)


def neardup_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key.

    The self-join keys on the block column, so cost is sum(block²), not
    total². At scale, block on an LSH bucket instead of a label.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(block_col).alias("blk"), F.col(vec_col).alias("va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(block_col).alias("blk"), F.col(vec_col).alias("vb")
    )
    sim = F.round(cosine(_as_double(F.col("va")), _as_double(F.col("vb"))), decimals)
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.col("blk"), sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )
