"""Deduplication operators for large-scale text pipelines.

All variants are pure DataFrame compositions over built-in functions
(md5 / split / transform / explode / groupBy) — no Python in the hot path,
so every stage stays in whole-stage codegen and scales by partitioning:

- exact:    hash-groupBy on a content fingerprint (one shuffle).
- MinHash:  shingle → k min-hash signature → banded LSH bucket join.
            Candidate generation never compares all pairs; cost is
            O(docs × shingles) + one self-join on band buckets.
- SimHash:  per-token hash bits, majority vote per bit → 16-bit sketch;
            near-dups land in the same bucket (or within Hamming distance).
- Jaccard:  exact n-gram Jaccard *within blocking keys* — the verification
            stage after LSH candidate generation.

Hashes are md5-based (not Spark's murmur3 ``hash``) so an external SQL
engine can reproduce them bit-for-bit — that's what makes the DuckDB oracle
comparisons in inventory/dedup.py possible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHINGLE_WIDTH = 3


def spread(df: DataFrame) -> DataFrame:
    """Fan a narrow input out to the cluster's parallelism before
    compute-heavy per-row work.

    Hash/shingle pipelines are CPU-bound at ~100 bytes/row, so partition
    count — not byte size — determines parallelism; a source that arrives
    in few partitions (one small file locally; a coalesced exchange at
    scale) would otherwise serialize the whole pipeline onto one core.
    No-op when the input is already wide enough.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _words(text: Column) -> Column:
    return F.split(text, " ")


def shingles(text: Column, width: int = SHINGLE_WIDTH) -> Column:
    """All ``width``-word shingles of a text as an array<string>.

    Short texts (< width words) produce a single truncated shingle so no
    document silently drops out of the signature stage.

    Prefer :func:`shingle_relation` in pipelines — it computes the word
    array as a real column once (this Column-level form re-derives it
    inside the lambda's plan when composed).
    """
    w = _words(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (width - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.array_join(F.slice(w, i, width), " "))


def shingle_relation(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = SHINGLE_WIDTH,
    extra_cols: Sequence[str] = (),
    distinct: bool = False,
) -> DataFrame:
    """(id, *extra, shs: array<string>) — one-pass shingle arrays.

    Built from an indexed ``transform`` with O(1) ``get()`` element access
    instead of per-index ``slice`` copies — ~2× faster than the naive
    higher-order form at 5k docs, identical output.
    """
    parts = ", ".join(f"get(w, i+{k})" for k in range(1, width))
    expr = (
        f"slice(transform(w, (x, i) -> concat_ws(' ', x, {parts})),"
        f" 1, greatest(size(w)-{width - 1}, 1))"
    )
    if distinct:
        expr = f"array_distinct({expr})"
    return (
        df.withColumn("w", _words(F.col(text_col)))
        .select(F.col(id_col), *[F.col(c) for c in extra_cols], F.expr(expr).alias("shs"))
    )


def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row summary: total docs, distinct contents, duplicate docs.

    Fingerprint = md5(text) so the wide text column never shuffles — at
    100 TB the shuffle carries 32-byte digests, not documents.
    """
    fp = df.select(F.md5(F.col(text_col)).alias("fp"))
    return fp.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("fp").alias("n_unique"),
        (F.count("*") - F.count_distinct("fp")).alias("n_dup_docs"),
    )


def exact_dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Keep one row per distinct ``subset`` (all columns when None)."""
    return df.dropDuplicates(list(subset) if subset else None)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
) -> DataFrame:
    """Per-document MinHash signature: ``h{i}`` = min over shingles of
    md5("{i}:" + shingle). Salted md5 emulates independent hash functions
    deterministically across engines.

    Scale: explode(shingles) multiplies rows, but groupBy(id) with min()
    partial-aggregates map-side, so the shuffle is one row per document.
    """
    sh = shingle_relation(spread(df), id_col, text_col).select(
        F.col(id_col), F.explode("shs").alias("sh")
    )
    # Numeric min-hash: the top 60 bits of the salted md5 as int64.
    # min(BIGINT) takes HashAggregate's mutable fast path (min over strings
    # would fall back to SortAggregate — measurably slower), and the value
    # is reproducible in any engine: ('0x' || substr(md5(s),1,15))::BIGINT.
    aggs = [
        F.min(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh"))), 1, 15), 16, 10
            ).cast("long")
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Candidate near-duplicate pairs: documents agreeing on any LSH band.

    Bands hash ``rows_per_band`` consecutive signature entries; the
    self-join keys on (band, band_value), so only docs in the same bucket
    are ever compared. Output: (doc_a, doc_b) with doc_a < doc_b.
    """
    n_bands = num_hashes // rows_per_band
    # posexplode over an array of band hashes: ONE pass over the signature
    # relation (a 4-way union would recompute the signature pipeline per
    # band — 4× the shingle/md5 work).
    band_arr = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"h{i}").cast("string")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )
    # The self-join reads this relation twice; persisting avoids a second
    # full signature computation (explode + 8×md5 over every shingle).
    bands = sig.select(F.col(id_col), F.posexplode(band_arr).alias("band", "bv")).persist()
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def simhash16(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """16-bit SimHash over words: bit i = majority vote of bit i of
    md5(word) across the document's words.

    Bit i is read from hex digit i of the md5 (LSB of the digit) — cheap,
    deterministic, and reproducible in any engine with md5 + instr.
    """
    w = spread(df).select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("word")
    ).withColumn("h", F.md5(F.col("word")))
    votes = [
        F.sum(
            F.when(
                (F.instr(F.lit("0123456789abcdef"), F.substring("h", i + 1, 1)) - 1) % 2
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(16)
    ]
    voted = w.groupBy(id_col).agg(*votes)
    bit_terms = [
        F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(16)
    ]
    acc = bit_terms[0]
    for t in bit_terms[1:]:
        acc = acc + t
    return voted.select(F.col(id_col), acc.cast("long").alias("simhash"))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: Sequence[str] = (),
    threshold: float = 0.5,
    width: int = SHINGLE_WIDTH,
) -> DataFrame:
    """Exact shingle-set Jaccard for pairs sharing blocking keys.

    Scale: the self-join keys on (block, shingle) — pairs only form where
    they share at least one shingle inside a block, so disjoint documents
    cost nothing. Use after LSH when blocks would still be large.
    """
    # Distinct shingle set as ONE array column. Each exploded row CARRIES
    # its document's set size — |A| and |B| ride through the join for
    # free, so no size-lookup joins afterward (two fewer plan branches,
    # and the exploded relation is read exactly twice — by the self-join
    # sides — hence the persist).
    sets = shingle_relation(
        spread(df), id_col, text_col, width=width, extra_cols=block_cols, distinct=True
    )
    block = [F.col(c) for c in block_cols]
    # Persist hash-partitioned on the join keys: both self-join sides read
    # the cache co-located, so the join itself needs no exchange.
    sh = (
        sets.select(
            F.col(id_col),
            *block,
            F.size("shs").cast("long").alias("n"),
            F.explode("shs").alias("sh"),
        )
        .repartition(F.col("sh"), *block)
        .persist()
    )
    a, b = sh.alias("a"), sh.alias("b")
    cond = (F.col("a.sh") == F.col("b.sh")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(
            F.count("*").alias("c"),
            F.max(F.col("a.n")).alias("na"),
            F.max(F.col("b.n")).alias("nb"),
        )
    )
    jac = F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 4)
    return inter.select("doc_a", "doc_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )
