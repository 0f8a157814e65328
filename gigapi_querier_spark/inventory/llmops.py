"""Training-pipeline operator coverage beyond dedup/similarity
(operators/pipeline.py): cluster resolution, reproducible splits,
sequence packing, corpus mixing — all deterministic (md5-keyed) so the
DuckDB oracles verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gigapi_querier_spark.inventory import register
from gigapi_querier_spark.inventory.dedup import ORACLE_LSH_PAIRS
from gigapi_querier_spark.operators import dedup as D
from gigapi_querier_spark.operators import pipeline as P
from gigapi_querier_spark.sources import load_tables

#: the reproducible md5 bucket both engines compute identically
_BUCKET = "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100)"


@register(
    "dedup_neardup_clusters",
    oracle=f"""
WITH RECURSIVE lsh AS ({ORACLE_LSH_PAIRS}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM lsh
  UNION
  SELECT doc_b, doc_a FROM lsh
),
reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.node = e.b
)
SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node
""",
)
def dedup_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH pairs → duplicate CLUSTERS (connected components, min-label):
    the step that turns candidate pairs into keep/drop decisions. Spark:
    min-label propagation to fixpoint, one shuffle per round (graph
    diameter rounds). Oracle: recursive-CTE transitive closure."""
    t = load_tables(spark, sf_dir, ("documents",))
    sig = D.minhash_signatures(t["documents"], num_hashes=8)
    pairs = D.minhash_lsh_pairs(sig, num_hashes=8, rows_per_band=2)
    return P.connected_components(pairs)


@register(
    "sample_split_counts",
    oracle=f"""
SELECT CASE WHEN {_BUCKET} < 10 THEN 'val'
            WHEN {_BUCKET} < 20 THEN 'test'
            ELSE 'train' END AS split,
       count(*) AS n
FROM documents GROUP BY 1
""",
)
def sample_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test split (md5-keyed, no RNG): the split a
    100 TB corpus can re-derive per row with zero coordination. Verified
    via the per-split counts."""
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        P.train_val_test_split(t["documents"], "doc_id", val_pct=10, test_pct=10)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
    )


@register(
    "pack_sequences_assign",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         {_BUCKET.replace('% 100', '% 8')} AS shard,
         least(CAST(len(string_split(text, ' ')) AS BIGINT), 512) AS t
  FROM documents
)
SELECT doc_id, shard,
       CAST(floor((sum(t) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - t) / 512) AS BIGINT) AS pack_id
FROM toks
""",
)
def pack_sequences_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing as a WINDOW op: concat-and-chunk assignment
    (pack = floor(start_offset / target)) within md5 shards — same
    packing quality as a global pass (each shard is a uniform sample),
    embarrassingly parallel, one shuffle on the shard key."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return P.pack_sequences(docs, token_col="n_tokens", target=512, shards=8)


@register(
    "corpus_mixture_sample",
    oracle=f"""
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
WHERE {_BUCKET} < CASE lang WHEN 'en' THEN 100 WHEN 'zh' THEN 60
                            WHEN 'fr' THEN 40 WHEN 'de' THEN 40
                            ELSE 0 END
GROUP BY lang
""",
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixture: keep a deterministic per-language slice
    (upweight en/zh, drop es) — content-stable sampling with no RNG, a
    pure pushed-down filter. Verified via per-language counts/chars."""
    t = load_tables(spark, sf_dir, ("documents",))
    kept = P.mixture_sample(
        t["documents"],
        key_col="doc_id",
        group_col="lang",
        rates={"en": 100, "zh": 60, "fr": 40, "de": 40},
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("chars")
    )


@register(
    "contamination_ngram_overlap",
    oracle=f"""
WITH tr_sets AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                                      i -> array_to_string(w[i:i+2], ' '))) AS shs
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE {_BUCKET} >= 5) x
),
tr AS (
  SELECT doc_id, CAST(len(shs) AS BIGINT) AS n,
         ('0x' || substring(md5(unnest(shs)), 1, 15))::BIGINT AS sh
  FROM tr_sets
),
b_sets AS (
  SELECT list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                        i -> array_to_string(w[i:i+2], ' ')) AS shs
  FROM (SELECT string_split(text, ' ') AS w FROM documents
        WHERE {_BUCKET} < 5) x
),
bset AS (
  SELECT DISTINCT ('0x' || substring(md5(unnest(shs)), 1, 15))::BIGINT AS sh
  FROM b_sets
)
SELECT tr.doc_id,
       max(tr.n)                                                AS n_shingles,
       CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                                AS n_hit,
       round(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / max(tr.n), 4)                                    AS overlap
FROM tr LEFT JOIN bset b ON tr.sh = b.sh
GROUP BY tr.doc_id
""",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-data hygiene: per-doc fraction of distinct 3-gram
    shingles leaked from a held-out benchmark slice (the md5 bucket
    carves a deterministic 5% 'benchmark'; both engines reproduce the
    split bit-for-bit). Scale: the benchmark collapses to a distinct
    hash set that broadcasts; the train side joins on 8-byte hashes."""
    t = load_tables(spark, sf_dir, ("documents",))
    b = P.hash_bucket(F.col("doc_id"))
    return P.contamination_overlap(
        t["documents"].where(b >= 5), t["documents"].where(b < 5)
    )
