"""Similarity-search coverage over the ``embeddings`` table
(array<float>, 64-dim; operators in operators/similarity.py).

The query vector / hyperplanes are rows of the table itself (vec_id 0 and
1..4) so both engines derive them deterministically from the same data.
DuckDB computes cosine via explicit dot/norm arithmetic over DOUBLE[] —
same math as the Spark zip_with/aggregate fold, equal after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gigapi_querier_spark.inventory import register
from gigapi_querier_spark.operators import similarity as S
from gigapi_querier_spark.sources import load_tables


#: (applicationId, sf_dir, vec_id) → vector. Query vectors / hyperplanes /
#: centroids are deterministic per dataset; memoizing avoids re-running a
#: collect job per bench invocation.
_VEC_CACHE: dict[tuple[str, str, int], list[float]] = {}


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int) -> list[float]:
    key = (spark.sparkContext.applicationId, sf_dir, vec_id)
    if key not in _VEC_CACHE:
        t = load_tables(spark, sf_dir, ("embeddings",))
        rows = (
            t["embeddings"].where("vec_id < 8").select("vec_id", "embedding").collect()
        )
        for r in rows:  # warm all the small deterministic vectors at once
            _VEC_CACHE[
                (spark.sparkContext.applicationId, sf_dir, int(r["vec_id"]))
            ] = list(r["embedding"])
    return _VEC_CACHE[key]


_DOT = "list_sum(list_transform(range(1, 65), i -> a.e[i] * q.e[i]))"
_NA = "sqrt(list_sum(list_transform(range(1, 65), i -> a.e[i] * a.e[i])))"
_NQ = "sqrt(list_sum(list_transform(range(1, 65), i -> q.e[i] * q.e[i])))"


@register(
    "ann_cosine_topk",
    oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
     a AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT vec_id, round({_DOT} / ({_NA} * {_NQ}), 6) AS cosine_sim
FROM a, q
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _query_vec(spark, sf_dir, 0)
    t = load_tables(spark, sf_dir, ("embeddings",))
    return S.cosine_topk(t["embeddings"], q, k=10)


def _hyperplanes(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    return [_query_vec(spark, sf_dir, i) for i in (1, 2, 3, 4)]


_HP_DOT = "list_sum(list_transform(range(1, 65), i -> a.e[i] * h{j}.e[i]))"


@register(
    "ann_lsh_bucket_counts",
    oracle="""
WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
     h1 AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 1),
     h2 AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 2),
     h3 AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 3),
     h4 AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 4)
SELECT CAST(
         (CASE WHEN {d1} >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN {d2} >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN {d3} >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN {d4} >= 0 THEN 8 ELSE 0 END) AS INT) AS bucket,
       count(*) AS n
FROM a, h1, h2, h3, h4
GROUP BY 1
""".format(
        d1=_HP_DOT.format(j=1),
        d2=_HP_DOT.format(j=2),
        d3=_HP_DOT.format(j=3),
        d4=_HP_DOT.format(j=4),
    ),
)
def ann_lsh_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    return S.lsh_bucket_counts(t["embeddings"], _hyperplanes(spark, sf_dir))


_CASE_BUCKET = """
         (CASE WHEN list_sum(list_transform(range(1, 65), i -> {v}.e[i] * h1.e[i])) >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN list_sum(list_transform(range(1, 65), i -> {v}.e[i] * h2.e[i])) >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN list_sum(list_transform(range(1, 65), i -> {v}.e[i] * h3.e[i])) >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN list_sum(list_transform(range(1, 65), i -> {v}.e[i] * h4.e[i])) >= 0 THEN 8 ELSE 0 END)
"""


@register(
    "ann_lsh_topk",
    oracle=f"""
WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
     q AS (SELECT e FROM a WHERE vec_id = 0),
     h1 AS (SELECT e FROM a WHERE vec_id = 1),
     h2 AS (SELECT e FROM a WHERE vec_id = 2),
     h3 AS (SELECT e FROM a WHERE vec_id = 3),
     h4 AS (SELECT e FROM a WHERE vec_id = 4),
     bucketed AS (
       SELECT a.vec_id, a.e, {_CASE_BUCKET.format(v="a")} AS bucket
       FROM a, h1, h2, h3, h4
     ),
     qb AS (
       SELECT {_CASE_BUCKET.format(v="q")} AS bucket
       FROM q, h1, h2, h3, h4
     )
SELECT b.vec_id,
       round(list_sum(list_transform(range(1, 65), i -> b.e[i] * q.e[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> b.e[i] * b.e[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> q.e[i] * q.e[i])))), 6)
         AS cosine_sim
FROM bucketed b, q, qb
WHERE b.bucket = qb.bucket
ORDER BY cosine_sim DESC, b.vec_id
LIMIT 10
""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN restricted to the query's LSH bucket — the 2^b-fold scan
    reduction the scale path relies on (approximate by construction)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    q = _query_vec(spark, sf_dir, 0)
    return S.lsh_topk(t["embeddings"], q, _hyperplanes(spark, sf_dir), k=10)


_L2 = "list_sum(list_transform(range(1, 65), i -> ({a}.e[i] - {b}.e[i]) * ({a}.e[i] - {b}.e[i])))"


@register(
    "ann_ivf_topk",
    oracle=f"""
WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
     c AS (SELECT vec_id AS cid, e FROM a WHERE vec_id < 8),
     q AS (SELECT e FROM a WHERE vec_id = 0),
     assign AS (
       SELECT vec_id, cid FROM (
         SELECT a.vec_id, c.cid,
                row_number() OVER (PARTITION BY a.vec_id
                                   ORDER BY {_L2.format(a="a", b="c")}, c.cid) AS rn
         FROM a, c) t
       WHERE rn = 1
     ),
     probes AS (
       SELECT cid FROM (
         SELECT c.cid,
                row_number() OVER (ORDER BY {_L2.format(a="q", b="c")}, c.cid) AS rn
         FROM c, q) t
       WHERE rn <= 2
     )
SELECT a.vec_id,
       round(list_sum(list_transform(range(1, 65), i -> a.e[i] * q.e[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> a.e[i] * a.e[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> q.e[i] * q.e[i])))), 6)
         AS cosine_sim
FROM a
JOIN assign ON assign.vec_id = a.vec_id
JOIN probes ON probes.cid = assign.cid, q
ORDER BY cosine_sim DESC, a.vec_id
LIMIT 10
""",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: 8 fixed coarse centroids (vec_id < 8), probe the 2
    nearest, exact cosine inside — the partition-pruned index layout a
    100 TB ANN store uses (cluster id = partition key)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    q = _query_vec(spark, sf_dir, 0)
    centroids = [(i, _query_vec(spark, sf_dir, i)) for i in range(8)]
    return S.ivf_topk(t["embeddings"], q, centroids, k=10, n_probe=2)


@register(
    "ann_batch_topk",
    oracle=f"""
WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
     q AS (SELECT vec_id AS query_id, e AS qe FROM a WHERE vec_id < 16),
     sims AS (
       SELECT q.query_id, a.vec_id,
              round(list_sum(list_transform(range(1, 65), i -> a.e[i] * q.qe[i]))
                    / (sqrt(list_sum(list_transform(range(1, 65), i -> a.e[i] * a.e[i])))
                     * sqrt(list_sum(list_transform(range(1, 65), i -> q.qe[i] * q.qe[i])))), 6)
                AS cosine_sim
       FROM a, q
     )
SELECT query_id, vec_id, cosine_sim FROM (
  SELECT query_id, vec_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, vec_id) AS rn
  FROM sims) t
WHERE rn <= 10
""",
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval: top-10 neighbors for 16 probe vectors in ONE corpus
    pass (mapInPandas partial top-k + tiny candidate shuffle) — the
    retrieval-evaluation workload a training pipeline runs, vs 16
    sequential scans."""
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    queries = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.cosine_topk_batch(emb, queries, k=10)


@register(
    "embedding_neardup_pairs",
    oracle="""
WITH a AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.label AS blk,
       round(list_sum(list_transform(range(1, 65), i -> x.e[i] * y.e[i]))
             / (sqrt(list_sum(list_transform(range(1, 65), i -> x.e[i] * x.e[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> y.e[i] * y.e[i])))), 4)
         AS cosine_sim
FROM a x JOIN a y ON x.label = y.label AND x.vec_id < y.vec_id
WHERE round(list_sum(list_transform(range(1, 65), i -> x.e[i] * y.e[i]))
            / (sqrt(list_sum(list_transform(range(1, 65), i -> x.e[i] * x.e[i])))
             * sqrt(list_sum(list_transform(range(1, 65), i -> y.e[i] * y.e[i])))), 4) >= 0.3
""",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    return S.neardup_pairs(t["embeddings"], block_col="label", threshold=0.3)
