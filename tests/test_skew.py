"""Skew utilities: salted aggregation / replicated join parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from gigapi_querier_spark.operators import skew as S


def test_salted_agg_matches_plain(spark):
    # one pathologically hot key + a long tail
    rows = [(("hot" if i % 10 else f"k{i}"), i, float(i % 7)) for i in range(5000)]
    df = spark.createDataFrame(rows, "k string, rid long, v double")
    plain = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in S.salted_agg(
            df,
            keys=["k"],
            salt_src="rid",
            aggs={
                "n": (F.count("*"), F.sum),
                "s": (F.sum("v"), F.sum),
                "mx": (F.max("v"), F.max),
            },
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_replicate_join_skewed_matches_plain(spark):
    fact = spark.createDataFrame(
        [(("hot" if i % 5 else f"k{i}"), i) for i in range(2000)], "k string, rid long"
    )
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"k{i}", float(i)) for i in range(0, 2000, 5)],
        "k string, w double",
    )
    plain = sorted(map(tuple, fact.join(dim, "k").select("k", "rid", "w").collect()))
    salted = sorted(
        map(
            tuple,
            S.replicate_join_skewed(fact, dim, on="k", salt_src="rid", n_salts=8)
            .select("k", "rid", "w")
            .collect(),
        )
    )
    assert salted == plain
