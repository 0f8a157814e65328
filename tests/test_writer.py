"""Round-trip: write a reference-layout table from the events fixture,
then query it through the engine with catalog pruning active."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gigapi_querier_spark.engine import QueryEngine
from gigapi_querier_spark.sources.writer import write_table


@pytest.fixture(scope="module")
def written_root(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("written_root"))
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").alias("time"), "event_id", "user_id", "event_type", "value"
    )
    write_table(events, root, "mydb", "events", time_col="time")
    return root


def test_layout_shape(written_root):
    base = os.path.join(written_root, "mydb", "events", "data")
    dates = sorted(d for d in os.listdir(base) if d.startswith("date="))
    assert dates and all(len(d) == len("date=2024-01-01") for d in dates)
    hours = os.listdir(os.path.join(base, dates[0]))
    assert any(h.startswith("hour=") for h in hours)


def test_metadata_files_written(written_root):
    base = os.path.join(written_root, "mydb", "events", "data")
    metas = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(base)
        for f in fs
        if f == "metadata.json"
    ]
    assert metas
    meta = json.load(open(metas[0]))
    assert meta["row_count"] > 0
    assert meta["min_time"] is not None and meta["max_time"] >= meta["min_time"]
    assert all(e["path"].endswith(".parquet") for e in meta["files"])


def test_engine_roundtrip_with_pruning(spark, written_root, sf_dir):
    engine = QueryEngine(spark, root=written_root)
    all_rows = engine.query_rows("SELECT count(*) AS value FROM events")
    source_count = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert all_rows == [{"value": source_count}]

    # time-ranged query must prune to a subset of files
    engine.query_rows(
        "SELECT count(*) AS value FROM events"
        " WHERE time >= '2024-01-02T00:00:00Z' AND time <= '2024-01-02T23:59:59Z'"
    )
    pruned = engine.last_stats.n_files
    engine.query_rows("SELECT count(*) AS value FROM events")
    assert 0 < pruned < engine.last_stats.n_files


def test_roundtrip_values_match_direct(spark, written_root, sf_dir):
    engine = QueryEngine(spark, root=written_root)
    got = engine.query_rows(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    )
    exp = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r["event_type"]: r["n"] for r in got} == exp


def test_partition_layout_timezone_independent(spark, tmp_path):
    """ADVICE r1: date=/hour= must come from UTC epoch arithmetic, not the
    session timezone — otherwise pruning (which reads dir names as UTC)
    skips live files under a non-UTC session."""
    from pyspark.sql import functions as F

    from gigapi_querier_spark.sources.writer import write_table

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ns = 1_700_000_000 * 1_000_000_000  # 2023-11-14T22:13:20Z
        df = spark.createDataFrame([(ns, 1.0)], "time long, v double")
        root = str(tmp_path / "tzroot")
        write_table(df, root, "tzdb", "t")
        paths = [
            str(p.relative_to(tmp_path))
            for p in (tmp_path / "tzroot").rglob("*.parquet")
        ]
        assert any("date=2023-11-14/hour=22" in p for p in paths), paths
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_compact_table_roundtrip(spark, tmp_path):
    """Many small appended files → one file per partition dir; same rows,
    catalog still prunes correctly, metadata refreshed."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    from gigapi_querier_spark.engine import QueryEngine
    from gigapi_querier_spark.sources.writer import compact_table, write_table

    root = str(tmp_path / "croot")
    ns = 1_700_000_000 * 1_000_000_000
    # five appends → five small files per touched partition dir
    for batch in range(5):
        df = spark.createDataFrame(
            [(ns + (batch * 4 + i) * 60_000_000_000, float(i)) for i in range(4)],
            "time long, v double",
        ).coalesce(1)
        write_table(df, root, "cdb", "ct")
    data_glob = root + "/cdb/ct/data/date=*/hour=*/*.parquet"
    before = glob.glob(data_glob)
    assert len(before) > 2
    eng = QueryEngine(spark, root=root)
    rows_before = eng.query_rows("SELECT count(*) AS n FROM ct", "cdb")

    n_dirs = compact_table(spark, root, "cdb", "ct")
    assert n_dirs >= 1
    after = glob.glob(data_glob)
    assert len(after) < len(before)
    assert all("compacted-" in p for p in after if "tmp" not in p)
    # no stale tmp dirs remain
    assert not glob.glob(root + "/cdb/ct/data/**/tmp", recursive=True)

    eng2 = QueryEngine(spark, root=root)
    assert eng2.query_rows("SELECT count(*) AS n FROM ct", "cdb") == rows_before
    # metadata regenerated and consistent with the new files
    metas = glob.glob(root + "/cdb/ct/data/date=*/hour=*/metadata.json")
    assert metas
    for m in metas:
        meta = json.load(open(m))
        for fe in meta["files"]:
            assert os.path.exists(os.path.join(os.path.dirname(m), fe["path"]))


def test_compact_table_twice_with_appends(spark, tmp_path):
    """ADVICE r2 (high): re-compacting a directory whose prior compaction
    output is among the inputs must not delete the fresh output. Compact,
    append new small files, compact again — all rows must survive."""
    import glob

    from gigapi_querier_spark.engine import QueryEngine
    from gigapi_querier_spark.sources.writer import compact_table, write_table

    root = str(tmp_path / "c2root")
    ns = 1_700_000_000 * 1_000_000_000
    # all rows inside one hour so every append hits the SAME partition dir
    def batch(b):
        return spark.createDataFrame(
            [(ns + (b * 4 + i) * 1_000_000_000, float(b * 4 + i)) for i in range(4)],
            "time long, v double",
        ).coalesce(1)

    for b in range(3):
        write_table(batch(b), root, "cdb", "ct")
    assert compact_table(spark, root, "cdb", "ct") >= 1

    for b in range(3, 6):
        write_table(batch(b), root, "cdb", "ct")
    assert compact_table(spark, root, "cdb", "ct") >= 1

    data_glob = root + "/cdb/ct/data/date=*/hour=*/*.parquet"
    remaining = [
        p for p in glob.glob(data_glob) if "/tmp/" not in p[len(root) :]
    ]
    assert remaining, "re-compaction emptied the partition directory"
    eng = QueryEngine(spark, root=root)
    assert eng.query_rows("SELECT count(*) AS n FROM ct", "cdb") == [{"n": 24}]
    got = eng.query_rows("SELECT sum(v) AS s FROM ct", "cdb")
    assert got == [{"s": sum(float(i) for i in range(24))}]


def test_materialize_rollup_roundtrip(spark, tmp_path):
    """Hourly rollup lands in the reference layout, is queryable through
    the engine, and matches direct aggregation of the raw table."""
    from pyspark.sql import functions as F

    from gigapi_querier_spark.engine import QueryEngine
    from gigapi_querier_spark.sources.rollup import materialize_rollup
    from gigapi_querier_spark.sources.writer import write_table

    root = str(tmp_path / "ruroot")
    ns = 1_700_000_000 * 1_000_000_000
    raw = spark.createDataFrame(
        [
            (ns + i * 600_000_000_000, ("a" if i % 2 else "b"), float(i))
            for i in range(24)  # 10-min spacing → 4h of data
        ],
        "time long, tag string, v double",
    )
    write_table(raw, root, "rdb", "raw")
    materialize_rollup(
        spark,
        root,
        "rdb",
        "raw",
        "raw_1h",
        bucket_ns=3_600_000_000_000,
        keys=["tag"],
        aggs={"n": F.count("*"), "sum_v": F.sum("v"), "max_v": F.max("v")},
    )
    eng = QueryEngine(spark, root=root)
    got = {
        (r["time"], r["tag"]): (r["n"], r["sum_v"], r["max_v"])
        for r in eng.query_rows("SELECT time, tag, n, sum_v, max_v FROM raw_1h", "rdb")
    }
    expect = {
        (r["time"], r["tag"]): (r["n"], r["sum_v"], r["max_v"])
        for r in raw.groupBy(
            (F.expr("time DIV 3600000000000") * 3_600_000_000_000).alias("time"), "tag"
        )
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"), F.max("v").alias("max_v"))
        .collect()
    }
    assert got == expect and len(got) == len(expect) > 0
