"""Streaming extension tests: file-source micro-batch ingestion with
watermarked windows (availableNow trigger), and batch sessionization."""

from __future__ import annotations

import pytest

from gigapi_querier_spark.streaming import (
    sessionize_batch,
    stream_table,
    windowed_counts_stream_to_memory,
)
from tests.fixtures import build_weather_root


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gigapi_root"))
    build_weather_root(path)
    return path


def test_stream_windowed_counts(spark, root):
    stream = stream_table(spark, root, "mydb", "weather")
    assert stream.isStreaming
    q = windowed_counts_stream_to_memory(spark, stream, "weather_counts")
    q.awaitTermination(120)
    out = spark.sql("SELECT sum(n) AS total FROM weather_counts").collect()
    assert out[0]["total"] == 84  # every fixture row lands in some window


def test_sessionize_batch(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    sessions = sessionize_batch(events, time_col="ts", gap_minutes=30)
    rows = sessions.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    # session bounds are ordered and per-user session ids start at 1
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    assert min(r["session_id"] for r in rows) == 1


def test_stateful_running_totals(spark, root):
    from gigapi_querier_spark.streaming.ingest import stateful_running_totals

    # small triggers force multiple micro-batches → state must carry over
    stream = stream_table(spark, root, "mydb", "weather", max_files_per_trigger=3)
    agg = stateful_running_totals(stream, key_col="location", value_col="temperature")
    q = (
        agg.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per location reflects ALL rows (28 each of 84)
    rows = spark.sql(
        "SELECT location, max(n_events) AS n FROM running_totals GROUP BY location"
    ).collect()
    assert {r["location"]: r["n"] for r in rows} == {
        "north": 28, "south": 28, "east": 28,
    }
    # multiple batches actually happened (update mode emits per batch)
    assert spark.sql("SELECT count(*) AS c FROM running_totals").first()["c"] > 3


def test_session_window_stream_matches_batch_semantics(spark, root):
    """Native session_window (streaming) groups the same events the batch
    lag+cumsum sessionizer does for a closed stream."""
    from gigapi_querier_spark.streaming.ingest import (
        session_windows_stream,
        stream_table,
    )

    stream = stream_table(spark, root, "mydb", "weather")
    agg = session_windows_stream(
        stream, time_col="time", user_col="location", gap="30 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT location, n_events FROM sess_mem ORDER BY location, session_start"
    ).collect()
    assert rows, "no sessions emitted"
    # weather fixture: per hour-block 12 events cycle over 3 locations →
    # 4 events per location at 15-min spacing: one session per (location,
    # block) of exactly 4 events; 3 locations × (6 regular + 1 drift) blocks
    assert len(rows) == 21
    assert all(r["n_events"] == 4 for r in rows)


def test_dedup_stream_drops_redelivery(spark, tmp_path):
    """dropDuplicatesWithinWatermark removes duplicate event_ids arriving
    in the same watermark horizon."""
    import os

    from gigapi_querier_spark.streaming.ingest import dedup_stream

    src = str(tmp_path / "dup_src")
    os.makedirs(src)
    ns = 1_700_000_000 * 1_000_000_000
    rows = [(i, ns + i * 1_000_000_000, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, time long, v double")
    df.coalesce(1).write.parquet(src + "/a")  # first delivery
    df.coalesce(1).write.parquet(src + "/b")  # full re-delivery
    stream = (
        spark.readStream.schema("event_id long, time long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = dedup_stream(stream, id_cols=("event_id",), time_col="time")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_mem").collect()[0]
    assert got["n"] == 10 and got["d"] == 10


def test_stream_to_table_roundtrip(spark, tmp_path):
    """Streamed micro-batches land in the reference layout and are
    immediately queryable through the engine's pruning catalog."""
    import glob
    import os

    from gigapi_querier_spark.engine import QueryEngine
    from gigapi_querier_spark.streaming.ingest import stream_to_table

    src = str(tmp_path / "ing_src")
    ns = 1_700_000_000 * 1_000_000_000  # 2023-11-14T22:13:20Z
    df = spark.createDataFrame(
        [(i, ns + i * 60_000_000_000, float(i)) for i in range(24)],
        "event_id long, time long, v double",
    )
    df.coalesce(2).write.parquet(src)
    stream = (
        spark.readStream.schema("event_id long, time long, v double")
        .parquet(src)
    )
    root = str(tmp_path / "ing_root")
    q = stream_to_table(
        stream, root, "sdb", "st", checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert glob.glob(root + "/sdb/st/data/date=*/hour=*/*.parquet")
    eng = QueryEngine(spark, root=root)
    rows = eng.query_rows("SELECT count(*) AS n FROM st", "sdb")
    assert rows == [{"n": 24}]


def test_sessionize_native_matches_batch(spark):
    """The session_window implementation must agree with the two-window
    reference exactly, including the strict-gap boundary (an event at
    exactly gap distance continues the session; +1µs starts a new one)."""
    from pyspark.sql import functions as F

    from gigapi_querier_spark.streaming.ingest import (
        sessionize_batch,
        sessionize_native,
    )

    gap_us = 30 * 60 * 1_000_000
    base = 1_700_000_000 * 1_000_000
    rows = [
        (1, 1, base),
        (1, 2, base + gap_us),          # exactly gap -> SAME session
        (1, 3, base + 2 * gap_us + 1),  # gap+1µs -> NEW session
        (2, 4, base),
        (2, 5, base + 1),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, t_us long")
    kw = dict(time_col="t_us", gap_minutes=30, ticks_per_second=1_000_000)
    a = {tuple(r) for r in sessionize_batch(ev, **kw).collect()}
    b = {tuple(r) for r in sessionize_native(ev, **kw).collect()}
    assert a == b
    sessions = {(r[0], r[1]) for r in b}
    assert sessions == {(1, 1), (1, 2), (2, 1)}
