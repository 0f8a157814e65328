"""Input-size-aware execution profile (sources/tables.py) — scoping and
measurement fixes from ADVICE r3: the small fixture profile must not leak
into engine queries on a shared session, and directory-style parquet
tables must be measured recursively."""

from __future__ import annotations

import os

from gigapi_querier_spark.sources import tables as T


def _write_parquet_dir(path: str, mb: int) -> None:
    """A directory-style 'table.parquet/' holding part files (Spark
    writer layout)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-00000.parquet"), "wb") as f:
        f.write(b"\0" * (mb * 1024 * 1024))


def test_dir_input_bytes_recursive(tmp_path):
    # flat file + directory-style table are BOTH counted
    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "flat.parquet").write_bytes(b"\0" * 1024)
    _write_parquet_dir(str(sf / "big.parquet"), 70)
    assert T._dir_input_bytes(str(sf)) >= 70 * 1024 * 1024
    T._SIZE_CACHE.clear()


def test_small_profile_scoped_and_released(spark, tmp_path):
    sf = tmp_path / "small_sf"
    sf.mkdir()
    (sf / "t.parquet").write_bytes(b"\0" * 16)

    app = spark.sparkContext.applicationId
    orig_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    orig_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    T._TUNED_FOR.pop(app, None)
    T._ORIG_CONF.pop(app, None)
    try:
        T.tune_for_input(spark, str(sf))
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert (
            spark.conf.get("spark.sql.shuffle.partitions")
            == T.SMALL_INPUT_SHUFFLE
        )
        # release restores the session's OWN profile, not our constants
        T.release_small_profile(spark)
        assert spark.conf.get("spark.sql.adaptive.enabled") == orig_aqe
        assert spark.conf.get("spark.sql.shuffle.partitions") == orig_shuffle
        # released → next load re-tunes (the marker is gone)
        assert app not in T._TUNED_FOR
        # idempotent when nothing small is active
        T.release_small_profile(spark)
    finally:
        T._TUNED_FOR.pop(app, None)
        T._ORIG_CONF.pop(app, None)
        T._SIZE_CACHE.clear()
        spark.conf.set("spark.sql.adaptive.enabled", orig_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", orig_shuffle)


def test_scale_profile_not_released(spark, tmp_path):
    sf = tmp_path / "big_sf"
    sf.mkdir()
    _write_parquet_dir(str(sf / "big.parquet"), 70)

    app = spark.sparkContext.applicationId
    orig_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    orig_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    T._TUNED_FOR.pop(app, None)
    T._ORIG_CONF.pop(app, None)
    try:
        T.tune_for_input(spark, str(sf))
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        # scale profile is the steady state — release is a no-op
        T.release_small_profile(spark)
        assert T._TUNED_FOR.get(app) == (str(sf), "scale")
    finally:
        T._TUNED_FOR.pop(app, None)
        T._ORIG_CONF.pop(app, None)
        T._SIZE_CACHE.clear()
        spark.conf.set("spark.sql.adaptive.enabled", orig_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", orig_shuffle)
