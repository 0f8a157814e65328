"""Catalog pruning tests over the reference-shaped weather fixture."""

from __future__ import annotations

import pytest

from gigapi_querier_spark.plans.sqlpass import TimeRange
from gigapi_querier_spark.sources.catalog import Catalog
from tests.fixtures import NS, _ns, build_weather_root


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gigapi_root"))
    manifest = build_weather_root(path)
    return path, manifest


def test_full_scan_discovers_all_and_skips_tmp(root):
    path, manifest = root
    files = Catalog(path).find_files("mydb", "weather")
    assert len(files) == len(manifest["files"])
    assert not any("/data/tmp/" in f for f in files)
    # stale metadata entry (gone.parquet) not included
    assert not any(f.endswith("gone.parquet") for f in files)


def test_date_hour_pruning(root):
    path, _ = root
    tr = TimeRange(start=_ns(2024, 1, 2), end=_ns(2024, 1, 2, 23, 59, 59))
    files = Catalog(path).find_files("mydb", "weather", tr)
    assert files, "day filter should keep 2024-01-02 files"
    assert all("date=2024-01-02" in f for f in files)

    tr = TimeRange(start=_ns(2024, 1, 2, 6), end=_ns(2024, 1, 2, 6, 59, 59))
    files = Catalog(path).find_files("mydb", "weather", tr)
    assert files and all("hour=06" in f for f in files)


def test_one_sided_pruning(root):
    path, _ = root
    tr = TimeRange(start=_ns(2024, 1, 3))
    files = Catalog(path).find_files("mydb", "weather", tr)
    assert files and all("date=2024-01-03" in f for f in files)

    tr = TimeRange(end=_ns(2024, 1, 1, 23, 59, 59))
    files = Catalog(path).find_files("mydb", "weather", tr)
    assert files and all("date=2024-01-01" in f for f in files)


def test_metadata_file_pruning(root):
    path, _ = root
    # range inside hour=00 of Jan 1 — metadata folder keeps its file
    tr = TimeRange(start=_ns(2024, 1, 1, 0, 10), end=_ns(2024, 1, 1, 0, 20))
    files = Catalog(path).find_files("mydb", "weather", tr)
    assert any("hour=00" in f and "date=2024-01-01" in f for f in files)
    # disjoint range → the metadata folder contributes nothing
    tr = TimeRange(start=_ns(2025, 6, 1), end=_ns(2025, 6, 2))
    assert Catalog(path).find_files("mydb", "weather", tr) == []


def test_show_namespaces(root):
    path, _ = root
    cat = Catalog(path)
    assert cat.databases() == ["mydb", "otherdb"]
    assert cat.tables("mydb") == ["metrics", "weather"]
    assert cat.tables("missing") == []


def test_json_index_wraps_catalog(root):
    from gigapi_querier_spark.sources.index import JSONIndex, make_index

    path, manifest = root
    idx = make_index("json", path)
    assert isinstance(idx, JSONIndex)
    assert idx.databases() == ["mydb", "otherdb"]
    assert len(idx.find_files("mydb", "weather")) == len(manifest["files"])


def test_redis_index_gated():
    from gigapi_querier_spark.sources.index import make_index

    try:
        import redis  # noqa: F401
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="redis"):
            make_index("redis", "redis://localhost:6379/0")


def test_unknown_index_kind():
    import pytest as _pytest

    from gigapi_querier_spark.sources.index import make_index

    with _pytest.raises(ValueError):
        make_index("zookeeper", "x")
