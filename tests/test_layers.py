"""Storage-layer parsing tests (reference querier/layerDesc.go semantics)."""

from __future__ import annotations

import pytest

from gigapi_querier_spark.sources.layers import Layer, parse_layer, resolve_path


def test_fs_layer():
    layer = parse_layer("local", "file:///var/lib/gigapi")
    assert layer.type == "fs"
    assert layer.path == "/var/lib/gigapi"
    assert (
        resolve_path(layer, "mydb", "weather", "date=2024-01-01/hour=00/p.parquet")
        == "/var/lib/gigapi/mydb/weather/data/date=2024-01-01/hour=00/p.parquet"
    )


def test_s3_layer_with_credentials():
    layer = parse_layer(
        "cold",
        "s3://AKIAXXX:sec%2Fret@minio.local:9000/mybucket/prefix?secure=false&url_style=path",
    )
    assert layer.type == "s3"
    assert layer.bucket == "mybucket"
    assert layer.prefix == "prefix"
    assert layer.access_key == "AKIAXXX"
    assert layer.secret_key == "sec/ret"  # URL-decoded
    assert layer.secure is False
    assert layer.path_style is True
    conf = layer.hadoop_conf
    assert conf["fs.s3a.bucket.mybucket.endpoint"] == "http://minio.local:9000"
    assert conf["fs.s3a.bucket.mybucket.path.style.access"] == "true"
    assert (
        resolve_path(layer, "mydb", "weather", "f.parquet")
        == "s3a://mybucket/prefix/mydb/weather/f.parquet"
    )


def test_s3_layer_defaults():
    layer = parse_layer("hot", "s3://s3.amazonaws.com/bkt")
    assert layer.secure is True and layer.path_style is False
    assert layer.prefix == ""
    assert resolve_path(layer, "db", "t", "x.parquet") == "s3a://bkt/db/t/x.parquet"


def test_unsupported_scheme():
    with pytest.raises(ValueError):
        parse_layer("bad", "gs://bucket/x")
