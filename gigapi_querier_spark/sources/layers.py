"""Storage layers: named fs/s3 tiers (reference: querier/layerDesc.go:10-67,
path assembly querier/queryClient.go:669-710).

A layer maps catalog-relative paths to concrete URIs. ``fs`` layers
resolve under a local root; ``s3`` layers resolve to ``s3a://`` URIs plus
the per-layer Hadoop S3A configuration Spark needs (the reference instead
issues DuckDB ``CREATE SECRET`` per layer, queryClient.go:696-704).

S3 URL form (layerDesc.go): s3://[key:secret@]host[:port]/bucket/prefix
with query flags; vhost vs path URL-style both supported by S3A via
``fs.s3a.path.style.access``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import parse_qs, unquote, urlparse


@dataclass(frozen=True)
class Layer:
    name: str
    type: str  # "fs" | "s3"
    path: str = ""  # fs root
    bucket: str = ""
    prefix: str = ""
    endpoint: str = ""
    access_key: str = ""
    secret_key: str = ""
    secure: bool = True
    path_style: bool = False
    hadoop_conf: dict[str, str] = field(default_factory=dict)


def parse_layer(name: str, url: str) -> Layer:
    u = urlparse(url)
    if u.scheme == "file":
        return Layer(name=name, type="fs", path=u.path)
    if u.scheme != "s3":
        raise ValueError(f"unsupported layer scheme: {u.scheme}")
    qs = parse_qs(u.query)
    secure = qs.get("secure", ["true"])[0].lower() != "false"
    path_style = qs.get("url_style", ["vhost"])[0].lower() == "path"
    parts = u.path.lstrip("/").split("/", 1)
    bucket = parts[0]
    prefix = parts[1] if len(parts) > 1 else ""
    endpoint = u.hostname or ""
    if u.port:
        endpoint = f"{endpoint}:{u.port}"
    access = unquote(u.username or "")
    secret = unquote(u.password or "")
    conf = {
        f"fs.s3a.bucket.{bucket}.endpoint": ("https://" if secure else "http://")
        + endpoint,
        f"fs.s3a.bucket.{bucket}.access.key": access,
        f"fs.s3a.bucket.{bucket}.secret.key": secret,
        f"fs.s3a.bucket.{bucket}.path.style.access": str(path_style).lower(),
        f"fs.s3a.bucket.{bucket}.connection.ssl.enabled": str(secure).lower(),
    }
    return Layer(
        name=name,
        type="s3",
        bucket=bucket,
        prefix=prefix,
        endpoint=endpoint,
        access_key=access,
        secret_key=secret,
        secure=secure,
        path_style=path_style,
        hadoop_conf=conf,
    )


def resolve_path(layer: Layer, db: str, table: str, rel_path: str) -> str:
    """Map a catalog entry to a concrete URI (reference buildFilesList,
    queryClient.go:669-710: fs → {root}/{db}/{table}/data/{path};
    s3 → s3://{prefix}/{db}/{table}/{path})."""
    if layer.type == "fs":
        return f"{layer.path.rstrip('/')}/{db}/{table}/data/{rel_path}"
    key = "/".join(p for p in (layer.prefix, db, table, rel_path) if p)
    return f"s3a://{layer.bucket}/{key}"


def apply_layer_conf(spark, layer: Layer) -> None:
    """Install a layer's S3A credentials into the live session (the Spark
    analogue of the reference's per-layer CREATE SECRET)."""
    sc = spark.sparkContext
    for k, v in layer.hadoop_conf.items():
        sc._jsc.hadoopConfiguration().set(k, v)
