"""Scale up the driver's sf0.1 fixtures to a larger SF for the crossover
bench (VERDICT r2 next#1b): replicate each table K times with key offsets
that preserve referential integrity, perturbing text/embeddings so the
dedup/ANN workloads scale LINEARLY (replica documents share no shingles,
so candidate-pair counts grow ~K, not K²).

Output parquet is written with bounded row groups so BOTH engines can
parallelize the scan — the sf0.1 fixtures are single-row-group files,
which pins every scan (Spark's and DuckDB's) to one thread; at sf1.0 the
files split the way real lake data does.

Usage: python tools/gen_sf.py [K] [out_dir]   (defaults: 10, ./testdata_sf1.0)
Deterministic — no RNG anywhere.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROW_GROUP = 100_000

#: key column -> offset stride multiplier table (per replica i the column
#: gains i * stride; strides chosen > max key so replicas never collide)
KEY_STRIDES = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}

#: nation/region stay fixed across SF (TPC-H semantics: dims don't grow)
FIXED = ("region", "nation")


def _replica(tbl: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return tbl
    cols = {}
    for field in tbl.schema:
        col = tbl.column(field.name)
        stride = KEY_STRIDES.get(name, {}).get(field.name)
        if stride:
            col = pc.add(col, pa.scalar(i * stride, type=field.type))
        elif name == "documents" and field.name == "text":
            # prefix every word with the replica tag: replicas share NO
            # shingles, so dedup candidate pairs scale linearly with K
            col = pc.replace_substring_regex(col, r"(^|\s)(\S)", rf"\1r{i}\2")
        elif name == "events" and field.name == "ts":
            # shift each replica by 30 days: the event stream EXTENDS in
            # time (sessions/gaps/as-of stay per-user realistic)
            col = pc.add(
                col, pa.scalar(i * 30 * 86400 * 10**9, type=pa.duration("ns"))
            )
        elif name == "embeddings" and field.name == "embedding":
            # deterministic per-replica rotation of the vector space:
            # cyclic shift of dimensions keeps norms/distribution but
            # decorrelates replicas, so ANN top-k doesn't return 10 copies
            arrs = []
            for chunk in col.chunks:
                flat = chunk.flatten().to_numpy(zero_copy_only=False)
                width = len(flat) // len(chunk)
                m = flat.reshape(len(chunk), width)
                m = np.roll(m, i % width, axis=1).copy()
                arrs.append(
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(m.ravel(), type=pa.float32()), width
                    ).cast(field.type)
                    if pa.types.is_fixed_size_list(field.type)
                    else pa.ListArray.from_arrays(
                        pa.array(range(0, len(flat) + 1, width), type=pa.int32()),
                        pa.array(m.ravel(), type=pa.float32()),
                    )
                )
            col = pa.chunked_array(arrs, type=field.type)
        cols[field.name] = col
    return pa.table(cols, schema=tbl.schema)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(__file__)), "testdata_sf1.0")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        if name in FIXED:
            out = src
        else:
            out = pa.concat_tables([_replica(src, name, i) for i in range(k)])
        # Bound row groups by ROW COUNT relative to table size, not just the
        # global cap: documents (50k fat-text rows) and embeddings (20k) at
        # K=10 landed in ONE row group, serializing every scan in BOTH
        # engines to a single thread. ~32 groups per table mirrors how a
        # real lake writer bounds row groups and lets a 32-way scan engage.
        rg = max(2048, min(ROW_GROUP, len(out) // 32))
        pq.write_table(
            out,
            os.path.join(out_dir, f"{name}.parquet"),
            row_group_size=rg,
            compression="snappy",
        )
        print(f"{name}: {len(src)} -> {len(out)} rows")


if __name__ == "__main__":
    main()
