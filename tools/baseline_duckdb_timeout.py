"""DuckDB baseline with a per-query wall-clock cap, for large SFs where
some oracle formulations (exploded self-joins, quadratic block compares)
run for hours. Each query executes in its own subprocess; one that
exceeds the cap is recorded as ``null`` with a ``timeouts`` entry, and
the total reports only completed queries (so it UNDERSTATES DuckDB's
true total — the honest direction for a crossover claim in Spark's
favor).

Protocol otherwise matches tools/baseline_duckdb.py: untimed warmup,
then N measured passes taking the per-query MIN, Arrow materialization.

Usage: python tools/baseline_duckdb_timeout.py [sf_dir] [cap_sec] [passes]
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from bench import HEADLINE

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10"
CAP = float(sys.argv[2]) if len(sys.argv) > 2 else 600.0
PASSES = int(sys.argv[3]) if len(sys.argv) > 3 else 2

_CHILD = r"""
import json, sys, time
import duckdb
sf_dir, sql, passes = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
con.execute("SET enable_progress_bar = false")  # it writes to stdout
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
con.execute(sql).arrow()  # warmup
best = None
for _ in range(passes):
    t0 = time.perf_counter()
    con.execute(sql).arrow()
    el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
print(json.dumps({"sec": round(best, 3)}))
"""


def main() -> None:
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    timings: dict[str, float | None] = {}
    timeouts: list[str] = []
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            out = subprocess.run(
                [sys.executable, "-c", _CHILD, SF_DIR, sql, str(PASSES)],
                capture_output=True,
                text=True,
                # cap covers warmup + all passes; a query must fit
                # (passes+1) runs inside it
                timeout=CAP * (PASSES + 1),
            )
            if out.returncode != 0:
                print(f"# {name}: FAILED {out.stderr[-200:]}", file=sys.stderr)
                timings[name] = None
                continue
            payload = out.stdout[out.stdout.rfind("{") :]
            timings[name] = json.loads(payload)["sec"]
        except subprocess.TimeoutExpired:
            timings[name] = None
            timeouts.append(name)
        print(f"# {name}: {timings[name]}", file=sys.stderr)
    done = {k: v for k, v in timings.items() if v is not None}
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_total_wall",
                "value": round(sum(done.values()), 3),
                "unit": "sec",
                "queries": timings,
                "timeouts": timeouts,
                "cap_sec": CAP,
                "passes": PASSES,
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
