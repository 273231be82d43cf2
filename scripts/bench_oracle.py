"""Time the DuckDB oracle queries — the de-facto performance baseline.

BASELINE.md's contract: Spark wall-clock must land within 2x of DuckDB on
the identical query + data. This script produces the DuckDB side at any
scale factor; bench.py produces the Spark side.

    python scripts/bench_oracle.py [sf_dir] [key ...]   # default sf0.1, all keys
Prints one JSON line {"queries": {key: sec}, "sf_dir": ...} (best of 2).
Optional key args restrict the sweep (exact registry keys) — used for the
same-day headline re-time so the 25-key set doesn't pay the full-registry
sweep cost.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

from cellbase_spark import registry, schemas  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY_KEYS = set(sys.argv[2:])

# Oracles that are correct at the sf0.01 gate but computationally
# infeasible for DuckDB at bench scale — skipped here with the reason
# recorded (the Spark side handles these sizes; see BASELINE.md).
INFEASIBLE_AT_BENCH = {
    "q_dedup_clusters": (
        "recursive-CTE transitive closure is O(sum cluster_size^2) rows; "
        "DNF (>10 min) at sf0.1 — Spark's path-halving label propagation "
        "finishes in ~9 s"
    ),
    # same recursive-closure oracle (shared _CLUSTERS_ORACLE / the
    # recursive canonical CTE) — discovered round 5 when the full sweep
    # hung >70 CPU-min on these before reaching the headline keys
    "q_cc_iterative": "same closure oracle as q_dedup_clusters",
    "q_cluster_size_histogram": "closure oracle inside a histogram agg",
    "q_dedup_canonical": "recursive canonical CTE over the pair graph",
}


def main() -> None:
    import os

    con = duckdb.connect()
    for t in schemas.TABLE_NAMES:
        # partial scale dirs (e.g. a facts-only sf100) simply lack some
        # tables; register what exists — a key needing a missing view
        # fails loudly at query time
        if not os.path.exists(f"{SF_DIR}/{t}.parquet"):
            print(f"view {t}: missing at {SF_DIR}, skipped", file=sys.stderr)
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    out: dict[str, float] = {}
    for key, sql in sorted(registry.oracle_sql().items()):
        if ONLY_KEYS and key not in ONLY_KEYS:
            continue
        if key in INFEASIBLE_AT_BENCH:
            print(f"{key}: SKIPPED ({INFEASIBLE_AT_BENCH[key]})", file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.sql(sql).fetchall()
            best = min(best, time.time() - t0)
        out[key] = round(best, 4)
        print(f"{key}: {best:.3f}s", file=sys.stderr)
    print(json.dumps({"queries": out, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
