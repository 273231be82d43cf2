"""sf10 steady-state timing for the bucketed-layout quartet.

Builds the (denormalized) bucketed layout once — timed separately as
the ingest cost — then runs each quartet key best-of-N warm. Compare
against BASELINE.md's round-6 numbers (pre-denorm forms).

Usage: python scripts/bench_quartet.py [sf_dir] [n_runs]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from cellbase_spark.session import get_spark  # noqa: E402
from cellbase_spark.registry import REGISTRY  # noqa: E402
import cellbase_spark.queries  # noqa: F401,E402

KEYS = [
    "q_tpch_q3_bucketed",
    "q_tpch_q5_bucketed",
    "q_tpch_q9_bucketed",
    "q_tpch_q21_bucketed",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    from cellbase_spark.queries.joins import _fact_bucketed_layout

    t0 = time.perf_counter()
    _fact_bucketed_layout(spark, sf_dir)
    print(f"layout build (ingest, one-time): {time.perf_counter() - t0:.2f}s")
    for k in KEYS:
        fn = REGISTRY[k].fn
        walls = []
        for _ in range(n + 1):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            walls.append(time.perf_counter() - t0)
        print(
            f"{k:22s} cold {walls[0]:5.2f}s  warm best-of-{n} "
            f"{min(walls[1:]):5.2f}s  all {['%.2f' % w for w in walls[1:]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
