"""ANN recall-vs-scan-fraction at scale (VERDICT r6 item 7).

Runs q_ann_eval (IVF nprobe 1/2/4 + LSH hamming radius 1/2/3, each
recall@20 vs the exact cosine top-20) at sf1 and sf10 and prints the
scale table for BASELINE.md: recall + candidate count + wall-clock
(best-of-N within one warm session; first run reported separately as
the cold number).

Usage: python scripts/bench_ann_scale.py [sf_dir ...]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from cellbase_spark.session import get_spark  # noqa: E402
from cellbase_spark.registry import REGISTRY  # noqa: E402
import cellbase_spark.queries  # noqa: F401,E402


def main() -> None:
    dirs = sys.argv[1:] or ["/root/repo/.localdata/sf1", "/root/repo/.localdata/sf10"]
    spark = get_spark()
    fn = REGISTRY["q_ann_eval"].fn
    for d in dirs:
        walls = []
        rows = None
        for i in range(3):
            t0 = time.perf_counter()
            rows = fn(spark, d).collect()
            walls.append(time.perf_counter() - t0)
        n = None
        for r in rows:
            if n is None:
                n = r  # noqa: F841
        print(f"\n== {d}  cold {walls[0]:.2f}s  warm best {min(walls[1:]):.2f}s")
        for r in sorted(rows, key=lambda r: r["method"]):
            print(
                f"  {r['method']:8s} n_cand={r['n_cand']:>8d} "
                f"recall@20={r['recall']:.2f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
