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


# recall evals (print the curve) and search verbs (print wall-clock only)
EVAL_KEYS = ["q_ann_eval", "q_ann_eval_trained"]
SEARCH_KEYS = [
    "q_sim_topk",          # exact brute-force baseline
    "q_ann_ivf",           # inline (the measured anti-pattern, kept for the A/B)
    "q_ann_lsh",
    "q_ann_ivf_indexed",   # persisted-index probes
    "q_ann_lsh_indexed",
    "q_ann_batch_probe",
    "q_ann_index_update",
]


def main() -> None:
    dirs = sys.argv[1:] or ["/root/repo/.localdata/sf1", "/root/repo/.localdata/sf10"]
    spark = get_spark()
    for d in dirs:
        for key in EVAL_KEYS:
            fn = REGISTRY[key].fn
            walls = []
            rows = None
            for i in range(3):
                t0 = time.perf_counter()
                rows = fn(spark, d).collect()
                walls.append(time.perf_counter() - t0)
            print(f"\n== {d} {key}  cold {walls[0]:.2f}s  warm best {min(walls[1:]):.2f}s")
            for r in sorted(rows, key=lambda r: r["method"]):
                print(
                    f"  {r['method']:14s} n_cand={r['n_cand']:>8d} "
                    f"recall@20={r['recall']:.2f}"
                )
        print(f"\n== {d} search walls (cold -> warm best; cold includes index/layout build)")
        for key in SEARCH_KEYS:
            fn = REGISTRY[key].fn
            walls = []
            for i in range(3):
                t0 = time.perf_counter()
                fn(spark, d).collect()
                walls.append(time.perf_counter() - t0)
            print(f"  {key:20s} {walls[0]:7.2f}s -> {min(walls[1:]):6.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
