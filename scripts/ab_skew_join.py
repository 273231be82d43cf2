"""AQE skew-join vs manual salting A/B on a pathologically skewed join
(r14 verdict #6).

Shape: sf10 orders (15M rows) with 30% of rows remapped to ONE hot
custkey, joined to customer (1.5M rows). Broadcast is disabled for the
A/B (static + AQE thresholds -1) because the 100 TB question is what
happens when the dim does NOT fit a broadcast — with broadcast allowed,
AQE simply broadcasts the 30 MB customer side and skew is moot (that
finding is recorded too: run with --allow-broadcast).

Variants, same session (all knobs runtime-settable), interleaved
best-of-N:
  A  plain join, AQE skew-join OFF   — the straggler baseline
  B  plain join, AQE skew-join ON    — the zero-code engine default
  C  salted_join(salt=8), skew OFF   — the explicit operator form
  D  salted_join(salt=8), skew ON    — stacking both (salting already
     levels the partitions, AQE should find nothing to split)

Usage: python scripts/ab_skew_join.py [sf_dir] [n_runs] [--allow-broadcast]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cellbase_spark.io import load_table  # noqa: E402
from cellbase_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/repo/.localdata/sf10"
    n_runs = int(args[1]) if len(args) > 1 else 3
    allow_broadcast = "--allow-broadcast" in sys.argv

    spark = get_spark("ab-skew-join")
    spark.sparkContext.setLogLevel("ERROR")
    if not allow_broadcast:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    from cellbase_spark.operators.joins import salted_join

    # 30% of orders hammered onto custkey 1 (deterministic), the rest
    # keep their natural near-uniform key
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .withColumn(
            "k",
            F.when(F.col("o_orderkey") % 10 < 3, F.lit(1)).otherwise(
                F.col("o_custkey")
            ),
        )
        .select("o_orderkey", F.col("k").alias("o_custkey"))
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )

    def plain():
        return o.join(c, "o_custkey")

    def salted():
        return salted_join(o, c, "o_custkey", salt=8)

    variants = [
        ("A plain, skew OFF", plain, "false"),
        ("B plain, skew ON ", plain, "true"),
        ("C salted, skew OFF", salted, "false"),
        ("D salted, skew ON ", salted, "true"),
    ]

    # warm the page cache once
    plain().count()
    results: dict[str, list[float]] = {name: [] for name, _, _ in variants}
    for _ in range(n_runs):
        for name, build, skew in variants:  # interleaved: drift-fair
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
            t0 = time.perf_counter()
            n = build().count()
            results[name].append(time.perf_counter() - t0)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    print(f"rows per join: {n}; broadcast allowed: {allow_broadcast}")
    for name, walls in results.items():
        print(
            f"{name}: best {min(walls):6.2f}s  "
            f"all {['%.2f' % w for w in walls]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
