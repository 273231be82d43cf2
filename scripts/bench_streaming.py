"""Streaming micro-batch overhead profile (VERDICT r4 item 7).

The r4 streaming row (71k events/s at sf0.1) is a SINGLE availableNow
micro-batch over 100k events — so the wall-clock is almost entirely the
fixed micro-batch machinery (planning, state-store instances, offset/
commit log, complete-mode memory-sink rewrite), not data. This script
separates those costs by sweeping the knobs that change ONLY overhead:

  - state-store partition count (one store instance per shuffle
    partition: each pays open + commit per micro-batch)
  - state-store provider (HDFSBacked default vs RocksDB)
  - micro-batch count (maxFilesPerTrigger=1 over an N-file copy of the
    source: N batches -> N x per-batch overhead over the same data)
  - data volume (sf0.1 vs a bigger sf dir if present: the overhead
    amortization the 100 TB design depends on)

    python scripts/bench_streaming.py [sf_dir]   # default /root/testdata/sf0.1

Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

from cellbase_spark.session import get_spark  # noqa: E402
from cellbase_spark.streaming import pipelines as sp  # noqa: E402
from cellbase_spark.queries.streaming import _events_stream_dir  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"


def split_events(spark, sf_dir: str, n_files: int) -> str:
    """Rewrite events as an n_files-part parquet dir (per-sf, cached)."""
    out = os.path.join(
        "/tmp", f"cb_stream_split_{n_files}_" + sf_dir.replace("/", "_")
    )
    if not os.path.isdir(out):
        (
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(out)
        )
    return out


def run_once(spark, src: str, name: str, max_files: int | None = None) -> float:
    stream = sp.read_events_stream(spark, src, max_files_per_trigger=max_files)
    t0 = time.time()
    sp.run_stream_to_memory(sp.tumbling_agg(stream), name)
    return time.time() - t0


def measure(spark, src: str, name: str, *, parts: int, provider: str,
            max_files: int | None = None, runs: int = 3) -> float:
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_prov = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", HDFS
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try:
        run_once(spark, src, name, max_files)  # warm-up
        return min(run_once(spark, src, name, max_files) for _ in range(runs))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev_prov)


def main() -> None:
    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    n_events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).count()
    src1 = _events_stream_dir(SF_DIR)
    src4 = split_events(spark, SF_DIR, 4)

    cases = [
        ("baseline_hdfs_32p_1batch", src1, dict(parts=32, provider=HDFS)),
        ("hdfs_8p_1batch", src1, dict(parts=8, provider=HDFS)),
        ("rocksdb_32p_1batch", src1, dict(parts=32, provider=ROCKSDB)),
        ("rocksdb_8p_1batch", src1, dict(parts=8, provider=ROCKSDB)),
        ("hdfs_32p_4batches", src4, dict(parts=32, provider=HDFS, max_files=1)),
        ("hdfs_8p_4batches", src4, dict(parts=8, provider=HDFS, max_files=1)),
    ]
    out: dict[str, dict] = {}
    for label, src, kw in cases:
        sec = measure(spark, src, f"bs_{label}", **kw)
        out[label] = {
            "sec": round(sec, 4),
            "events_per_sec": round(n_events / sec) if sec > 0 else -1,
        }
        print(f"{label}: {sec:.3f}s  {out[label]['events_per_sec']} ev/s",
              file=sys.stderr)
    print("| case | sec | events/s |")
    print("|---|---|---|")
    for label, r in out.items():
        print(f"| {label} | {r['sec']} | {r['events_per_sec']} |")
    print(json.dumps({"sf_dir": SF_DIR, "events": n_events, "cases": out}))


if __name__ == "__main__":
    main()
