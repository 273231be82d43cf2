"""Per-key job/stage profile harness (optimization round 15).

Runs named registry keys at $SPARK_GRAFT_SF_DIR (default sf0.1) exactly the
way bench.py does (warm-up + timed noop-sink runs), but with the Spark UI
REST API enabled so the timed run's per-job and per-stage wall/task times
can be dumped — the guide §1.1 empirical loop without a browser.

Usage:
    python scripts/profile_keys.py q_dedup_minhash q_ngram_jaccard ...

Output per key: steady-state seconds, then that run's jobs with stage
breakdown (stage name, task count, total task time, launch->complete wall).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    keys = sys.argv[1:]
    if not keys:
        raise SystemExit("usage: profile_keys.py key [key ...]")

    from cellbase_spark import registry
    from cellbase_spark.session import get_spark

    spark = get_spark(
        "cellbase-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    app_id = spark.sparkContext.applicationId
    api = f"http://localhost:4049/api/v1/applications/{app_id}"

    def rest(path: str):
        with urllib.request.urlopen(api + path, timeout=10) as r:
            return json.load(r)

    def run(fn) -> float:
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for key in keys:
        fn = qs[key]
        run(fn)  # warm-up (JIT, probe caches, scratch layouts)
        run(fn)  # second warm-up: steady state
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{key}")
        sec = run(fn)
        spark.sparkContext.setJobDescription(None)
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {key}: {sec:.3f}s  ({len(jobs)} jobs)")
        for j in jobs:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            print(
                f"  job {j['jobId']}: stages={len(j.get('stageIds', []))} "
                f"tasks={j.get('numTasks')} [{sub[-12:-4]} -> {comp[-12:-4]}]"
            )
            for sid in sorted(j.get("stageIds", [])):
                try:
                    for att in rest(f"/stages/{sid}"):
                        nm = att.get("name", "")[:60]
                        dur = None
                        if att.get("firstTaskLaunchedTime") and att.get(
                            "completionTime"
                        ):
                            from datetime import datetime

                            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                            t1 = datetime.strptime(
                                att["firstTaskLaunchedTime"], fmt
                            )
                            t2 = datetime.strptime(att["completionTime"], fmt)
                            dur = (t2 - t1).total_seconds()
                        print(
                            f"    stage {sid} ({att['status']}): {nm} "
                            f"tasks={att.get('numCompleteTasks')} "
                            f"taskTime={att.get('executorRunTime', 0)/1000.0:.2f}s "
                            f"wall={dur if dur is not None else '?'}s"
                        )
                except Exception as exc:  # skipped stages 404
                    print(f"    stage {sid}: ({exc})")


if __name__ == "__main__":
    main()
