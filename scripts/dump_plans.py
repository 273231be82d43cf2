"""Dump .explain('formatted') for named registry keys to plans/r15/.

Usage:
    python scripts/dump_plans.py before q_dedup_minhash q_ngram_jaccard
    python scripts/dump_plans.py after  q_dedup_minhash

Writes plans/r15/<key>_<tag>.txt. Runs at $SPARK_GRAFT_SF_DIR (default
sf0.1) so the dumped plan is the exact shape the bench times.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit("usage: dump_plans.py <tag> key [key ...]")
    tag, keys = sys.argv[1], sys.argv[2:]

    from cellbase_spark import registry
    from cellbase_spark.session import get_spark

    spark = get_spark("cellbase-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    out_dir = _REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    out_dir.mkdir(parents=True, exist_ok=True)
    for key in keys:
        df = qs[key](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{key}_{tag}.txt"
        path.write_text(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
