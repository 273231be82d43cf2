"""Scale-trend measurement for the perf-flagged keys.

The flagged ratios (BASELINE.md / VERDICT round 1) are claimed to be
overhead-bound: Spark's fixed per-query cost dominates at small data and
amortizes as data grows. This measures that directly — each flagged key
runs in Spark AND DuckDB at every available scale factor (best of 2,
steady state) and prints the ratio trend. A genuinely algorithmic gap
would hold or grow with scale; an overhead-bound one shrinks.

    python scripts/bench_trend.py          # all three sf dirs
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import sys
import threading
import time
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

from cellbase_spark import registry, schemas  # noqa: E402
from cellbase_spark.session import get_spark  # noqa: E402

# VERDICT r3 item 6's six >2x keys plus the dedup-family drift keys,
# plus (round 5) the remaining headline keys without an sf1 row.
FLAGGED = [
    "q_sql_recursive",
    "q_tfidf",
    "q_pagerank",
    "q_tpch_q5",
    "q_tpch_q18",
    "q_tpch_q21",
    "q_dedup_minhash",
    "q_dedup_near",
    "q_ngram_jaccard",
    "q_tpch_q3",
    "q_tpch_q9",
    "q_agg_groupby",
]
# --keys=a,b,c restricts the run (measuring one new key must not re-pay
# the whole ladder, incl. the DNFing dedup oracles at sf1)
for _a in list(sys.argv[1:]):
    if _a.startswith("--keys="):
        FLAGGED = [k for k in _a.split("=", 1)[1].split(",") if k]
        sys.argv.remove(_a)
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# One notch beyond the driver data: locally generated, same schema and
# marginals (scripts/gen_testdata.py). Included automatically if present.
_SF1 = Path(_REPO) / ".localdata" / "sf1"
if _SF1.is_dir():
    SF_DIRS.append(str(_SF1))
# explicit dirs on the command line override the default ladder
if len(sys.argv) > 1:
    SF_DIRS = sys.argv[1:]

DUCK_BUDGET_SEC = 300.0


def timed_duck(con: duckdb.DuckDBPyConnection, sql: str) -> float:
    """Run the oracle once, interrupting past the budget (a DNFing
    recursive-CTE oracle must not wedge the whole trend run)."""
    timer = threading.Timer(DUCK_BUDGET_SEC, con.interrupt)
    timer.start()
    t0 = time.time()
    try:
        con.sql(sql).fetchall()
        return time.time() - t0
    except duckdb.InterruptException:
        return float("inf")
    finally:
        timer.cancel()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in schemas.TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def best_of_2(fn) -> float:
    fn()
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    spark = get_spark("bench-trend")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    out: dict[str, dict[str, dict[str, float]]] = {}
    for sf_dir in SF_DIRS:
        con = duck_con(sf_dir)
        for key in FLAGGED:
            s = best_of_2(
                lambda: qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
            )
            d = timed_duck(con, oracles[key])
            if d < DUCK_BUDGET_SEC:
                d = min(d, timed_duck(con, oracles[key]))
            out.setdefault(key, {})[sf_dir.rsplit("/", 1)[-1]] = {
                "spark": round(s, 3),
                "duck": round(d, 3) if d != float("inf") else "DNF",
                "ratio": round(s / d, 2) if 0 < d != float("inf") else 0.0,
            }
            print(f"{key} @ {sf_dir}: spark={s:.3f}s duck={d:.3f}s", file=sys.stderr)
    sfs = [p.rsplit("/", 1)[-1] for p in SF_DIRS]
    print("| key | " + " | ".join(f"{sf} ratio" for sf in sfs) + " |")
    print("|---|" + "---|" * len(sfs))
    for key in FLAGGED:
        cells = " | ".join(f"{out[key][sf]['ratio']}x" for sf in sfs)
        print(f"| `{key}` | {cells} |")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
