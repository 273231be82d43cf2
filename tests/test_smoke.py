"""M0 smoke: entry() contract + flagship query shape."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= cols


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 2


def test_flagship_groups(spark, sf_dir):
    df = entrymod.queries()["q_agg_groupby"](spark, sf_dir)
    rows = {(r.l_returnflag, r.l_linestatus) for r in df.collect()}
    # returnflag in {A,N,R} x linestatus in {F,O}; data has the TPC-H
    # correlation (A/R ship old = F, N mostly O) but at minimum >=3 groups
    assert len(rows) >= 3
    assert all(rf in "ANR" and ls in "FO" for rf, ls in rows)
