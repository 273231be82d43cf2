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


def test_bench_contention_guard_logic():
    """The bench guard's pure logic (no Spark): the contended predicate
    trips only past ref*factor, and the battery min-merge can only
    improve a key's figure across a rerun (errors replaced, never
    propagated as min(-1, t))."""
    import bench

    thr = bench.MICRO_REF_SEC * bench.MICRO_CONTENDED_FACTOR
    assert not bench._is_contended(thr * 0.99)
    assert bench._is_contended(thr * 1.01)
    assert bench._is_contended(0.01, thr * 1.01)  # either sample trips

    # min-merge semantics: the REAL bench helper, not an in-test copy
    for prev, best, want in [(None, 1.0, 1.0), (1.0, 0.5, 0.5),
                             (0.5, 0.9, 0.5), (-1.0, 0.7, 0.7)]:
        assert bench._merge_timing(prev, best) == want
