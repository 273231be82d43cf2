"""M1 relational core: per-operator unit tests on tiny hand-built frames
plus invariants on the registered queries (SURVEY.md §5.2 layer 2)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


def test_filter_pushdown_invariance(spark, sf_dir, qs):
    """where(p).select(c) == select(c).where(p) — the algebraic law
    Catalyst's PushDownPredicates relies on."""
    from cellbase_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    b = li.select("l_orderkey", "l_quantity").where(F.col("l_quantity") > 30)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pushed_filters_reach_scan(spark, sf_dir, qs):
    plan = qs["q_scan_parquet"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_returnflag" in plan


def test_semi_anti_partition(spark, sf_dir, qs):
    """semi(k) ∪ anti(k) == all customers, disjointly (same predicate)."""
    from cellbase_spark.io import load_table

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    assert semi.count() + anti.count() == c.count()
    assert semi.join(anti, "c_custkey", "inner").count() == 0


def test_broadcast_join_is_broadcast(spark, sf_dir, qs):
    plan = qs["q_join_broadcast"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_inner_join_matches_sql(spark, sf_dir, qs):
    from cellbase_spark.io import register_temp_views

    register_temp_views(spark, sf_dir)
    df_api = qs["q_join_inner"](spark, sf_dir)
    df_sql = spark.sql(
        """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
           FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
           WHERE o.o_totalprice > 100000"""
    )
    assert df_api.exceptAll(df_sql).count() == 0
    assert df_sql.exceptAll(df_api).count() == 0


def test_union_counts(spark, sf_dir, qs):
    from cellbase_spark.io import load_table

    got = qs["q_union"](spark, sf_dir).count()
    c = load_table(spark, sf_dir, "customer").count()
    s = load_table(spark, sf_dir, "supplier").count()
    assert got == c + s


def test_topk_global_is_sorted_and_sized(spark, sf_dir, qs):
    rows = qs["q_topk_global"](spark, sf_dir).collect()
    assert len(rows) == 100
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_approx_distinct_envelope(spark, sf_dir, qs):
    """approx_count_distinct(rsd=0.02) within ±5% of exact. The key
    emits that verdict per group (round 14 gate form); assert it AND
    re-derive the envelope independently so a broken verdict expression
    can't self-certify."""
    from cellbase_spark.io import load_table

    rows = qs["q_agg_approx_distinct"](spark, sf_dir).collect()
    assert rows and all(r.within_tol for r in rows), rows
    o = load_table(spark, sf_dir, "orders")
    both = {
        r.o_orderpriority: (r.ap, r.ex)
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("ap"),
            F.countDistinct("o_custkey").alias("ex"),
        )
        .collect()
    }
    assert {r.o_orderpriority for r in rows} == set(both)
    exact_by_group = {r.o_orderpriority: r.exact_custs for r in rows}
    for k, (ap, ex) in both.items():
        assert exact_by_group[k] == ex
        assert abs(ap - ex) <= max(2, 0.05 * ex), (k, ap, ex)


def test_having_threshold(spark, sf_dir, qs):
    rows = qs["q_agg_having"](spark, sf_dir).collect()
    assert all(r.total_spent > 1_500_000 for r in rows)


def test_csv_dialect_roundtrip_is_byte_exact(spark, tmp_path):
    """The q_scan_csv_dialect writer/reader config (RFC-4180 doubled
    quotes, multiLine, whitespace trim off) round-trips hostile cells
    byte-exactly — and the naive single-line read of the same files would
    shred the embedded-newline records, which is why multiLine is pinned."""
    hostile = [
        (1, ' lead,"x""y"\ntail '),     # delimiter + quotes + newline + spaces
        (2, "plain"),
        (3, '""'),                        # literally two double quotes
        (4, "a\nb\nc"),                  # multiple embedded newlines
    ]
    df = spark.createDataFrame(hostile, "id int, v string")
    out = str(tmp_path / "csv")
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
    )
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .schema("id int, v string")
        .csv(out)
    )
    assert sorted(tuple(r) for r in back.collect()) == sorted(hostile)
    naive = (
        spark.read.option("header", "true")
        .schema("id int, v string")
        .csv(out)
    )
    # single-line mode splits the embedded-newline records into extra rows
    assert naive.count() > len(hostile)
