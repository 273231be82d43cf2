"""Reference-parity facade (cellbase_spark/api.py) + partitioned layout.

The facade must feel like the reference (workbook -> table -> get/where/
rows) while executing as pushed-down lazy scans; the partitioned-write
test pins the 100 TB layout story: a date-partitioned table prunes
partitions at the scan, so a one-day query never touches the other days.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cellbase_spark.api import CellBase
from cellbase_spark.io import load_table, write_parquet_table


def test_point_lookup_roundtrip(spark, sf_dir):
    cb = CellBase(spark, sf_dir)
    row = cb.table("customer").get(1)
    assert row is not None and row["c_custkey"] == 1
    assert cb.table("customer").get(10**12) is None


def test_where_select_stay_lazy_and_compose(spark, sf_dir):
    cb = CellBase(spark, sf_dir)
    t = cb.table("customer").where(F.col("c_acctbal") > 0).select("c_custkey", "c_acctbal")
    assert t.df.columns == ["c_custkey", "c_acctbal"]  # no action has run
    assert all(r["c_acctbal"] > 0 for r in t.rows())


def test_unknown_table_rejected(spark, sf_dir):
    cb = CellBase(spark, sf_dir)
    try:
        cb.table("nope")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_partitioned_write_prunes_at_scan(spark, sf_dir, tmp_path):
    """events partitioned by event date: a single-day filter must reach
    the scan as a PartitionFilter (only that day's files are listed/read)."""
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    write_parquet_table(ev, out, partition_by=["event_date"])

    back = spark.read.parquet(out)
    one_day = back.select(F.min(F.to_date("ts")).cast("string")).first()[0]
    q = back.where(F.col("event_date") == one_day)
    jqe = q._jdf.queryExecution()
    plan = jqe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "event_date" in plan.split("PartitionFilters")[1].split("\n")[0]
    total = back.count()
    pruned = q.count()
    assert 0 < pruned < total


def test_sql_entry_point(spark, sf_dir):
    cb = CellBase(spark, sf_dir)
    rows = cb.sql(
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment"
    ).collect()
    assert sum(r["n"] for r in rows) == cb.table("customer").count()
