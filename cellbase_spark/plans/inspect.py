"""Physical-plan inspection utilities.

The engine implements no planner of its own (SURVEY.md §4: Catalyst does
all rewrites); what it owns is *verifying* that the plans Catalyst
produces have the properties the 100 TB design depends on. These helpers
surface the formatted physical plan for assertions (tests/test_plans.py)
and ad-hoc inspection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def formatted_plan(df: DataFrame) -> str:
    """The `.explain("formatted")` text, returned instead of printed."""
    spark = df.sparkSession
    jqe = df._jdf.queryExecution()
    return jqe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema lines of every scan — what actually gets read."""
    return [ln.strip() for ln in formatted_plan(df).splitlines() if "ReadSchema" in ln]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lines of every scan."""
    return [ln.strip() for ln in formatted_plan(df).splitlines() if "PushedFilters" in ln]


def join_nodes(df: DataFrame) -> list[str]:
    """Physical join operator names appearing in the plan (in order)."""
    names = (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    )
    plan = formatted_plan(df)
    return [n for n in names if n in plan]


def assert_no_cartesian(df: DataFrame) -> None:
    joins = join_nodes(df)
    bad = {"BroadcastNestedLoopJoin", "CartesianProduct"} & set(joins)
    if bad:
        raise AssertionError(f"plan contains quadratic join(s): {sorted(bad)}")
