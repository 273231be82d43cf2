"""Plan inspection (the engine owns no planner — Catalyst does; see
SURVEY.md §4). Exposes helpers to assert plan properties."""

from cellbase_spark.plans.inspect import (  # noqa: F401
    assert_no_cartesian,
    formatted_plan,
    join_nodes,
    pushed_filters,
    scan_read_schemas,
)
