from fuse_query_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    has_take_ordered,
    scan_columns,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "has_pushed_filters",
    "has_take_ordered",
    "scan_columns",
]
