"""Bucketed tables: the co-located-join lever at 100 TB.

The reference scatters blocks by hash for its distributed group-by
(fusequery/query/src/pipelines/transforms — the "scatter" planner);
Spark's durable equivalent is BUCKETED storage: write both fact
tables bucketed by the join key with the same bucket count, and every
subsequent join/aggregate on that key reads co-located buckets with
NO exchange at all — the shuffle is paid once at write time and
amortized over every downstream query.

This module is a thin compatibility facade over the single
implementation in sources/bucketed.py (code-review r8: the two copies
had drifted — divergent defaults, one missing the `how` param — and a
fix to one silently missed the twin). Caveats live with the
implementation; the 32-bucket default here matches the plan-gate
tests' historical call shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fuse_query_spark.sources.bucketed import (
    colocated_join as _colocated_join,
    write_bucketed as _write_bucketed,
)


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 32, sort: bool = True
) -> None:
    _write_bucketed(df, table_name, key, n_buckets=buckets, sort=sort)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    return _colocated_join(spark, left_table, right_table, key, how)
