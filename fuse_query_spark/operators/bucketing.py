"""Bucketed tables: the co-located-join lever at 100 TB.

The reference scatters blocks by hash for its distributed group-by
(fusequery/query/src/pipelines/transforms — the "scatter" planner);
Spark's durable equivalent is BUCKETED storage: write both fact
tables bucketed by the join key with the same bucket count, and every
subsequent join/aggregate on that key reads co-located buckets with
NO exchange at all — the shuffle is paid once at write time and
amortized over every downstream query. This is the single biggest
lever for a recurring fact-fact join (orders ⋈ lineitem at 100 TB:
the daily pipeline joins them dozens of times; bucketing removes the
dominant shuffle from all of them).

Caveats encoded here:
- both sides must agree on bucket count (or be integer multiples with
  spark.sql.bucketing.coalesceBucketsInJoin.enabled);
- bucket pruning applies to equality filters on the bucket key;
- writes must go through saveAsTable (bucket metadata lives in the
  catalog, not the parquet files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 32, sort: bool = True
) -> None:
    """Persist df as a bucketed (and optionally sort-within-bucket)
    catalog table. Sorting within buckets upgrades downstream
    sort-merge joins to zero-sort merges."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    plans with ZERO Exchange (verified in tests/test_plans.py): each
    task reads bucket i of both sides. At 1000 executors this is the
    difference between a full 2-sided 100 TB shuffle and none."""
    return spark.table(left_table).join(spark.table(right_table), key)
