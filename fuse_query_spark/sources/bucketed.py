"""Bucketed tables — co-located joins without exchanges.

The reference shuffles every distributed group-by/join through its
Flight scatter (api/rpc/flight_scatter_hash.rs). Spark's bucketing
removes that shuffle entirely for recurring join keys: both sides are
written pre-hashed into the same bucket layout, and the join planner
skips the exchange (tests/test_bucketed.py asserts zero Exchange nodes
in the plan).

At 100 TB this is the difference between re-shuffling the fact table
on every query and shuffling once at write time — the standard layout
for a fact co-located with its busiest join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and by default sort-within-bucket)
    managed table (parquet under spark-warehouse). Bucket count is a
    layout contract: both join sides must match it; sorting within
    buckets upgrades downstream sort-merge joins to zero-sort
    merges."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables — planner elides both
    exchanges (and both sorts, since buckets are sorted)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
