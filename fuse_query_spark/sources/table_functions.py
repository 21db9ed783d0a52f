"""Table functions — the reference's generator sources.

``numbers(N)`` / ``numbers_mt(N)`` / ``numbers_local(N)`` produce a
single ``number`` column 0..N-1 split into ``max_threads`` partitions
with exact statistics (reference:
fusequery/query/src/datasources/system/numbers_table.rs:28-122,
numbers_stream.rs:25-114). Spark's ``range`` is the same operator —
a parallelized generator with exact row-count statistics, so the
reference's StatisticsExact optimization (optimizer_statistics_exact.rs)
is subsumed by Catalyst's LocalLimit/statistics handling.

``one`` is the 1-row dummy table backing ``SELECT 1``
(datasources/system/one_table.rs:21-88).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fuse_query_spark.session import default_parallelism


def numbers(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """0..n-1 as column ``number`` (reference type UInt64 → LongType;
    values here are < 2^63 so the mapping is lossless — SURVEY §1.2)."""
    parts = partitions or default_parallelism()
    return spark.range(0, n, 1, parts).withColumnRenamed("id", "number")


# ClickHouse-compat aliases: in the reference, numbers/numbers_mt differ
# only in local vs multi-threaded partitioning; Spark ranges are always
# partition-parallel.
numbers_mt = numbers
numbers_local = numbers


def one(spark: SparkSession) -> DataFrame:
    return spark.range(1).selectExpr("CAST(0 AS TINYINT) AS dummy")


TABLE_FUNCTIONS = {
    "numbers": numbers,
    "numbers_mt": numbers_mt,
    "numbers_local": numbers_local,
    "one": one,
}
