"""Parquet table sources for the driver's synthetic star schema.

The reference's table engines (CSV/Parquet/Null/Memory/Remote —
fusequery/query/src/datasources/local/*.rs) map onto Spark readers; the
test corpus (TESTDATA.md) is parquet, read here with projection and
predicate pushdown left to Catalyst (the reference's parquet scan does
column projection at parquet_table.rs:76-78 but no row filters — Spark
exceeds it with PushedFilters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any SF we run.
BROADCAST_TABLES = {"region", "nation"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _read_nanos_ts(spark, path, "ts")
    return spark.read.parquet(path)


def _read_nanos_ts(spark: SparkSession, path: str, ts_col: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects. Read nanos as long and truncate to
    microseconds — the same ns→µs truncation DuckDB applies, so oracle
    comparisons agree. `div` is integer division (no double round-trip:
    ns epoch values ~1.7e18 exceed double's 2^53 exact-integer range).
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))


def load_tables(spark: SparkSession, sf_dir: str, register_views: bool = False) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out
