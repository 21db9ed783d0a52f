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
    df = spark.read.parquet(path)
    if name == "events":
        df = _normalize_event_ts(df, "ts")
    return df


def _normalize_event_ts(df: DataFrame, ts_col: str) -> DataFrame:
    """events.parquet has shipped with two physical `ts` encodings:
    TIMESTAMP(MICROS) (current corpus — reads natively as timestamp),
    and TIMESTAMP(NANOS), which arrives as a raw ns long when
    `spark.sql.legacy.parquet.nanosAsLong` is on. Normalize the long
    form to a µs timestamp with integer `div` (no double round-trip:
    ns epoch values ~1.7e18 exceed double's 2^53 exact-integer range) —
    the same ns→µs truncation DuckDB applies, so oracle comparisons
    agree. No session conf is touched here: reads never mutate state
    another table's read could observe.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, LongType):
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    elif isinstance(dtype, TimestampNTZType):
        # Session tz is pinned to UTC (session.py), so NTZ→LTZ is an
        # identity on the stored µs value; downstream ops (unix_micros,
        # window()) expect the LTZ type the legacy path produced.
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


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
