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


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_parquet_maybe_nanos(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """Parquet read that tolerates legacy TIMESTAMP(NANOS) columns.

    Spark rejects TIMESTAMP(NANOS) parquet columns outright unless
    `spark.sql.legacy.parquet.nanosAsLong` is on (they then surface as
    raw ns longs). We try the plain read first; on the specific NANOS
    AnalysisException we enable the conf and retry — and deliberately
    leave it on for the session, because the flag ONLY changes the
    handling of NANOS columns (which are otherwise unreadable) and
    restoring it would race any still-lazy scan planned under it.
    """
    reader = spark.read
    if merge_schema:
        # footer-only union across files: required after ALTER TABLE
        # ADD COLUMN, where pre-ALTER files lack the new column and
        # single-footer inference could drop it from the files that
        # have it
        reader = reader.option("mergeSchema", "true")
    try:
        return reader.parquet(path)
    except Exception as e:  # AnalysisException, but match on message
        msg = str(e)
        if "NANOS" not in msg and "nanosAsLong" not in msg:
            raise
        spark.conf.set(_NANOS_CONF, "true")
        return reader.parquet(path)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = read_parquet_maybe_nanos(spark, path)
    if name == "events":
        df = _normalize_event_ts(df, "ts")
    return df


def spread_table(spark: SparkSession, sf_dir: str, name: str, key: str) -> DataFrame:
    """`table()` plus scale-adaptive scan spreading (optimization
    guide §2.5: "one huge unsplittable file … repartition immediately
    after the read").

    The test corpus ships ONE single-row-group parquet file per table,
    so a scan yields exactly one task regardless of core count, and
    every expression / Python stage above it runs single-threaded
    until the first exchange — measured as the dominant cost of the
    text/multimodal/TPC-H bench rows at sf0.1 (plans/r12/*_before.txt:
    whole pipelines hang off a 1-split Scan parquet). When the scan
    PLANS fewer splits than the session's parallelism,
    hash-repartition on the high-cardinality `key`; otherwise (the
    100 TB case — thousands of natural splits) return the plain scan,
    so no full-table shuffle is ever added at scale. The gate reads
    the planner's own split count (`df.rdd.getNumPartitions()` — no
    job runs; the plan below is a pure scan+project, so there is no
    AQE stage to trigger), which is correct for single files AND
    directory-shaped tables alike — the r12 file-stat heuristic
    misread a directory of part-files as its ~4 KB inode size and
    would have spread a 100 TB table (r12 verdict finding #1).
    Catalyst pushes column pruning and predicate pushdown through
    RepartitionByExpression, so the scan's ReadSchema/PushedFilters
    are unchanged (plan-gated in tests/test_plans.py)."""
    df = table(spark, sf_dir, name)
    if os.environ.get("FQ_SPREAD_DISABLE"):  # measurement kill-switch
        return df
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key)


def _normalize_event_ts(df: DataFrame, ts_col: str) -> DataFrame:
    """events.parquet has shipped with two physical `ts` encodings:
    TIMESTAMP(MICROS) (current corpus — reads natively as timestamp),
    and TIMESTAMP(NANOS), which arrives as a raw ns long when
    `spark.sql.legacy.parquet.nanosAsLong` is on (the
    read_parquet_maybe_nanos fallback enables it on demand). Normalize
    the long form to a µs timestamp with integer `div` (no double
    round-trip: ns epoch values ~1.7e18 exceed double's 2^53
    exact-integer range) — the same ns→µs truncation DuckDB applies, so
    oracle comparisons agree.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, LongType):
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    elif isinstance(dtype, TimestampNTZType):
        # NTZ→LTZ is only value-preserving when the session tz is UTC;
        # session.tune() pins it best-effort, so verify rather than
        # trust (a rejected pin would silently shift every event ts).
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise RuntimeError(
                f"events ts normalization requires spark.sql.session.timeZone=UTC, got {tz!r}"
            )
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
