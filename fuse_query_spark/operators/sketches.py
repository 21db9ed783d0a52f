"""Mergeable-sketch rollup operators (HLL) — the 100 TB pattern for
distinct counting: pre-aggregate each partition/day into a fixed-size
sketch ONCE, then answer any coarser-grained distinct query by merging
sketches instead of rescanning raw data. Spark 4 ships Apache
DataSketches HLL natively (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate), so the whole pattern is JVM-side codegen'd
aggregation — no UDFs, no driver state, sketches are just binary
columns in a rollup table.

The reference's `uniq` is EXACT (SURVEY §2.4 hard-part 2 —
aggregator_common.rs HashSet) and is mapped to countDistinct in
queries/core.py; this module is the capability extension for the
scale where exact distinct stops being answerable per-query.

Accuracy: lgConfigK=12 (default) gives ~1.6% relative standard error;
tests assert <5% against exact counts and merge-consistency (merging
daily sketches equals sketching the whole range directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_uniq_sketches(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lgk: int = 12,
) -> DataFrame:
    """The rollup-table build: one HLL sketch of `key_col` per day.
    ONE map-side-combinable hash aggregate over the raw events; output
    is ~2^lgk bytes per day regardless of input size — this is the
    table you persist and incrementally append to."""
    return (
        events.groupBy(F.to_date(ts_col).alias("day"))
        .agg(
            F.hll_sketch_agg(key_col, F.lit(lgk)).alias("sketch"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def rollup_uniq_estimate(
    sketches: DataFrame,
    grain: str = "week",
    allow_different_lgk: bool = False,
) -> DataFrame:
    """Answer a coarser-grained distinct-count query from the rollup
    table alone: merge the per-day sketches with hll_union_agg, then
    estimate. Input is |days| rows — the raw 100 TB is never touched.

    allow_different_lgk: a long-lived rollup table appended across
    config changes can hold MIXED lgConfigK sketches; Spark's union
    rejects that by default (the estimate degrades to the smaller k).
    Pass True to union anyway — without this escape hatch a mixed
    table is unqueryable (code-review r8)."""
    bucket = F.date_trunc(grain, F.col("day")).cast("date").alias("bucket")
    union = F.hll_union_agg("sketch", F.lit(allow_different_lgk))
    return (
        sketches.groupBy(bucket)
        .agg(
            F.hll_sketch_estimate(union).alias("uniq_estimate"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("bucket")
    )


def global_uniq_estimate(
    sketches: DataFrame, allow_different_lgk: bool = False
) -> DataFrame:
    """All-time distinct estimate from the rollup table (1 output row).
    allow_different_lgk: see rollup_uniq_estimate."""
    union = F.hll_union_agg("sketch", F.lit(allow_different_lgk))
    return sketches.agg(
        F.hll_sketch_estimate(union).alias("uniq_estimate"),
        F.sum("n_events").alias("n_events"),
    )


# --- Frequent-items (heavy hitters) sketches (r5, late) ------------------


def daily_topk_sketches(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    max_items_tracked: int = 10_000,
) -> DataFrame:
    """Mergeable heavy-hitters rollup build: one approx_top_k sketch
    (Spark 4 native, DataSketches frequent-items) of `key_col` per
    day. Same shape as daily_uniq_sketches — one map-side-combinable
    aggregate, fixed-size binary state per day — but answering "top
    keys by count" instead of "distinct keys". The EXACT twin
    (events_heavy_hitters_rollup) keys the rollup on (day, key) and is
    lossless; this sketch form is for key cardinalities where even the
    (day, key) rollup is too wide to store — state is bounded by
    max_items_tracked regardless of distinct keys."""
    # backtick-quote the column: the HLL twin goes through the typed
    # API, this one through the SQL parser — a bare "event-type" or
    # "user id" would parse as arithmetic (code-review r8)
    return events.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.expr(
            f"approx_top_k_accumulate(`{key_col}`, {max_items_tracked})"
        ).alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )


def rollup_topk_estimate(
    sketches: DataFrame,
    k: int = 3,
    grain: str = "week",
) -> DataFrame:
    """Top-k per coarser grain from the rollup alone: combine the
    per-day sketches, estimate, explode to (bucket, item, count) rows.
    Input is |days| rows; raw events are never rescanned."""
    bucket = F.date_trunc(grain, F.col("day")).cast("date").alias("bucket")
    combined = sketches.groupBy(bucket).agg(
        F.expr("approx_top_k_combine(sketch)").alias("csk"),
        F.sum("n_events").alias("n_events"),
    )
    return (
        combined.select(
            "bucket",
            "n_events",
            F.explode(F.expr(f"approx_top_k_estimate(csk, {k})")).alias("e"),
        )
        .select(
            "bucket",
            F.col("e.item").alias("item"),
            F.col("e.count").alias("cnt"),
            "n_events",
        )
        .orderBy("bucket", F.desc("cnt"), "item")
    )
