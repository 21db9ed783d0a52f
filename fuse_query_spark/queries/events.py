"""Event/time-series operators over the `events` table.

The reference has no event-time processing at all (SURVEY §2.10: its
"streams" are pull-based batch iterators). These queries define the
batch shape of the streaming surface: tumbling windows, sessionization,
and semi-structured extraction — the same transformations
fuse_query_spark.streaming applies over readStream with watermarks.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fuse_query_spark.functions.exact import dec
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import table


@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    tags=("events", "time", "tumbling"),
)
def events_tumbling_hourly(spark, sf_dir):
    """Tumbling 1h window aggregate. Batch form uses date_trunc (flat
    schema, oracle-comparable); the streaming form is
    `F.window(ts, '1 hour')` with a watermark — see streaming/."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, event_id,
               -- DuckDB windowed SUM(INTEGER) yields HUGEINT, which the
               -- driver's fetchdf() renders as float64 ("5.0" vs Spark's
               -- bigint "5") — same mechanism as the q12 top-level SUM.
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS session_end_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("events", "session", "window"),
)
def events_sessionize(spark, sf_dir):
    """Sessionization (30-min inactivity gap) via lag + cumulative sum —
    the classic batch formulation; in streaming this is
    `session_window(ts, '30 minutes')`. All-integer µs arithmetic →
    deterministic. Session bounds are emitted as BIGINT epoch-µs on
    BOTH sides (Spark unix_micros, oracle epoch_us — both all-integer
    truncation, never a double round-trip: epoch-ns values ~1.7e18
    exceed double's 2^53 exact range, which is exactly how the
    r01/r02 hash mismatches happened through raw-timestamp and
    floor(epoch_ns/1000) oracles)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0).alias("new_session"),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("session_id", F.sum("new_session").over(wrun))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
    )


@register(
    "events_json_extract",
    oracle="""
    SELECT CAST(regexp_extract(props, '[0-9]+') AS INTEGER) % 10 AS k_mod,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS uniq_users
    FROM events
    GROUP BY k_mod
    """,
    tags=("events", "json", "semi_structured"),
)
def events_json_extract(spark, sf_dir):
    """Semi-structured extraction: props is a JSON string column;
    get_json_object pulls $.k JVM-side (no UDF). The oracle reaches the
    same value via regexp — engines may differ in HOW, results match."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy((k % 10).alias("k_mod")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("uniq_users"),
    )


@register(
    "events_rate_per_day",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n,
           COUNT(*) / 24.0 AS per_hour
    FROM events
    GROUP BY day, event_type
    """,
    tags=("events", "time"),
)
def events_rate_per_day(spark, sf_dir):
    """Daily rollup with a derived rate — integer count / literal →
    identical double on both engines."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) / 24.0).alias("per_hour"),
    )

@register(
    "events_hopping_15m",
    oracle="""
    WITH h AS (
      SELECT e.*, time_bucket(INTERVAL '15 minutes', ts)
                  - (k * INTERVAL '15 minutes') AS win_start
      FROM events e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) ks
    )
    SELECT win_start, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM h GROUP BY win_start, event_type
    """,
    tags=("events", "time", "hopping"),
)
def events_hopping_15m(spark, sf_dir):
    """Hopping (sliding) window: 1h windows every 15min — each event
    lands in exactly 4 overlapping windows. Spark's window() generator
    expands rows BEFORE the partial aggregate, so the shuffle carries
    (#windows × #types × #partitions) rows, not 4× the corpus — the
    same Expand-then-combine shape as grouping sets. Streaming form is
    identical plus a watermark (see streaming/)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


@register(
    "events_funnel_attribution",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           COUNT(*) AS n_clicks_30m,
           CAST(MAX(epoch_us(c.ts)) AS BIGINT) AS last_click_us
    FROM p JOIN c ON c.user_id = p.user_id
                 AND c.ts <= p.ts
                 AND c.ts > p.ts - INTERVAL 30 MINUTE
    GROUP BY p.event_id, p.user_id
    """,
    tags=("events", "join", "interval", "funnel"),
)
def events_funnel_attribution(spark, sf_dir):
    """Funnel attribution: per purchase, the count of the same user's
    clicks in the preceding 30 minutes and the last such click's
    time (BIGINT epoch-µs — raw event timestamps never cross the
    oracle boundary). The batch twin of
    streaming/events.funnel_join_stream: an equi-join on user_id plus
    an event-time interval predicate — Spark plans the equi-key
    shuffle join and applies the range as a post-join filter; state
    in the streaming form is the same pairs bounded by
    watermark+lookback."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") > F.col("p_ts") - F.expr("interval 30 minutes")),
        )
        .groupBy("purchase_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks_30m"),
            (F.unix_micros(F.max("c_ts"))).alias("last_click_us"),
        )
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week,
           CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM firsts JOIN active USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("events", "cohort", "retention"),
)
def events_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-seen week,
    counted in each later active week — the canonical product-
    analytics shape. Both week truncations are Monday-based on both
    engines; the offset divides an exact multiple of 7 days, so
    everything is integer-exact. Plan: one aggregate for first-seen,
    one distinct for activity, an equi-join on user_id (uniform key),
    and a tiny final group-by — the join is the only real shuffle and
    AQE sizes it; at 100 TB firsts is #users rows, far below the
    activity fact."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    active = e.select("user_id", F.date_trunc("week", "ts").alias("week")).distinct()
    return (
        firsts.join(active, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (F.datediff(F.col("week").cast("date"), F.col("cohort_week").cast("date")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "events_value_histogram",
    oracle="""
    SELECT event_type,
           CASE WHEN value < 0 THEN 0
                WHEN value >= 100 THEN 21
                ELSE CAST(floor(value / 5.0) AS INT) + 1 END AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type, bucket
    """,
    tags=("events", "histogram", "aggregate"),
)
def events_value_histogram(spark, sf_dir):
    """Equi-width histogram of event values per type (20 buckets of
    width 5 over [0, 100); bucket 0 = underflow, 21 = overflow — the
    width_bucket convention spelled out as explicit floor arithmetic
    because the same expression must run on both engines, and /5.0 +
    floor on doubles is bit-identical). The OLAP histogram shape: one
    partial/final aggregate over (type, bucket) — at most
    #types x 22 groups regardless of corpus size."""
    e = table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 0, 0)
        .when(F.col("value") >= 100, 21)
        .otherwise(F.floor(F.col("value") / 5.0).cast("int") + 1)
    )
    return (
        e.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )


@register(
    "events_uniq_sketch_rollup",
    oracle="""
    SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_uniq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(1 AS INT) AS uniq_ok
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("events", "sketch", "hll", "approximate", "rollup", "bounded"),
)
def events_uniq_sketch_rollup(spark, sf_dir):
    """Mergeable HLL rollup (r5) in bounded-contract form (r7): per-day
    user sketches merged to weekly distinct estimates — the 100 TB
    pattern where the rollup table (one ~4 KB sketch per day) answers
    any range-distinct query without rescanning raw events. See
    operators/sketches.py.

    HLL estimates are sketch-implementation-specific (DuckDB's
    approx_count_distinct uses a different sketch), so the estimate
    itself can never hash-match a foreign engine — but its CONTRACT
    can: emit the EXACT weekly distinct count and event count
    (value-hashed against DuckDB, proving the same scan really ran)
    plus one flag per week asserting the merged-sketch estimate landed
    within 5% of exact (lgConfigK=12 gives ~1.6% rse — wide headroom).
    The oracle's constant-1 flags only match if every week's sketch
    holds its bound, so a sketch or merge regression flips the hash —
    the agg_approx_bounded device (r6), applied here to end the
    rows-only exemption this query carried since r5. Raw estimates
    stay available via operators/sketches.py directly."""
    from fuse_query_spark.operators.sketches import (
        daily_uniq_sketches,
        rollup_uniq_estimate,
    )

    ev = table(spark, sf_dir, "events")
    sk = rollup_uniq_estimate(daily_uniq_sketches(ev), "week").withColumnRenamed(
        "bucket", "week"
    )
    exact = ev.groupBy(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week")
    ).agg(F.countDistinct("user_id").alias("exact_uniq"))
    return (
        exact.join(sk, "week")
        .select(
            "week",
            F.col("exact_uniq").cast("long").alias("exact_uniq"),
            F.col("n_events").cast("long").alias("n_events"),
            (
                F.abs(F.col("uniq_estimate") - F.col("exact_uniq"))
                <= 0.05 * F.col("exact_uniq")
            ).cast("int").alias("uniq_ok"),
        )
        .orderBy("week")
    )


@register(
    "events_heavy_hitters_rollup",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), weekly AS (
        SELECT CAST(date_trunc('week', day) AS DATE) AS week, event_type,
               CAST(SUM(cnt) AS BIGINT) AS n
        FROM daily GROUP BY 1, 2
    ), ranked AS (
        SELECT week, event_type, n,
               row_number() OVER (PARTITION BY week ORDER BY n DESC, event_type) AS rk
        FROM weekly
    )
    SELECT week, event_type, n, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= 3
    """,
    tags=("events", "rollup", "topk", "heavy-hitters"),
)
def events_heavy_hitters_rollup(spark, sf_dir):
    """Mergeable heavy-hitters rollup (r5, late): per-(day, event_type)
    partial counts — the rollup table a 100 TB pipeline materializes
    once per ingest — then weekly top-3 event types answered from the
    ROLLUP ONLY (second aggregate sums day partials; raw events are
    never rescanned). Counts are exactly mergeable (unlike quantiles),
    so the two-level aggregate is lossless; both aggregations partial-
    agg map-side, and the final window ranks |weeks| x |types| rows —
    thousands, not billions. Exact twin of the reference's group-by
    pipeline (aggregator_common.rs) applied to the rollup pattern."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    weekly = daily.groupBy(
        F.date_trunc("week", F.col("day")).cast("date").alias("week"),
        "event_type",
    ).agg(F.sum("cnt").alias("n"))
    w = Window.partitionBy("week").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        weekly.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("week", "event_type", "n", "rk")
    )


@register(
    "events_topk_sketch_rollup",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), weekly AS (
        SELECT CAST(date_trunc('week', day) AS DATE) AS week, event_type,
               CAST(SUM(cnt) AS BIGINT) AS n
        FROM daily GROUP BY 1, 2
    ), ranked AS (
        SELECT week, event_type, n,
               row_number() OVER (PARTITION BY week ORDER BY n DESC, event_type) AS rk
        FROM weekly
    )
    SELECT week, event_type, n, CAST(rk AS INT) AS rk, CAST(1 AS INT) AS topk_ok
    FROM ranked WHERE rk <= 3 ORDER BY week, rk
    """,
    tags=("events", "sketch", "topk", "heavy-hitters", "rollup", "bounded"),
)
def events_topk_sketch_rollup(spark, sf_dir):
    """Mergeable frequent-items rollup (r5, late) in bounded-contract
    form (r7): per-day approx_top_k sketches (Spark 4 native
    DataSketches) merged to weekly top-3 — the bounded-state twin of
    events_heavy_hitters_rollup for key cardinalities where even the
    (day, key) exact rollup is too wide. State per day is fixed by
    max_items_tracked, never by distinct keys. See operators/sketches.py.

    The sketch binary layout is implementation-specific, so the sketch
    itself can't hash-match DuckDB — its CONTRACT can: emit the EXACT
    weekly top-3 (value-hashed against the oracle's rollup) plus one
    flag per week asserting the merged sketch's top-3 count multiset
    equals the exact one (multiset, not item list, so legitimate ties
    can't flip it; in this cardinality regime — distinct keys ≪
    max_items_tracked — DataSketches frequent-items counts are exact,
    so the bound is equality). A sketch/merge regression zeroes the
    flag and flips the hash — the agg_approx_bounded device (r6),
    ending this query's rows-only exemption."""
    from fuse_query_spark.operators.sketches import (
        daily_topk_sketches,
        rollup_topk_estimate,
    )

    ev = table(spark, sf_dir, "events")
    sk = rollup_topk_estimate(daily_topk_sketches(ev), k=3, grain="week")
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    weekly = daily.groupBy(
        F.date_trunc("week", F.col("day")).cast("date").alias("week"),
        "event_type",
    ).agg(F.sum("cnt").alias("n"))
    w = Window.partitionBy("week").orderBy(F.desc("n"), F.asc("event_type"))
    top3 = weekly.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    ex_sig = top3.groupBy("week").agg(
        F.sort_array(F.collect_list("n"), asc=False).alias("_e")
    )
    sk_sig = sk.groupBy(F.col("bucket").alias("week")).agg(
        F.sort_array(F.collect_list("cnt"), asc=False).alias("_s")
    )
    flags = ex_sig.join(sk_sig, "week", "left").select(
        "week",
        F.coalesce((F.col("_e") == F.col("_s")).cast("int"), F.lit(0)).alias(
            "topk_ok"
        ),
    )
    return (
        top3.join(flags, "week")
        .select("week", "event_type", "n", F.col("rk").cast("int").alias("rk"), "topk_ok")
        .orderBy("week", "rk")
    )
