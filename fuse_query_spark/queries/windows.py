"""Window functions — capability extension (reference: "Window (TODO)",
README.md:115). Needed anyway for LIMIT BY; declared as first-class
surface here: row_number/rank/dense_rank/ntile, lag/lead, running and
sliding frames.

Scale notes: every window below partitions by a high-cardinality key
(user_id, o_orderpriority×…) so state per partition is bounded; no
global (unpartitioned) windows — those serialize to one task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fuse_query_spark.functions.exact import dec
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import table


@register(
    "window_running_total",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*)  OVER w AS run_cnt,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS run_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "running"),
)
def window_running_total(spark, sf_dir):
    """Cumulative count/sum per user ordered by event time — exact
    decimal running sum so every prefix matches the oracle bit-exactly."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("run_cnt"),
        F.sum(dec("value")).over(w).cast("double").alias("run_sum"),
    )


@register(
    "window_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY rn <= 200
    """,
    tags=("window", "rank"),
)
def window_rank(spark, sf_dir):
    """Ranking family over a deterministic (tie-broken) ordering.
    NOTE: ntile is computed over the full partition BEFORE the rn
    filter, matching QUALIFY semantics."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 200)
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(event_type)  OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           CAST(CAST(value AS DECIMAL(12,2)) -
                LAG(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS value_delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "lag_lead"),
)
def window_lag_lead(spark, sf_dir):
    """lag/lead with null boundaries; the delta is computed in decimal
    so it is exact."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = dec("value")
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (v - F.lag(v).over(w)).cast("double").alias("value_delta"),
    )


@register(
    "window_sliding_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_4,
           MIN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS min_4
    FROM events
    """,
    tags=("window", "frame"),
)
def window_sliding_frame(spark, sf_dir):
    """Bounded ROWS frame (sliding 4-row window per user)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("sum_4"),
        F.min("value").over(w).alias("min_4"),
    )


@register(
    "window_range_interval",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS cnt_1h,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "range", "time"),
)
def window_range_interval(spark, sf_dir):
    """Event-time RANGE frame: per user, aggregates over the trailing
    hour of *event time* (value-based bounds, peers included), not a
    row count — ordering on epoch microseconds so the 1-hour bound is
    the exact integer 3.6e9 µs in both engines. The time-decayed
    feature-window shape (rolling 1h activity per user) a training
    pipeline computes per event."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("cnt_1h"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_1h"),
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, n_nationkey AS nation,
           ntile(4)      OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "distribution"),
)
def window_distribution(spark, sf_dir):
    """Distribution window functions (ntile/percent_rank/cume_dist)
    per nation over customer balance. Rank-based, so results are exact
    integers and exact rational doubles ((rank-1)/(n-1), k/n) —
    hash-identical across engines; the c_custkey tiebreak makes the
    ordering total. One shuffle on the partition key, same as any
    window; at 100 TB per-nation partitions are the skew concern and
    would take the salted two-pass variant (SCALE.md windows)."""
    from pyspark.sql.window import Window as W

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    w = W.partitionBy("n_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            F.col("n_nationkey").alias("nation"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           COALESCE(nth_value(o_orderkey, 2) OVER w, -1) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "navigation"),
)
def window_first_last_nth(spark, sf_dir):
    """Navigation window functions (first_value/last_value/nth_value)
    over each customer's order history, with the full-partition frame
    spelled out — last_value over the DEFAULT frame (up to current
    row) is the classic silent-wrong-answer; the explicit unbounded
    frame makes both engines see the whole partition. The
    (o_orderdate, o_orderkey) ordering is total, so every value is
    deterministic. One shuffle on o_custkey like any window."""
    from pyspark.sql.window import Window as W

    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        # single-order customers have no 2nd order: NULL would turn
        # the whole oracle column float64 through pandas — pin to -1
        F.coalesce(F.nth_value("o_orderkey", 2).over(w), F.lit(-1)).alias("second_order"),
    )
