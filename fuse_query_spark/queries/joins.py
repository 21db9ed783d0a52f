"""Joins — capability extension beyond the reference.

The reference rejects multi-table FROM ("Cannot support JOIN clause",
plan_parser.rs:613-619) and marks joins WIP (README.md:102). Since the
north star is capabilities-on-Spark, the full join surface is declared
here: inner/left/semi/anti + broadcast strategy, plus the reference's
actual subquery constructs (scalar subquery, uncorrelated EXISTS —
plan_parser.rs:848-852,966-982) re-expressed natively.

Scale notes (100 TB): dimension sides (nation 25 rows, customer ~15M
at SF100k) are broadcast where they fit; fact-fact joins shuffle on the
join key, which Catalyst plans as sort-merge with AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fuse_query_spark.functions.exact import dec
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import table

_DTP = "CAST(o_totalprice AS DECIMAL(12,2))"


@register(
    "join_revenue_by_nation",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_DTP}) AS DOUBLE) AS revenue,
           COUNT(*)                    AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("join", "broadcast", "aggregate"),
)
def join_revenue_by_nation(spark, sf_dir):
    """Fact ⋈ dim ⋈ dim with explicit broadcast of both dimension
    tables — at 100 TB the orders fact never shuffles for this plan
    (BroadcastHashJoin both times, agg partials map-side)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "join_fact_fact",
    oracle=f"""
    SELECT l.l_returnflag, o.o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag, o.o_orderstatus
    """,
    tags=("join", "shuffle", "aggregate"),
)
def join_fact_fact(spark, sf_dir):
    """lineitem ⋈ orders on the orderkey — the canonical fact-fact
    shuffle join. The o_orderpriority filter is pushed below the join
    (and to the parquet scan) by Catalyst, shrinking the shuffled side;
    AQE may convert to broadcast at runtime if the filtered side fits."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_big_orders
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
           ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join", "outer", "aggregate"),
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER join preserving customers with zero matches —
    count(o_orderkey) counts only non-null matches (0 for no-order
    customers), exercising null semantics through the agg."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


@register(
    "join_semi_exists",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
    tags=("join", "semi", "exists"),
)
def join_semi_exists(spark, sf_dir):
    """EXISTS(subquery) — the reference materializes uncorrelated
    EXISTS as a constant (scalars/udfs/exists.rs:28-77); Spark's
    LEFT SEMI join is the native, correlated-capable superset."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_nationkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
    tags=("join", "anti"),
)
def join_anti(spark, sf_dir):
    """NOT EXISTS → LEFT ANTI join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_nationkey")


@register(
    "scalar_subquery",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM orders)
    GROUP BY o_orderstatus
    """,
    tags=("subquery", "scalar"),
)
def scalar_subquery(spark, sf_dir):
    """Scalar subquery (plan_parser.rs:975-982: executed once by
    CreateSetsTransform, attached as a constant). Here: compute the
    scalar as a 1-row DataFrame and broadcast-cross-join it — the same
    execute-once-then-constant strategy, cluster-side. The threshold
    uses exact-decimal avg so both engines compare against the
    bit-identical double."""
    o = table(spark, sf_dir, "orders")
    thr = o.agg((F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"))
    return (
        o.join(F.broadcast(thr))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


@register(
    "join_asof",
    oracle="""
    WITH clicks AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    errs AS (SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'error') t WHERE rn = 1)
    SELECT c.user_id, c.event_id, e.ts AS err_ts, e.value AS err_value
    FROM clicks c ASOF LEFT JOIN errs e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
    tags=("join", "asof", "custom_operator"),
)
def join_asof(spark, sf_dir):
    """AS-OF join — for each click, the most recent prior error of the
    same user. Spark lacks this natively; operators/joins.asof_join
    implements the union+window formulation (one shuffle, no row
    explosion — see module docstring). Oracle: DuckDB's native ASOF
    LEFT JOIN."""
    from fuse_query_spark.operators.joins import asof_join
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    errs = (
        e.filter(F.col("event_type") == "error")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    out = asof_join(clicks, errs, on="user_id", left_ts="ts", right_ts="ts", right_cols=["value"])
    return out.select(
        "user_id",
        "event_id",
        F.col("ts_right").alias("err_ts"),
        F.col("value").alias("err_value"),
    )


@register(
    "join_range_bucketed",
    oracle="""
    SELECT l.event_id AS click_id, r.event_id AS err_id
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'click' AND r.event_type = 'error'
     AND r.ts <= l.ts
     AND epoch_us(l.ts) - epoch_us(r.ts) <= 7200000000
    """,
    tags=("join", "range", "custom_operator"),
)
def join_range_bucketed(spark, sf_dir):
    """Range join (pairs within a 2-hour lookback window) via bucket
    equi-join + filter — operators/joins.range_join_bucketed. The
    oracle is the naive inequality join, which DuckDB can afford at
    sf0.01; at 100 TB only the bucketed form survives."""
    from fuse_query_spark.operators.joins import range_join_bucketed

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    errs = e.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("r_ts")
    )
    j = range_join_bucketed(clicks, errs, on="user_id", left_ts="ts", right_ts="r_ts", max_gap_seconds=7200)
    return j.select("click_id", "err_id")


@register(
    "derived_table",
    oracle="""
    SELECT seg, COUNT(*) AS n_cust, CAST(MAX(total_bal) AS DOUBLE) AS max_bal
    FROM (
        SELECT c_mktsegment AS seg, c_nationkey,
               SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS total_bal
        FROM customer
        GROUP BY c_mktsegment, c_nationkey
    ) t
    GROUP BY seg
    """,
    tags=("subquery", "derived"),
)
def derived_table(spark, sf_dir):
    """Derived table in FROM (TableFactor::Derived, plan_parser.rs:710)
    → DataFrame chaining: an aggregate over an aggregate."""
    c = table(spark, sf_dir, "customer")
    inner = (
        c.groupBy(F.col("c_mktsegment").alias("seg"), "c_nationkey")
        .agg(F.sum(dec("c_acctbal")).alias("total_bal"))
    )
    return inner.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.max("total_bal").cast("double").alias("max_bal"),
    )


@register(
    "correlated_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders o
    WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
    tags=("join", "subquery", "correlated"),
)
def correlated_scalar_subquery(spark, sf_dir):
    """CORRELATED scalar subquery (each order compared against its own
    customer's max) — the uncorrelated form is `scalar_subquery`; this
    exercises Catalyst's decorrelation: the rewrite plans as one
    aggregate on o_custkey joined back to orders, NOT a per-row
    re-execution (the reference supports only uncorrelated subqueries,
    plan_parser.rs:848-852 — capability superset). The comparison runs
    on the exact source type; only the OUTPUT is cast to DOUBLE per the
    repo's driver-boundary policy (queries/core.py:8-9 — Decimal cells
    stringify differently in Spark vs the oracle's canon)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("corr_orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS price
        FROM corr_orders_v o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM corr_orders_v o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "correlated_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice < 1000)
    """,
    tags=("join", "subquery", "correlated", "exists"),
)
def correlated_exists(spark, sf_dir):
    """CORRELATED EXISTS + NOT EXISTS in one predicate — Catalyst
    decorrelates to a left-semi join chained with a left-anti join on
    o_custkey (verified in test_plans), never a per-row subquery. The
    reference supports only UNCORRELATED EXISTS
    (plan_parser.rs:966-982) — capability superset."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("corr_cust_v")
    table(spark, sf_dir, "orders").createOrReplaceTempView("corr_ord_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM corr_cust_v c
        WHERE EXISTS (SELECT 1 FROM corr_ord_v o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM corr_ord_v o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice < 1000)
        """
    )
