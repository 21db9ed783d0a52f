"""Classic TPC-H query shapes (Q3/Q6/Q14/Q18), adapted to the driver's
column subset. The reference cannot run these (no joins — SURVEY §2.3);
they are part of the capability superset and exercise the canonical
warehouse plan shapes: selective-filter scan-agg (Q6), 3-table join +
group + top-k (Q3), and broadcast-join ratio aggregate (Q14). All money
math follows the exact-decimal policy (functions/exact.py) so the
oracle hash-matches bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuse_query_spark.functions.exact import dec, one_minus
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import spread_table, table

_DP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DD = "CAST(l_discount AS DECIMAL(12,2))"
_ONE = "CAST(1 AS DECIMAL(3,2))"


@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_DP} * ({_ONE} - {_DD})) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY SUM({_DP} * ({_ONE} - {_DD})) DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def q03_shipping_priority(spark, sf_dir):
    """TPC-H Q3 (o_orderpriority stands in for the absent
    o_shippriority; l_orderkey tie-break makes the top-10 total).
    Plan: both filters push to the scans; customer(filtered) joins
    orders, the result joins lineitem; the final sort is a top-10
    TakeOrderedAndProject over the aggregate, ordered on the EXACT
    decimal revenue so cross-engine ordering is bit-stable."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("_rev_dec"))
        .orderBy(F.col("_rev_dec").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("_rev_dec").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({_DP} * {_DD}) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "filter", "aggregate"),
)
def q06_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: the selective filter-aggregate. All four predicates
    push to the parquet scan; the aggregate is a single partial/final
    pair over the survivors — the shape where columnar pruning +
    pushdown dominate (reads 4 of 16 lineitem columns)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN {_DP} * ({_ONE} - {_DD})
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                * 100.0
                / CAST(SUM({_DP} * ({_ONE} - {_DD})) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
    tags=("tpch", "join", "aggregate"),
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: promo revenue share. part is the dimension side —
    explicitly broadcast (it stays small relative to lineitem at every
    scale factor). Both decimal sums are bit-exact; the final percent
    is one IEEE double expression evaluated identically by both
    engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * one_minus("l_discount")
    zero = F.lit(0).cast("decimal(12,2)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("_promo"),
            F.sum(rev).cast("double").alias("_total"),
        )
        .select(
            (F.col("_promo") * F.lit(100.0) / F.col("_total"))
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )

@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "join", "having", "topk"),
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape (threshold tuned to the driver corpus): orders
    whose total quantity exceeds 150, with the customer name, top-100
    by order price. The HAVING filters on the exact-decimal sum; the
    final ordering key o_totalprice is a raw column (no float
    arithmetic), so cross-engine order is stable with the o_orderkey
    tie-break. Aggregate first on the orders grain, top-k via
    TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer")
    o = spread_table(spark, sf_dir, "orders", "o_orderkey")
    li = spread_table(spark, sf_dir, "lineitem", "l_shipdate")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).alias("_qty_dec"))
        .filter(F.col("_qty_dec") > 150)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("_qty_dec").cast("double").alias("total_qty"),
        )
    )


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpch", "join", "exists", "correlated"),
)
def q04_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: priority counts of one quarter's orders that have
    at least one late-shipped line (the driver corpus lacks
    l_commitdate/l_receiptdate, so "late" = shipped >30 days after the
    order date — the same correlated-EXISTS-with-inequality plan). The
    EXISTS is a LEFT SEMI join on the order key plus a non-equi
    condition referencing BOTH sides — the semi join deduplicates
    multi-line orders before the count, so no DISTINCT pass is needed.
    The quarter filter pushes to the orders scan; count is integer →
    bit-stable."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("tpch", "join", "case_aggregate"),
)
def q12_priority_by_returnflag(spark, sf_dir):
    """TPC-H Q12 shape: CASE-inside-SUM over a fact-fact join
    (l_returnflag stands in for the absent l_shipmode; the year filter
    plays l_receiptdate's role). The CASE branches are evaluated
    JVM-side inside the partial aggregate — the shuffle carries 3
    groups × 2 longs, not rows. The shipdate filter pushes to the
    lineitem scan; only 2 orders columns are read."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({_DP} * ({_ONE} - {_DD})) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("tpch", "join", "multi_join"),
)
def q05_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: the 6-table join with the local-supplier condition
    (c_nationkey = s_nationkey rides on the supplier join). Plan:
    region ('ASIA') and nation broadcast (BROADCAST_TABLES-small at
    any SF); the r_name filter prunes nations BEFORE the big
    customer/orders/lineitem chain, so the fact-side shuffles carry
    only the surviving region's rows; the year filter pushes to the
    orders scan. At 100 TB the only large shuffles are
    orders⋈customer and lineitem⋈(that) on their natural keys —
    uniformly distributed, no skew handling needed."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = dec("l_extendedprice") * one_minus("l_discount")
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(rev).alias("_rev_dec"))
        .orderBy(F.col("_rev_dec").desc(), F.col("n_name"))
        .select("n_name", F.col("_rev_dec").cast("double").alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_DP} * ({_ONE} - {_DD})) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: returned-item revenue per customer, top 20 (the
    driver schema's customer subset — no phone/address/comment).
    Plan: quarter filter pushes to the orders scan, the returnflag
    filter to lineitem; nation broadcasts; the group-by keys include
    the customer attributes so no second join is needed after the
    aggregate; the final sort is a top-20 TakeOrderedAndProject on the
    EXACT decimal revenue (bit-stable cross-engine ordering)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).alias("_rev_dec"))
        .orderBy(F.col("_rev_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev_dec").cast("double").alias("revenue"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "n_name",
        )
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({_DP} * ({_ONE} - {_DD})) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    tags=("tpch", "join", "disjunctive"),
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) predicates across
    BOTH join sides (driver schema subset — no shipmode/shipinstruct/
    container). The single-side conjuncts Catalyst can factor out
    (p_size >= 1, l_quantity bounds 1..30) push below the join; the
    cross-side disjunction evaluates post-join, JVM-side. part joins
    broadcast at test SFs via AQE; at 100 TB part is partition-keyed
    and the equi-join shuffles on p_partkey/l_partkey — the OR adds no
    shuffle."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#12") & sz.between(1, 5) & (q >= 1) & (q <= 11))
        | ((b == "Brand#23") & sz.between(1, 10) & (q >= 10) & (q <= 20))
        | ((b == "Brand#15") & sz.between(1, 15) & (q >= 20) & (q <= 30))
    )
    rev = dec("l_extendedprice") * one_minus("l_discount")
    return j.filter(cond).agg(F.sum(rev).cast("double").alias("revenue"))
