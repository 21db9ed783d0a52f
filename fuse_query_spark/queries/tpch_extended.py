"""TPC-H queries 7/8/13/15/17/21/22, adapted to the driver corpus's
column subset (no partsupp table, no l_commitdate/l_receiptdate, no
c_phone — adaptations noted per query; nation names in the corpus are
NATION_0..NATION_24). Together with tpch.py this covers every TPC-H
query expressible over the available tables. The reference engine
cannot run any of these (no joins — SURVEY §2.3); they are part of the
capability superset and exercise the decorrelation / multi-role-join /
anti-join plan shapes a warehouse engine must handle at 100 TB.

All money math uses the exact-decimal policy (functions/exact.py);
threshold comparisons against an average are algebraically rewritten
to integer-exact decimal forms (qty < 0.2*avg  ⟺  5*qty*cnt < sum) so
no float rounding can flip a borderline row on one engine only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fuse_query_spark.functions.exact import dec, one_minus
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import table

_DP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DD = "CAST(l_discount AS DECIMAL(12,2))"
_ONE = "CAST(1 AS DECIMAL(3,2))"


@register(
    "q07_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
               {_DP} * ({_ONE} - {_DD}) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "multi_join"),
)
def q07_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume between two nations by year
    (nation pair adapted to the corpus's NATION_* names). The nation
    table joins in TWO roles — supplier side and customer side — so
    it is aliased twice with disjoint column names. Plan: both nation
    roles broadcast (25 rows at any SF); the pair predicate prunes to
    two nations per side BEFORE the fact joins, so the
    supplier⋈lineitem⋈orders⋈customer chain carries only matching
    rows; the year filter pushes to the lineitem scan. The only large
    shuffles are the fact joins on their natural keys."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("_s_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_3", "NATION_7"))
    n2 = n.select(
        F.col("n_nationkey").alias("_c_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_3", "NATION_7"))
    vol = dec("l_extendedprice") * one_minus("l_discount")
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(vol).alias("_rev_dec"))
        .orderBy("supp_nation", "cust_nation", "l_year")
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.col("_rev_dec").cast("double").alias("revenue"),
        )
    )


@register(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               {_DP} * ({_ONE} - {_DD}) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("tpch", "join", "multi_join"),
)
def q08_market_share(spark, sf_dir):
    """TPC-H Q8: national market share within a region — the 8-table
    join (nation again in two roles: customer's region membership and
    supplier's nationality). Plan: part(ECONOMY), both nation roles,
    and region all broadcast; region prunes customer nations before
    the fact chain. The share division happens once per year group on
    exact decimal sums cast to double — bit-stable on both engines."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("_c_nkey"), F.col("n_regionkey").alias("_c_rkey"))
    n2 = n.select(F.col("n_nationkey").alias("_s_nkey"), F.col("n_name").alias("nation"))
    vol = dec("l_extendedprice") * one_minus("l_discount")
    zero = F.lit(0).cast("decimal(12,2)")
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_c_nkey"))
        .join(F.broadcast(r), F.col("_c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_s_nkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(zero))
            .cast("double")
            .alias("_num"),
            F.sum(vol).cast("double").alias("_den"),
        )
        .orderBy("o_year")
        .select("o_year", (F.col("_num") / F.col("_den")).cast("double").alias("mkt_share"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "join", "outer_join"),
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of order counts per customer (the
    o_comment NOT LIKE filter adapted to o_orderpriority — the corpus
    has no comment column). The non-equi part of the predicate lives
    in the LEFT JOIN condition, not a WHERE — customers with zero
    qualifying orders must survive with c_count = 0. Plan: one shuffle
    join customer⋈orders on custkey, then two hash aggregates; the
    second groups on the tiny c_count domain, so its exchange is
    negligible. count(o_orderkey) skips NULLs from the outer join on
    both engines."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_DP} * ({_ONE} - {_DD})) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "join", "subquery"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue (the
    reference SQL's CREATE VIEW is inlined as a reused subplan). The
    max-selection equality compares EXACT decimals, never doubles — a
    double round-trip could drop a tied supplier on one engine only.
    Plan: one shuffle aggregate over filtered lineitem, a broadcast of
    the 1-row max, and a broadcast join against the small supplier
    dim; the revenue subplan feeds both the filter and the output."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(dec("l_extendedprice") * one_minus("l_discount")).alias("_rev_dec"))
    )
    mx = rev.agg(F.max("_rev_dec").alias("_max_dec"))
    return (
        rev.join(F.broadcast(mx), rev._rev_dec == mx._max_dec)
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name", F.col("_rev_dec").cast("double").alias("total_revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM({_DP}) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS agg_partkey,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS cnt_qty
        FROM lineitem
        GROUP BY l_partkey
    ) part_agg ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND p_type = 'SMALL'
      AND 5 * CAST(l_quantity AS DECIMAL(12,2)) * cnt_qty < sum_qty
    """,
    tags=("tpch", "join", "subquery", "decorrelate"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue lost to small orders — the correlated
    AVG-threshold subquery (l_quantity < 0.2 * avg(l_quantity) per
    part), hand-decorrelated into a per-part aggregate join, which is
    the plan Catalyst would produce and the only shape that scales (a
    re-executed correlated subquery is O(n²)). The threshold compare
    is rewritten exactly: qty < 0.2*avg  ⟺  5*qty*cnt < sum_qty, all
    in decimal/bigint arithmetic — no float division that could flip
    a borderline row on one engine. p_container stands adapted to
    p_type (corpus has no container column)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "SMALL")
    )
    part_agg = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(part_agg, F.col("agg_partkey") == F.col("l_partkey"))
        .filter(F.lit(5) * dec("l_quantity") * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    JOIN nation    ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name IN ('NATION_1', 'NATION_3')
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("tpch", "join", "exists", "decorrelate"),
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21: suppliers who were the ONLY late supplier on a
    multi-supplier order ("late" adapted to l_shipdate > o_orderdate
    + 90 days — the corpus has no commit/receipt dates). The oracle
    keeps the reference's correlated EXISTS / NOT EXISTS form; the
    Spark plan is the decorrelated equivalent — per-order supplier
    counts — because a per-row re-executed subquery cannot scale:
      EXISTS(other supplier on the order)      ⟺ n_supp     > 1
      NOT EXISTS(other LATE supplier), l1 late ⟺ n_late_supp = 1
    Plan: ONE shuffle aggregate over the lineitem⋈orders join keyed
    on l_orderkey (both supplier counts in the same pass — the late
    count as countDistinct over a when()) plus the fact join on the
    same key; nation broadcasts; numwait counts qualifying LINE rows
    (a supplier twice-late on one order counts twice), matching the
    reference's row semantics."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_3"))
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")

    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    late = lo.filter(F.col("l_shipdate") > late_cut)
    # n_supp and n_late_supp in ONE aggregation pass over lo (r13 —
    # previously two separate lineitem aggregates, one over the raw
    # table and one over the late-filtered join). Equivalent because
    # o_orderstatus is per-order: for every order that can reach the
    # result (status 'F'), li and lo hold exactly the same line rows,
    # so countDistinct over li == countDistinct over lo; non-F orders
    # never survive the inner joins either way. One lineitem scan +
    # one shuffle agg + one join replaces two of each (interleaved
    # A/B: 0.87x/0.89x across two sessions, rows identical).
    stats = lo.groupBy(F.col("l_orderkey").alias("_ok_all")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_shipdate") > late_cut, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    return (
        late.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(stats, F.col("_ok_all") == F.col("l_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH cust AS (
        SELECT substring(c_name, 18, 1) AS cntrycode,
               c_custkey,
               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        FROM customer
        WHERE substring(c_name, 18, 1) IN ('1', '2', '3', '4', '5')
    ),
    stats AS (
        SELECT SUM(bal) AS s, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cust WHERE bal > 0
    )
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal) AS DOUBLE) AS totacctbal
    FROM cust, stats
    WHERE bal * cnt > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = cust.c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tags=("tpch", "anti_join", "subquery"),
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22: rich customers in selected country codes who never
    ordered (cntrycode adapted to a c_name digit — the corpus has no
    c_phone; "never ordered" adapted to "never placed an URGENT
    order", since every corpus customer has at least one order). The
    above-average-balance threshold is the same exact rewrite as q17:
    bal > avg  ⟺  bal * cnt > sum, in decimal — the 1-row stats
    aggregate is cross-joined (broadcast) rather than re-evaluated
    per row. The NOT EXISTS(orders) is a LEFT ANTI join
    — at 100 TB that is one shuffle of the two custkey sets, no
    per-row probe. Output groups on the tiny cntrycode domain."""
    c = table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 18, 1)
    ).filter(F.col("cntrycode").isin("1", "2", "3", "4", "5"))
    c = c.withColumn("bal", dec("c_acctbal"))
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    stats = c.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("_s"), F.count(F.lit(1)).alias("_cnt")
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(F.col("bal") * F.col("_cnt") > F.col("_s"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
