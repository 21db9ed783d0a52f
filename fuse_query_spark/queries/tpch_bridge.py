"""TPC-H queries 2/9/11/16/20, adapted to the driver corpus — the five
queries whose canonical form needs the absent `partsupp` table. Here
`lineitem` doubles as the part↔supplier bridge: the observed
(l_partkey, l_suppkey) pairs play partsupp's role, with
MIN(l_extendedprice) per pair standing in for ps_supplycost and
shipped-quantity shares standing in for ps_availqty. Together with
tpch.py and tpch_extended.py this closes the TPC-H set over the
available tables. The reference engine cannot run any of these (no
joins — SURVEY §2.3); they are capability-superset entries exercising
the correlated-min, multi-dim star-profit, fraction-of-total HAVING,
distinct-count anti-filter, and share-threshold semi-join plan shapes.

Exactness policy (functions/exact.py): money/quantity lift to DECIMAL
before any arithmetic; fraction thresholds compare decimal-to-decimal;
Q20's "share > 2x the average supplier's" is cross-multiplied
(qty * n_suppliers > 2 * total) so no division ever happens.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fuse_query_spark.functions.exact import dec, one_minus
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import table

_DP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DD = "CAST(l_discount AS DECIMAL(12,2))"
_DQ = "CAST(l_quantity AS DECIMAL(12,2))"
_ONE = "CAST(1 AS DECIMAL(3,2))"


@register(
    "q02_min_cost_supplier",
    oracle=f"""
    WITH supply AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN({_DP}) AS ps_supplycost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(ps_supplycost AS DOUBLE) AS supply_cost
    FROM part
    JOIN supply   ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size < 26 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
      AND ps_supplycost = (
          SELECT MIN(ps2.ps_supplycost)
          FROM supply ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("tpch", "join", "correlated"),
)
def q02_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2: cheapest EUROPE supplier per qualifying part.
    Bridge adaptation: ps_supplycost := MIN(l_extendedprice) over the
    observed (part, supplier) lineitem pairs (exact decimal — no unit
    division). The correlated min-cost subquery decorrelates to a
    window MIN over the already-joined EUROPE rows — one pass, no
    second join tree, which is exactly how a 100 TB plan should run
    it. Plan: lineitem groupBy(part, supp) is the only big shuffle;
    supplier/nation/region broadcast; part's size+type filter pushes
    to its scan."""
    li = table(spark, sf_dir, "lineitem")
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(dec("l_extendedprice")).alias("ps_supplycost"))
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") < 26) & (F.col("p_type") == "ECONOMY")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe_supp = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).join(r, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    joined = (
        supply.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(europe_supp, F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("_min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q09_product_type_profit",
    oracle=f"""
    SELECT nation, l_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS l_year,
               {_DP} * ({_ONE} - {_DD})
                 - CAST(p_retailprice AS DECIMAL(12,2)) * {_DQ}
                   * CAST(0.10 AS DECIMAL(4,2)) AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, l_year
    ORDER BY nation, l_year DESC
    """,
    tags=("tpch", "join", "multi_join"),
)
def q09_product_type_profit(spark, sf_dir):
    """TPC-H Q9: profit by supplier nation and order year for parts
    matching a name pattern. Bridge adaptation: with no ps_supplycost,
    unit cost is 10% of p_retailprice, so
    amount = revenue - retailprice*qty*0.10, all in exact decimal.
    Plan: part's LIKE filter prunes before the fact join;
    part/supplier/nation broadcast; lineitem⋈orders is the only
    fact-fact shuffle; the final group-by is 25 nations x ~7 years —
    tiny, map-side partials dominate."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount = dec("l_extendedprice") * one_minus("l_discount") - dec(
        "p_retailprice"
    ) * dec("l_quantity") * F.lit("0.10").cast("decimal(4,2)")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("l_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "l_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("l_year").desc())
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH partval AS (
        SELECT l_partkey AS ps_partkey,
               SUM({_DP} * {_DQ}) AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT ps_partkey, CAST(value AS DOUBLE) AS part_value
    FROM partval
    WHERE value > (SELECT SUM(value) * CAST(0.001 AS DECIMAL(4,3)) FROM partval)
    ORDER BY value DESC, ps_partkey
    """,
    tags=("tpch", "scalar_subquery", "having"),
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11: parts representing a significant fraction of one
    nation's stock value. Bridge adaptation: value :=
    SUM(extendedprice * quantity) of that nation's lineitems (exact
    decimal both sides of the threshold — the fraction multiplies, it
    never divides). Plan: nation+supplier broadcast-prune lineitem
    BEFORE its group-by; the fraction-of-total is a scalar agg
    broadcast back over the grouped rows (two passes over the small
    grouped set, one over the fact)."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = F.broadcast(
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select("s_suppkey")
    )
    partval = (
        li.join(nat_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(dec("l_extendedprice") * dec("l_quantity")).alias("value"))
    )
    total = partval.agg(
        (F.sum("value") * F.lit("0.001").cast("decimal(4,3)")).alias("_threshold")
    )
    return (
        partval.join(F.broadcast(total))
        .filter(F.col("value") > F.col("_threshold"))
        .select("ps_partkey", F.col("value").cast("double").alias("part_value"), "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
        .drop("value")
    )


@register(
    "q16_parts_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#17'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (2, 5, 11, 17, 23, 28, 37, 41, 47)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "anti_join", "distinct"),
)
def q16_parts_supplier_relationship(spark, sf_dir):
    """TPC-H Q16: how many suppliers can furnish each qualifying
    (brand, type, size). Bridge adaptation: the part↔supplier relation
    is the observed lineitem pairs; the "customer complaints" supplier
    exclusion becomes s_acctbal < 1000. Plan: the NOT IN is a
    broadcast anti-join (the excluded list is tiny at any SF — it's
    bounded by the supplier dim); part's three filters push to its
    scan and broadcast; one shuffle for the distinct-count group-by."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#17")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(2, 5, 11, 17, 23, 28, 37, 41, 47)
    )
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000.0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_potential_part_promotion",
    oracle=f"""
    WITH shipped AS (
        SELECT l_suppkey, l_partkey, SUM({_DQ}) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    ), part_tot AS (
        SELECT l_partkey AS pt_partkey,
               SUM(qty) AS total_qty, COUNT(*) AS n_supp
        FROM shipped
        GROUP BY l_partkey
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM shipped
          JOIN part_tot ON l_partkey = pt_partkey
          JOIN part     ON p_partkey = l_partkey
          WHERE p_name LIKE 'red%'
            AND 2 * qty * n_supp > 3 * total_qty)
    ORDER BY s_name
    """,
    tags=("tpch", "semi_join", "threshold"),
)
def q20_potential_part_promotion(spark, sf_dir):
    """TPC-H Q20: suppliers sitting on an outsized share of a
    promotable part. Bridge adaptation: with no ps_availqty, a
    supplier qualifies when its 1997 shipped quantity of a 'red%'
    part exceeds 1.5x the average supplier's for that part —
    cross-multiplied (2 * qty * n_supp > 3 * total_qty) so the
    compare is exact decimal/integer; the single-nation filter
    becomes single-REGION so the query is non-vacuous at every SF.
    Plan: the shipdate filter pushes to the lineitem scan; shipped
    and part_tot reuse ONE grouped dataset (part_tot derives from
    shipped, not a second scan); part broadcast; the IN is a
    semi-join onto the tiny supplier dim."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(F.sum(dec("l_quantity")).alias("qty"))
    part_tot = shipped.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty").alias("total_qty"), F.count("*").alias("n_supp")
    )
    red = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    qualifying = (
        shipped.join(part_tot, F.col("l_partkey") == F.col("pt_partkey"))
        .join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.lit(2) * F.col("qty") * F.col("n_supp") > F.lit(3) * F.col("total_qty"))
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
