"""Set operations — capability extension (the reference plans only
SetExpr::Select; UNION/INTERSECT/EXCEPT error — plan_parser.rs:410-418).
Spark's union/unionByName/intersect/exceptAll map 1:1 to the SQL
semantics (INTERSECT/EXCEPT are the DISTINCT variants, matching ANSI).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import table


def _rich_customers(spark, sf_dir):
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )


def _big_spenders(spark, sf_dir):
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


_RICH = "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000"
_BIG = "SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000"


@register(
    "setop_union_keys",
    oracle=f"{_RICH} UNION {_BIG}",
    tags=("setop", "union"),
)
def setop_union_keys(spark, sf_dir):
    """UNION (distinct) — union + dropDuplicates; Catalyst plans the
    dedup as a hash aggregate over the union."""
    return _rich_customers(spark, sf_dir).union(_big_spenders(spark, sf_dir)).distinct()


@register(
    "setop_union_all",
    oracle=f"""
    SELECT custkey, COUNT(*) AS n FROM ({_RICH} UNION ALL {_BIG}) t
    GROUP BY custkey HAVING COUNT(*) > 1
    """,
    tags=("setop", "union_all"),
)
def setop_union_all(spark, sf_dir):
    """UNION ALL preserves duplicates — keys in both branches count 2."""
    u = _rich_customers(spark, sf_dir).union(_big_spenders(spark, sf_dir))
    return u.groupBy("custkey").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)


@register(
    "setop_intersect",
    oracle=f"{_RICH} INTERSECT {_BIG}",
    tags=("setop", "intersect"),
)
def setop_intersect(spark, sf_dir):
    return _rich_customers(spark, sf_dir).intersect(_big_spenders(spark, sf_dir))


@register(
    "setop_except",
    oracle=f"{_RICH} EXCEPT {_BIG}",
    tags=("setop", "except"),
)
def setop_except(spark, sf_dir):
    return _rich_customers(spark, sf_dir).exceptAll(_big_spenders(spark, sf_dir)).distinct()


@register(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate", "rollup"),
)
def rollup_orders(spark, sf_dir):
    """GROUPING SETS / ROLLUP — absent from the reference (SURVEY §2.4:
    'no grouping sets/cube/rollup'), free in Spark via df.rollup."""
    from fuse_query_spark.functions.exact import dec

    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("total"),
    )


@register(
    "cube_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "cube"),
)
def cube_lineitem(spark, sf_dir):
    o = table(spark, sf_dir, "lineitem")
    return o.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))

@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    tags=("aggregate", "grouping_sets"),
)
def grouping_sets_orders(spark, sf_dir):
    """Explicit GROUPING SETS with a grouping_id indicator — absent from
    the reference (SURVEY §2.4: 'no grouping sets/cube/rollup'); Spark's
    df.groupingSets and DuckDB's GROUP BY GROUPING SETS share the same
    bitmask convention (first listed column = most significant bit), so
    the gid column is oracle-comparable as-is."""
    from fuse_query_spark.functions.exact import dec

    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        ).agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("o_totalprice")).cast("double").alias("total"),
        )
    )


@register(
    "grouping_sets_disjoint",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    tags=("aggregate", "grouping_sets"),
)
def grouping_sets_disjoint(spark, sf_dir):
    """Non-hierarchical grouping sets — two disjoint single-column sets,
    which neither ROLLUP nor CUBE can express. One shuffle: Spark expands
    each input row once per set, then runs a single hash aggregate."""
    from fuse_query_spark.functions.exact import dec

    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        ).agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
        )
    )


@register(
    "setop_except_intersect_all",
    oracle="""
    WITH h1 AS (
        SELECT o_orderpriority AS p FROM orders
    ), h2 AS (
        SELECT o_orderpriority AS p FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT 'except_all' AS op, p, COUNT(*) AS n
    FROM (SELECT p FROM h1 EXCEPT ALL SELECT p FROM h2) GROUP BY p
    UNION ALL
    SELECT 'intersect_all' AS op, p, COUNT(*) AS n
    FROM (SELECT p FROM h1 INTERSECT ALL SELECT p FROM h2) GROUP BY p
    """,
    tags=("setop", "multiset"),
)
def setop_except_intersect_all(spark, sf_dir):
    """EXCEPT ALL / INTERSECT ALL — MULTISET semantics (the distinct
    variants kill duplicate counts; the ALL forms subtract/min them):
    all orders EXCEPT ALL / INTERSECT ALL the 1997+ tail, aggregated
    so the result is hash-stable — except_all counts the pre-1997
    multiset remainder, intersect_all the common multiplicities; both
    sides non-empty by construction. Spark plans both as a single aggregate computing
    per-key counts on each side then replicating rows max(n1-n2, 0) /
    min(n1, n2) times — one shuffle per setop, no join. The reference
    errors on set ops (SURVEY §2.7) — capability superset."""
    o = table(spark, sf_dir, "orders")
    h1 = o.select(F.col("o_orderpriority").alias("p"))
    h2 = o.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_orderpriority").alias("p"))
    exc = (
        h1.exceptAll(h2)
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "p", "n")
    )
    inter = (
        h1.intersectAll(h2)
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "p", "n")
    )
    return exc.unionAll(inter)
