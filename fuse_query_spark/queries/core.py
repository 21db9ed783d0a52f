"""Core SELECT semantics: scan/filter/project/aggregate/sort/limit.

Covers SURVEY §2.1 (scans, numbers table function), §2.2
(projection/filter/expression/having), §2.4 (aggregation incl. the
reference's combinator surface: uniq / argMin / argMax / xxxIf /
xxxDistinct), §2.6 (sort, top-k, limit/offset, LIMIT n BY).

All money aggregates use exact decimal arithmetic (see
functions/exact.py) so results hash-match the DuckDB oracle bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fuse_query_spark.functions.exact import davg, dec, dsum, one_minus, one_plus
from fuse_query_spark.queries import register
from fuse_query_spark.sources.table_functions import numbers
from fuse_query_spark.sources.tables import spread_table, table

# Shared decimal-cast SQL fragments for oracles.
_DQ = "CAST(l_quantity AS DECIMAL(12,2))"
_DP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DD = "CAST(l_discount AS DECIMAL(12,2))"
_DT = "CAST(l_tax AS DECIMAL(12,2))"
_ONE = "CAST(1 AS DECIMAL(3,2))"


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_DQ}) AS DOUBLE)                               AS sum_qty,
           CAST(SUM({_DP}) AS DOUBLE)                               AS sum_base_price,
           CAST(SUM({_DP} * ({_ONE} - {_DD})) AS DOUBLE)            AS sum_disc_price,
           CAST(SUM({_DP} * ({_ONE} - {_DD}) * ({_ONE} + {_DT})) AS DOUBLE) AS sum_charge,
           CAST(SUM({_DQ}) AS DOUBLE) / COUNT(l_quantity)           AS avg_qty,
           CAST(SUM({_DP}) AS DOUBLE) / COUNT(l_extendedprice)      AS avg_price,
           CAST(SUM({_DD}) AS DOUBLE) / COUNT(l_discount)           AS avg_disc,
           COUNT(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "groupby", "filter", "flagship"),
)
def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: the flagship group-aggregate.

    Reference parity: GroupByPartial/Final two-phase hash aggregation
    (transform_group_by_partial.rs:27-270, transform_group_by_final.rs) —
    Spark's partial/final HashAggregate is the same strategy; the filter
    is pushed to the parquet scan (exceeds reference, which has no row
    filters in scans — parquet_table.rs:76 TODO).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * one_minus("l_discount")).cast("double").alias("sum_disc_price"),
            F.sum(dec("l_extendedprice") * one_minus("l_discount") * one_plus("l_tax"))
            .cast("double")
            .alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_global_stats",
    oracle=f"""
    SELECT COUNT(*)                         AS n_rows,
           COUNT(DISTINCT l_orderkey)       AS n_orders,
           CAST(SUM({_DQ}) AS DOUBLE)       AS sum_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           CAST(SUM({_DP}) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           MIN(l_shipdate)                  AS first_ship,
           MAX(l_shipdate)                  AS last_ship
    FROM lineitem
    """,
    tags=("aggregate", "global"),
)
def agg_global_stats(spark, sf_dir):
    """Keyless aggregation — reference AggregatorPartial/Final
    (transform_aggregator_partial.rs:24-125): partial states merged to a
    single row. Spark plans the identical partial→final pair."""
    li = spread_table(spark, sf_dir, "lineitem", "l_shipdate")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "agg_uniq",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)  AS uniq_supp,
           COUNT(DISTINCT l_partkey)  AS uniq_part,
           COUNT(*)                   AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "distinct"),
)
def agg_uniq(spark, sf_dir):
    """`uniq(x)` — the reference's EXACT distinct count (HashSet state,
    aggregate_combinator_distinct.rs:225; SURVEY §2.4 warns it is NOT
    approximate) → countDistinct, which Spark expands to a two-stage
    exact distinct aggregation."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("uniq_supp"),
        F.countDistinct("l_partkey").alias("uniq_part"),
        F.count(F.lit(1)).alias("n"),
    )


# Unique tie-broken ordering key for argMin/argMax: exact integer
# (price_cents * 1e8 + orderkey) — deterministic on both engines.
_ARG_KEY = "CAST(o_totalprice * 100 AS BIGINT) * 100000000 + o_orderkey"


@register(
    "agg_argminmax",
    oracle=f"""
    SELECT o_orderpriority,
           ARG_MAX(o_orderkey, {_ARG_KEY}) AS key_of_max_price,
           ARG_MIN(o_orderkey, {_ARG_KEY}) AS key_of_min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregate", "argminmax"),
)
def agg_argminmax(spark, sf_dir):
    """argMin/argMax (reference aggregate_arg_min.rs:19-180 — value of
    arg0 at the extremum of arg1) → F.min_by/F.max_by. The ordering key
    folds in o_orderkey so ties are impossible and the result is
    deterministic (the reference's argMin on ties is arrival-order —
    not reproducible — so we define the tie-broken semantics)."""
    o = table(spark, sf_dir, "orders")
    key = (F.col("o_totalprice") * 100).cast("bigint") * F.lit(100000000) + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("key_of_max_price"),
        F.min_by("o_orderkey", key).alias("key_of_min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@register(
    "agg_combinator_if",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(CASE WHEN l_quantity > 25 THEN 1 END)                 AS count_if_bigqty,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN {_DP} END) AS DOUBLE) AS sum_if_discounted,
           CAST(MIN(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END) AS DOUBLE) AS min_if_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "combinator"),
)
def agg_combinator_if(spark, sf_dir):
    """`<agg>If(args, cond)` combinator (aggregate_combinator_if.rs:19-166
    — filters rows on a trailing boolean before the nested aggregate).
    Spark-native form: agg over CASE WHEN, which Catalyst evaluates
    inside the partial aggregate — same single-pass semantics."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("count_if_bigqty"),
        F.sum(F.when(F.col("l_discount") > 0.05, dec("l_extendedprice"))).cast("double").alias("sum_if_discounted"),
        F.min(F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice"))).alias("min_if_f"),
    )


@register(
    "agg_combinator_distinct",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(DISTINCT {_DQ}) AS DOUBLE) AS sum_distinct_qty,
           COUNT(DISTINCT l_linenumber)        AS uniq_lineno
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "combinator"),
)
def agg_combinator_distinct(spark, sf_dir):
    """`<agg>Distinct` combinator (aggregate_combinator_distinct.rs:39-225
    — HashSet of values fed to the nested aggregate) → Spark's native
    DISTINCT aggregates (planned as a dedicating expand+two-phase agg)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum_distinct(dec("l_quantity")).cast("double").alias("sum_distinct_qty"),
        F.countDistinct("l_linenumber").alias("uniq_lineno"),
    )


@register(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("sort", "limit", "topk"),
)
def sort_topk(spark, sf_dir):
    """ORDER BY … LIMIT n — the reference's 3-stage sort with limit
    pushdown into per-pipe top-k (data_block_sort.rs:18-125,
    pipeline_builder.rs:220-265). Spark plans TakeOrderedAndProject:
    per-partition top-k then a single merge — the same strategy, and it
    never materializes a full sort at 100 TB."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    ORDER BY o_orderkey
    LIMIT 50 OFFSET 100
    """,
    tags=("sort", "limit", "offset"),
)
def limit_offset(spark, sf_dir):
    """LIMIT n OFFSET m (plan_limit.rs:29 carries both; executed by
    TakeStream/SkipStream) → df.offset(m).limit(n) on a sorted frame
    (deterministic because the sort key is unique)."""
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus").orderBy("o_orderkey").offset(100).limit(50)


@register(
    "limit_by",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (
        SELECT event_id, user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) t
    WHERE rn <= 3
    """,
    tags=("limit", "limit_by", "window"),
)
def limit_by(spark, sf_dir):
    """ClickHouse `LIMIT n BY cols` (plan_limit_by.rs:30,
    stream_limit_by.rs:21-75 — keep first n rows per distinct key) →
    row_number window ≤ n. ts+event_id ordering makes 'first' well
    defined (the reference's arrival order is not deterministic)."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_id", "user_id", "event_type")
    )


@register(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_linestatus LIKE 'F%'
      AND NOT (l_discount < 0.02)
    """,
    tags=("filter", "expression"),
)
def filter_predicates(spark, sf_dir):
    """WHERE with BETWEEN / IN / LIKE / NOT conjunctions — the
    reference's FilterTransform + BETWEEN desugaring
    (transform_filter.rs:24-117, plan_parser.rs:941-961). All predicates
    are Catalyst-native and pushed to the parquet scan (PushedFilters)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_linestatus").like("F%")
        & ~(F.col("l_discount") < 0.02)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "having_filter",
    oracle="""
    SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    HAVING COUNT(*) > 5 AND SUM(CAST(c_acctbal AS DECIMAL(12,2))) > 0
    """,
    tags=("aggregate", "having"),
)
def having_filter(spark, sf_dir):
    """HAVING — the reference reuses FilterTransform post-aggregation
    (plan_having.rs:30, pipeline_builder.rs:208-218); Spark likewise
    plans it as a Filter above the final HashAggregate."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("c_acctbal")).alias("_sum_bal_dec"))
        .filter((F.col("n") > 5) & (F.col("_sum_bal_dec") > 0))
        .select("c_nationkey", "c_mktsegment", "n", F.col("_sum_bal_dec").cast("double").alias("sum_bal"))
    )


@register(
    "numbers_agg",
    oracle="""
    SELECT CAST(number % 7 AS BIGINT) AS m,
           CAST(SUM(number) AS BIGINT)     AS sum_n,
           COUNT(*)                        AS cnt,
           CAST(MIN(number) AS BIGINT)     AS min_n,
           CAST(MAX(number) AS BIGINT)     AS max_n,
           AVG(number)                     AS avg_n,
           CAST(SUM(number * 2 + 1) AS BIGINT) AS sum_expr
    FROM (SELECT range AS number FROM range(1000000))
    GROUP BY m
    """,
    tags=("table_function", "numbers", "aggregate", "expression"),
)
def numbers_agg(spark, sf_dir):
    """numbers_mt(1e6) generator + modulo GROUP BY + arithmetic — the
    reference's headline bench shape (BASELINE.md: `GROUP BY number%3,
    number%4, number%5`; numbers_table.rs:28-122). All-integer → exact.
    avg(number) over each residue class is exact in double (sums < 2^53).
    """
    n = numbers(spark, 1_000_000)
    return n.groupBy((F.col("number") % 7).alias("m")).agg(
        F.sum("number").alias("sum_n"),
        F.count(F.lit(1)).alias("cnt"),
        F.min("number").alias("min_n"),
        F.max("number").alias("max_n"),
        F.avg("number").alias("avg_n"),
        F.sum(F.col("number") * 2 + 1).alias("sum_expr"),
    )


@register(
    "numbers_throughput_100m",
    oracle="""
    SELECT CAST(SUM(number) AS BIGINT) AS sum_n,
           COUNT(*) AS cnt,
           AVG(number) AS avg_n,
           CAST(MIN(number) AS BIGINT) AS min_n,
           CAST(MAX(number) AS BIGINT) AS max_n
    FROM (SELECT range AS number FROM range(100000000))
    """,
    tags=("table_function", "numbers", "throughput", "bench"),
)
def numbers_throughput_100m(spark, sf_dir):
    """The BASELINE.md headline shape (`SELECT avg/sum/min/max/count
    FROM numbers_mt(N)`) at 100M rows — a direct generator-throughput
    comparison with the reference's in-memory numbers source
    (README.md:71-78: ~21-34 Brows/s at 100B rows / 16 threads).
    Spark's range is whole-stage-codegen'd; one pass computes all five
    aggregates. avg over 0..1e8-1: sum≈5e15 < 2^53, so the double avg
    is exact."""
    n = numbers(spark, 100_000_000)
    return n.agg(
        F.sum("number").alias("sum_n"),
        F.count(F.lit(1)).alias("cnt"),
        F.avg("number").alias("avg_n"),
        F.min("number").alias("min_n"),
        F.max("number").alias("max_n"),
    )


@register(
    "numbers_sum_triple_100m",
    oracle="""
    SELECT CAST(SUM(number + number + number) AS BIGINT) AS sum3
    FROM (SELECT range AS number FROM range(100000000))
    """,
    tags=("table_function", "numbers", "throughput", "bench"),
)
def numbers_sum_triple_100m(spark, sf_dir):
    """BASELINE.md row `sum(number+number+number)` (README.md:76,
    19.83s / 5.04 Brows/s at 100B) at 100M rows. Catalyst folds the
    expression to number*3 inside whole-stage codegen; one generator
    pass, partial agg per partition, single-row merge."""
    n = numbers(spark, 100_000_000)
    return n.agg(F.sum(F.col("number") + F.col("number") + F.col("number")).alias("sum3"))


@register(
    "numbers_topk_sort_100m",
    oracle="""
    SELECT number FROM (SELECT range AS number FROM range(100000000))
    ORDER BY number DESC LIMIT 100
    """,
    tags=("table_function", "numbers", "sort", "topk", "bench"),
)
def numbers_topk_sort_100m(spark, sf_dir):
    """BASELINE.md row `ORDER BY number DESC LIMIT 100` (README.md:79,
    4.80s / 2.08 Brows/s at 10B) at 100M rows. Uses the threshold-
    prefiltered top-k (operators/topk.py): one codegen sample scan
    picks a provably-safe boundary, then TakeOrderedAndProject runs
    over only the survivors — Spark's per-partition top-k heap sits
    outside codegen and is the bottleneck on a plain ORDER BY LIMIT
    (measured 8.3s -> 0.8s at 1B; 2.3 Grows/s at 10B, above the
    reference's native 2.08)."""
    from fuse_query_spark.operators.topk import threshold_topk

    n = numbers(spark, 100_000_000)
    return threshold_topk(n, "number", 100, n_rows=100_000_000)


@register(
    "numbers_substring_topk",
    oracle="""
    SELECT substr(CAST(number AS VARCHAR), 3) AS s
    FROM (SELECT range AS number FROM range(1000000))
    WHERE number > 100 ORDER BY number DESC LIMIT 10
    """,
    tags=("table_function", "numbers", "string", "topk", "bench"),
)
def numbers_substring_topk(spark, sf_dir):
    """The reference perf suite's Substring shape (tests/perfs/perfs.yaml:
    `SELECT substring(cast(number as text) from 3) ... ORDER BY number
    DESC LIMIT 10`). The cast+substring stay inside whole-stage codegen;
    the sort is TakeOrderedAndProject on the pre-projection column."""
    n = numbers(spark, 1_000_000)
    return (
        n.filter(F.col("number") > 100)
        .orderBy(F.col("number").desc())
        .limit(10)
        .select(F.expr("substring(cast(number as string), 3)").alias("s"))
    )


@register(
    "numbers_groupby3_100m",
    oracle="""
    SELECT CAST(number % 3 AS BIGINT) AS m3,
           CAST(number % 4 AS BIGINT) AS m4,
           CAST(number % 5 AS BIGINT) AS m5,
           CAST(MAX(number) AS BIGINT) AS max_n,
           CAST(SUM(number) AS BIGINT) AS sum_n
    FROM (SELECT range AS number FROM range(100000000))
    GROUP BY m3, m4, m5
    """,
    tags=("table_function", "numbers", "groupby", "bench"),
)
def numbers_groupby3_100m(spark, sf_dir):
    """BASELINE.md row `GROUP BY number%3, number%4, number%5`
    (README.md:80, 6.31s / 158 Mrows/s at 1B) at 100M rows. 60 groups:
    map-side partial aggregation collapses each partition to ≤60 rows
    before a tiny exchange — the shape AQE coalesces to one reducer."""
    n = numbers(spark, 100_000_000)
    return n.groupBy(
        (F.col("number") % 3).alias("m3"),
        (F.col("number") % 4).alias("m4"),
        (F.col("number") % 5).alias("m5"),
    ).agg(F.max("number").alias("max_n"), F.sum("number").alias("sum_n"))


@register(
    "numbers_throughput_10b",
    oracle="""
    SELECT CAST(5000000000 AS DOUBLE)     AS avg_coarse,
           CAST(10000000000 AS BIGINT)    AS cnt,
           CAST(0 AS BIGINT)              AS min_n,
           CAST(9999999999 AS BIGINT)     AS max_n
    """,
    tags=("table_function", "numbers", "throughput", "bench", "scale"),
)
def numbers_throughput_10b(spark, sf_dir):
    """The BASELINE.md throughput shape at 10B rows — the scale where
    fixed job overhead amortizes and the sustained generator rate
    shows (r5 load-isolated median 4.0 Grows/s, best 5.1 — the r4
    13.3 claim was not reproducible and is retracted, SCALE.md r5
    addenda; the 100M twin reads 0.5 Grows/s because ~150 ms of
    setup dominates). sum(number) would overflow
    int64 at 10B, so the aggregate set is avg/count/min/max, like the
    reference's avg row (README.md:75, 4.35 s at 100B). The oracle is
    the CLOSED FORM (exact for count/min/max; avg compared at 1e4
    granularity because a 10B-row double summation differs in low
    bits between engines — Spark 4999999999.0124 vs exact .5)."""
    n = numbers(spark, 10_000_000_000)
    return n.agg(
        (F.round(F.avg("number") / 10000) * 10000).cast("double").alias("avg_coarse"),
        F.count(F.lit(1)).alias("cnt"),
        F.min("number").alias("min_n"),
        F.max("number").alias("max_n"),
    )


@register(
    "numbers_sum_triple_1b",
    # closed form (r6): 3·n(n-1)/2 for n=1e9 — a 1B-row DuckDB range
    # scan on the driver blocked this query's rotation into the prefix
    oracle="SELECT CAST(1499999998500000000 AS BIGINT) AS sum3",
    tags=("table_function", "numbers", "throughput", "bench", "scale"),
)
def numbers_sum_triple_1b(spark, sf_dir):
    """BASELINE.md row `sum(number+number+number)` (19.83 s / 5.04
    Brows/s at 100B) at 1B rows — measured 0.24 s = 4.2 Grows/s,
    ~0.83x the reference's native per-row rate (the 100M twin is
    overhead-bound at 0.9 Grows/s). 1B is the int64 ceiling for this
    shape: sum3 = 3n(n-1)/2 ≈ 1.5e18 < 2^63; 4B would overflow.
    Oracle is that closed form, exact."""
    n = numbers(spark, 1_000_000_000)
    return n.agg(F.sum(F.col("number") + F.col("number") + F.col("number")).alias("sum3"))


@register(
    "numbers_topk_sort_10b",
    oracle="""
    SELECT CAST(9999999999 - range AS BIGINT) AS number FROM range(100)
    """,
    tags=("table_function", "numbers", "sort", "topk", "bench", "scale"),
)
def numbers_topk_sort_10b(spark, sf_dir):
    """BASELINE.md row `ORDER BY number DESC LIMIT 100` at the
    reference's own 10B scale (4.80 s / 2.08 Brows/s). The threshold-
    prefiltered top-k (operators/topk.py) runs it at parity (r5
    load-isolated median 5.16 s = 1.94 Brows/s, best 2.01) where the
    plain per-partition heap takes ~80 s. Oracle is the closed form
    (top-100 of range(10B) descending), exact."""
    from fuse_query_spark.operators.topk import threshold_topk

    n = numbers(spark, 10_000_000_000)
    return threshold_topk(n, "number", 100, n_rows=10_000_000_000)


@register(
    "numbers_groupby3_1b",
    # closed form (r6): (m3,m4,m5) ↔ one residue r mod 60 (CRT — 3,4,5
    # coprime), so the answer is 60 rows of arithmetic-progression
    # sums over r, r+60, …, < 1e9: count c = 16666667 for r<40 else
    # 16666666 (1e9 = 60·16666666 + 40), max = r+60(c-1),
    # sum = r·c + 60·c(c-1)/2. A 60-row scan replaces the 1B-row
    # DuckDB range scan that blocked this query's prefix rotation.
    oracle="""
    WITH g AS (
      SELECT range AS r,
             CAST(CASE WHEN range < 40 THEN 16666667 ELSE 16666666 END AS BIGINT) AS c
      FROM range(60))
    SELECT CAST(r % 3 AS BIGINT) AS m3,
           CAST(r % 4 AS BIGINT) AS m4,
           CAST(r % 5 AS BIGINT) AS m5,
           CAST(r + 60 * (c - 1) AS BIGINT) AS max_n,
           CAST(r * c + 60 * ((c * (c - 1)) // 2) AS BIGINT) AS sum_n
    FROM g
    """,
    tags=("table_function", "numbers", "groupby", "bench", "scale"),
)
def numbers_groupby3_1b(spark, sf_dir):
    """BASELINE.md group-by row AT THE REFERENCE'S OWN 1B scale
    (6.31 s / 158 Mrows/s): measured 0.95 s = 1.06 Grows/s — 6.7x
    faster per-row than the native engine. Map-side partial agg
    collapses every partition to <=60 rows; the exchange moves ~2k
    rows total. The one shape with real aggregation work is where
    Tungsten wins; per-group SUMs stay under int64 (~8.3e15).
    Oracle is the CRT closed form (60 arithmetic progressions), exact."""
    n = numbers(spark, 1_000_000_000)
    return n.groupBy(
        (F.col("number") % 3).alias("m3"),
        (F.col("number") % 4).alias("m4"),
        (F.col("number") % 5).alias("m5"),
    ).agg(F.max("number").alias("max_n"), F.sum("number").alias("sum_n"))


@register(
    "expr_projection",
    oracle="""
    SELECT l_orderkey,
           l_linenumber * 10                        AS lineno10,
           CAST(l_quantity / 2 AS DOUBLE)           AS half_qty,
           CAST(l_quantity AS BIGINT) % 5           AS qty_mod5,
           CAST(-l_linenumber AS INTEGER)           AS neg_lineno,
           substring(l_returnflag, 1, 1)            AS flag1,
           concat(l_returnflag, '_', l_linestatus)  AS flag_status,
           CAST(l_quantity >= 25 AS BOOLEAN)        AS is_big,
           CAST(l_shipdate AS DATE)                 AS ship_day
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    tags=("expression", "projection", "functions"),
)
def expr_projection(spark, sf_dir):
    """Scalar expression surface (SURVEY §2.8): arithmetic (+ - * / %,
    unary minus — arithmetic.rs:29-38; `/` always yields Float64,
    matching Spark), substring (1-based, substring.rs:40-66), concat,
    comparison → boolean, CAST (cast.rs:22-60). Projection keeps the
    scan pruned to the referenced columns only."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        (F.col("l_linenumber") * 10).alias("lineno10"),
        (F.col("l_quantity") / 2).alias("half_qty"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod5"),
        (-F.col("l_linenumber")).alias("neg_lineno"),
        F.substring("l_returnflag", 1, 1).alias("flag1"),
        F.concat_ws("_", "l_returnflag", "l_linestatus").alias("flag_status"),
        (F.col("l_quantity") >= 25).alias("is_big"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS p50,
           ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 4) AS p90,
           ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 4) AS q1_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "percentile"),
)
def agg_percentiles(spark, sf_dir):
    """EXACT interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`: sort, index (n-1)*q, linear interpolation).
    Rounded to 4 decimals on BOTH engines: the interpolation's float
    op ORDER differs between implementations, so the last ulp can
    disagree while the value is identical to 1e-10. Exact percentile
    is a full sort per group — at extreme scale switch to
    approx_percentile (t-digest, agg_approx shows the pattern); this
    entry pins the exact semantics."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(F.col("l_extendedprice").cast("double"), F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(F.col("l_extendedprice").cast("double"), F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile(F.col("l_quantity").cast("double"), F.lit(0.25)), 4).alias("q1_qty"),
    )


@register(
    "expr_string_surface",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS up,
           replace(p_name, ' ', '_') AS underscored,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS masked,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CAST(LENGTH(p_name) AS INT) AS len,
           LPAD(p_brand, 10, '.') AS padded,
           CAST(strpos(p_name, 'e') AS INT) AS first_e
    FROM part
    ORDER BY p_partkey
    LIMIT 500
    """,
    tags=("expression", "string"),
)
def expr_string_surface(spark, sf_dir):
    """String-function surface: case, replace, global regexp_replace
    (Spark replaces all matches by default; DuckDB needs the 'g'
    flag — a classic cross-engine trap), group-1 regexp_extract,
    length, lpad, 1-based first-occurrence position (instr/strpos).
    Patterns stick to simple character classes so Java regex and
    DuckDB's RE2 agree. Pure codegen projection — scan-speed at any
    scale; the LIMIT keeps the oracle hash small."""
    p = table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("up"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("underscored"),
            F.regexp_replace("p_name", "[aeiou]", "*").alias("masked"),
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
            F.length("p_name").cast("int").alias("len"),
            F.lpad("p_brand", 10, ".").alias("padded"),
            F.instr("p_name", "e").cast("int").alias("first_e"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


@register(
    "expr_datetime_surface",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
           CAST(isodow(o_orderdate) AS INT) AS iso_dw,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INT) AS days_since_epoch_start
    FROM orders
    ORDER BY o_orderkey
    LIMIT 1000
    """,
    tags=("expression", "datetime"),
)
def expr_datetime_surface(spark, sf_dir):
    """Datetime-function surface: field extraction, ISO weekday
    (Spark's dayofweek is 1=SUNDAY while DuckDB's isodow is
    1=Monday — the classic off-by-locale trap; weekday()+1 IS isodow),
    month-end, date arithmetic, day difference. All integer/date
    valued — no float anywhere — so the comparison is exact."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("y"),
            F.quarter("o_orderdate").cast("int").alias("q"),
            F.month("o_orderdate").cast("int").alias("mo"),
            F.dayofmonth("o_orderdate").cast("int").alias("d"),
            (F.weekday("o_orderdate") + F.lit(1)).cast("int").alias("iso_dw"),
            F.last_day("o_orderdate").alias("month_end"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1995-01-01").cast("date"),
            ).cast("int").alias("days_since_epoch_start"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@register(
    "expr_array_surface",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
           ROUND(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), 'sum'), 4) AS sum_val,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
           list_contains(list_transform(embedding, x -> x > 0), true) AS has_pos
    FROM embeddings
    ORDER BY vec_id
    LIMIT 1000
    """,
    tags=("expression", "array"),
)
def expr_array_surface(spark, sf_dir):
    """Array-function surface over the embedding column: length,
    1-based element access (element_at == DuckDB's [1]), a
    left-to-right fold sum (same evaluation order on both engines,
    rounded for the widening difference), max, and an existential
    predicate. All JVM-side higher-order functions — no UDF."""
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return (
        e.select(
            "vec_id",
            F.size("embedding").cast("int").alias("dim"),
            F.round(F.element_at(v, 1), 4).alias("first_val"),
            F.round(
                F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x), 4
            ).alias("sum_val"),
            F.round(F.array_max("embedding").cast("double"), 4).alias("max_val"),
            F.exists("embedding", lambda x: x > 0).alias("has_pos"),
        )
        .orderBy("vec_id")
        .limit(1000)
    )


@register(
    "expr_null_semantics",
    oracle="""
    SELECT doc_id,
           NULLIF(lang, 'en') AS lang_or_null,
           COALESCE(NULLIF(lang, 'en'), 'english') AS coalesced,
           CASE WHEN n_chars > 300 THEN 'long'
                WHEN n_chars > 150 THEN 'mid'
                ELSE 'short' END AS bucket,
           GREATEST(n_chars, 200) AS floored,
           LEAST(n_chars, 200) AS capped,
           (NULLIF(lang, 'en') IS NOT DISTINCT FROM NULL) AS is_en
    FROM documents
    ORDER BY lang_or_null NULLS FIRST, doc_id
    LIMIT 300
    """,
    tags=("expression", "null", "sort"),
)
def expr_null_semantics(spark, sf_dir):
    """NULL semantics surface: NULLIF/COALESCE/CASE/GREATEST/LEAST,
    null-safe equality (<=> == IS NOT DISTINCT FROM), and an EXPLICIT
    NULLS FIRST sort — load-bearing because the engines' defaults
    DISAGREE (Spark ascending sorts NULLS FIRST, DuckDB NULLS LAST):
    any ORDER BY on a nullable key must pin the placement or the
    same query returns different prefixes under LIMIT."""
    d = table(spark, sf_dir, "documents")
    lang_or_null = F.nullif(F.col("lang"), F.lit("en"))
    return (
        d.select(
            "doc_id",
            lang_or_null.alias("lang_or_null"),
            F.coalesce(lang_or_null, F.lit("english")).alias("coalesced"),
            F.when(F.col("n_chars") > 300, "long")
            .when(F.col("n_chars") > 150, "mid")
            .otherwise("short")
            .alias("bucket"),
            F.greatest("n_chars", F.lit(200)).alias("floored"),
            F.least("n_chars", F.lit(200)).alias("capped"),
            lang_or_null.eqNullSafe(F.lit(None)).alias("is_en"),
        )
        .orderBy(F.col("lang_or_null").asc_nulls_first(), "doc_id")
        .limit(300)
    )
