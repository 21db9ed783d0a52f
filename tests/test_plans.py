"""Plan-regression gates: the properties that matter at 100 TB must
hold in the physical plan (mirrors the intent of the reference's
EXPLAIN tests, 04_* / 08_0000_optimizer.sql)."""

from fuse_query_spark.plans import (
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    has_take_ordered,
    scan_columns,
)
from fuse_query_spark.plans.explain import shuffle_count
from fuse_query_spark.queries import load_registry

REG = load_registry()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = REG["filter_predicates"].fn(spark, sf_dir)
    assert has_pushed_filters(df)


def test_q01_scan_is_column_pruned(spark, sf_dir):
    df = REG["q01_pricing_summary"].fn(spark, sf_dir)
    scans = scan_columns(df)
    assert scans, "expected a parquet scan"
    # 16-column lineitem pruned to the 7 referenced columns
    assert all(len(cols) <= 7 for cols in scans), scans


def test_dim_joins_are_broadcast(spark, sf_dir):
    df = REG["join_revenue_by_nation"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    # fact side never shuffles before the aggregate: broadcast joins
    # + partial agg → at most the one agg exchange (+AQE final)
    assert shuffle_count(df, include_repartition=False) <= 2  # intentional spread exchanges excluded (explain.py:shuffle_count)


def test_topk_avoids_full_sort(spark, sf_dir):
    assert has_take_ordered(REG["sort_topk"].fn(spark, sf_dir))
    assert has_take_ordered(REG["similarity_topk_bruteforce"].fn(spark, sf_dir))


def test_q01_two_phase_aggregation(spark, sf_dir):
    """Reference: GroupByPartial → GroupByFinal (SURVEY §2.4). Spark
    must plan the same partial/final HashAggregate pair."""
    from fuse_query_spark.plans import formatted_plan

    plan = formatted_plan(REG["q01_pricing_summary"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_projection_prunes_unused_columns(spark, sf_dir):
    df = REG["expr_projection"].fn(spark, sf_dir)
    for cols in scan_columns(df):
        assert "l_extendedprice" not in cols  # never referenced
        assert "l_tax" not in cols


def test_grouping_sets_single_expand_aggregation(spark, sf_dir):
    """GROUPING SETS must plan as one Expand feeding one partial/final
    aggregate pair — NOT one aggregation pass per set unioned together
    (which would re-scan the fact table per set at 100 TB)."""
    from fuse_query_spark.plans import formatted_plan

    for name in ("grouping_sets_orders", "grouping_sets_disjoint"):
        df = REG[name].fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert "Expand" in plan, name
        assert shuffle_count(df, include_repartition=False) <= 2, name  # intentional spread exchanges excluded (explain.py:shuffle_count)


def test_substring_topk_avoids_full_sort(spark, sf_dir):
    assert has_take_ordered(REG["numbers_substring_topk"].fn(spark, sf_dir))


def test_tpch_plan_shapes(spark, sf_dir):
    """Q3: top-10 via TakeOrderedAndProject (never a full sort of the
    aggregate); Q6: all predicates pushed, scan pruned to 4 columns;
    Q14: part joined via broadcast (no lineitem shuffle for the join)."""
    q3 = REG["q03_shipping_priority"].fn(spark, sf_dir)
    assert has_take_ordered(q3) and has_pushed_filters(q3)
    q6 = REG["q06_forecast_revenue"].fn(spark, sf_dir)
    assert has_pushed_filters(q6)
    assert all(len(cols) <= 4 for cols in scan_columns(q6)), scan_columns(q6)
    q14 = REG["q14_promo_revenue"].fn(spark, sf_dir)
    assert has_broadcast_join(q14)
    assert shuffle_count(q14, include_repartition=False) <= 2  # intentional spread exchanges excluded (explain.py:shuffle_count)


def test_q04_semi_join_and_pushdown(spark, sf_dir):
    """Q4's EXISTS must plan as a LEFT SEMI join (dedup-by-construction,
    no DISTINCT pass) with the quarter filter pushed to the orders
    scan, and the lineitem scan pruned to its 2 referenced columns."""
    from fuse_query_spark.plans import formatted_plan

    df = REG["q04_order_priority"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan
    assert has_pushed_filters(df)
    assert any(set(c) <= {"l_orderkey", "l_shipdate"} for c in scan_columns(df))


def test_q12_case_agg_plan(spark, sf_dir):
    """Q12: CASE-in-SUM folds into the partial aggregate (two-phase
    HashAggregate), orders scan pruned to 2 columns."""
    from fuse_query_spark.plans import formatted_plan

    df = REG["q12_priority_by_returnflag"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2
    assert any(set(c) <= {"o_orderkey", "o_orderpriority"} for c in scan_columns(df))


def test_q05_broadcasts_dims_and_pushes_dates(spark, sf_dir):
    """Q5's nation/region joins must broadcast (explicit hint +
    AQE-small) and the order-date window must reach the orders scan —
    at 100 TB the only large shuffles are the fact-side equi-joins."""
    df = REG["q05_local_supplier_volume"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert has_pushed_filters(df)


def test_q10_topk_and_pushdown(spark, sf_dir):
    df = REG["q10_returned_items"].fn(spark, sf_dir)
    assert has_take_ordered(df)  # top-20, not a full sort
    assert has_pushed_filters(df)  # quarter + returnflag reach scans


def test_q19_single_side_conjuncts_pushed(spark, sf_dir):
    """Catalyst factors the common single-side conjuncts out of the
    OR-of-ANDs (l_quantity bounds, p_size lower bound) and pushes them
    below the join — the disjunction itself evaluates post-join."""
    from fuse_query_spark.plans import formatted_plan

    df = REG["q19_discounted_revenue"].fn(spark, sf_dir)
    assert has_pushed_filters(df)
    plan = formatted_plan(df)
    # the factored quantity range appears as a scan-level filter
    assert "l_quantity" in plan


def test_quantize_int8_is_shuffle_free(spark, sf_dir):
    """Per-vector quantization is a narrow projection — any exchange
    in this plan is a bug that would cost a full corpus shuffle."""
    df = REG["embedding_quantize_int8"].fn(spark, sf_dir)
    assert shuffle_count(df, include_repartition=False) == 0  # intentional spread exchanges excluded (explain.py:shuffle_count)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed by the join key with equal counts -> the
    join plans with ZERO Exchange: the write-time shuffle is amortized
    over every downstream join (operators/bucketing.py)."""
    from fuse_query_spark.operators.bucketing import colocated_join, write_bucketed
    from fuse_query_spark.sources.tables import table as t

    write_bucketed(t(spark, sf_dir, "orders"), "bkt_orders_t", "o_orderkey", 8)
    write_bucketed(
        t(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "bkt_lineitem_t",
        "o_orderkey",
        8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the test exercises the bucketed path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = colocated_join(spark, "bkt_orders_t", "bkt_lineitem_t", "o_orderkey")
        assert shuffle_count(df) == 0, "bucketed join must not exchange"
        # and it actually runs
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders_t")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem_t")


def test_correlated_subqueries_decorrelate(spark, sf_dir):
    """Correlated EXISTS/NOT EXISTS must plan as semi+anti joins and
    the correlated scalar as aggregate+join — zero Subquery re-
    executions in the physical plan."""
    from fuse_query_spark.plans import formatted_plan

    p1 = formatted_plan(REG["correlated_exists"].fn(spark, sf_dir))
    assert "LeftSemi" in p1 and "LeftAnti" in p1
    p2 = formatted_plan(REG["correlated_scalar_subquery"].fn(spark, sf_dir))
    assert "HashAggregate" in p2


def test_q07_q08_two_role_nation_broadcasts(spark, sf_dir):
    """Q7/Q8 join nation in TWO roles — both must broadcast, and the
    date windows must reach the fact scans; at 100 TB only the fact
    equi-joins may shuffle."""
    q7 = REG["q07_volume_shipping"].fn(spark, sf_dir)
    assert has_broadcast_join(q7)
    assert has_pushed_filters(q7)
    q8 = REG["q08_market_share"].fn(spark, sf_dir)
    assert has_broadcast_join(q8)
    assert has_pushed_filters(q8)
    # region + p_type filters push to their dim scans
    plan = formatted_plan(q8)
    assert "AMERICA" in plan and "ECONOMY" in plan


def test_q13_outer_join_keeps_condition_in_join(spark, sf_dir):
    """Q13's non-equi predicate must live in the LEFT JOIN condition
    (customers with zero qualifying orders survive), not a post-join
    filter that would turn the outer join inner."""
    from fuse_query_spark.plans import formatted_plan

    df = REG["q13_customer_distribution"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftOuter" in plan
    assert plan.count("HashAggregate") >= 2  # both aggs two-phase


def test_q17_decorrelated_threshold_is_single_pass(spark, sf_dir):
    """Q17's avg-threshold subquery decorrelates to one per-part
    aggregate joined back — no per-row subquery re-execution, part
    dim broadcast."""
    df = REG["q17_small_quantity_revenue"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    assert has_pushed_filters(df)


def test_q21_q22_anti_join_shapes(spark, sf_dir):
    """Q21 decorrelates to per-order aggregates (no correlated
    subquery nodes); Q22's NOT EXISTS is a LEFT ANTI join."""
    from fuse_query_spark.plans import formatted_plan

    p21 = formatted_plan(REG["q21_waiting_supplier"].fn(spark, sf_dir))
    assert "HashAggregate" in p21
    p22 = formatted_plan(REG["q22_global_sales_opportunity"].fn(spark, sf_dir))
    assert "LeftAnti" in p22


def test_runtime_bloom_filter_injects_on_fact_joins(spark, sf_dir):
    """session.tune enables runtime bloom-filter join pruning; the
    thresholds (creation <=10 MB, application scan >=10 GB) make it
    at-scale-only, so to pin the wiring we lower them and check
    Catalyst injects might_contain onto the lineitem scan side of a
    selective lineitem⋈orders join."""
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    app_key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    bcast_key = "spark.sql.autoBroadcastJoinThreshold"
    old_app, old_bcast = spark.conf.get(app_key), spark.conf.get(bcast_key)
    spark.conf.set(app_key, "1KB")
    spark.conf.set(bcast_key, "-1")  # force a shuffle join so the bloom applies
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
    finally:
        spark.conf.set(app_key, old_app)
        spark.conf.set(bcast_key, old_bcast)


def test_decontaminate_bloom_prefilter_is_broadcast_semi(spark, sf_dir):
    """The bucket prefilter must be a broadcast LEFT SEMI join (the
    whole point: no extra shuffle in front of the exact join)."""
    df = REG["decontaminate_bloom"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:2000]


def test_scatter_bucket_parity_with_reference_rule(spark):
    """Distributed-scatter mapping (flight_scatter_hash.rs:80-91):
    bucket = cast(expr AS UInt64) % N. The Spark analog must assign
    every row — including NEGATIVE keys, where UInt64 reinterpretation
    diverges from signed pmod for non-power-of-two N — to the same
    bucket the reference's expr_action computes, and repartitioning on
    that bucket must co-locate equal buckets in one partition."""
    from pyspark.sql import functions as F

    from fuse_query_spark.cluster import scatter, scatter_bucket

    n = 3  # non-power-of-two: u64-reinterpret != pmod for negatives
    vals = [0, 1, 2, 5, 2**62, -1, -2, -5, -(2**62)]
    df = spark.createDataFrame([(v,) for v in vals], "k BIGINT")
    got = {
        r.k: r.b
        for r in df.select("k", scatter_bucket(F.col("k"), n).alias("b")).collect()
    }
    want = {v: (v % 2**64) % n for v in vals}  # the reference rule in python
    assert got == want
    # sanity that the plain signed pmod would NOT have matched (the
    # test would be vacuous otherwise)
    assert any((v % n) != want[v] for v in vals if v < 0)
    # co-location: after scatter(), rows of one bucket share a partition
    parts = (
        scatter(df, n, F.col("k"))
        .select(scatter_bucket(F.col("k"), n).alias("b"), F.spark_partition_id().alias("p"))
        .collect()
    )
    by_bucket = {}
    for r in parts:
        by_bucket.setdefault(r.b, set()).add(r.p)
    assert all(len(ps) == 1 for ps in by_bucket.values()), by_bucket


def test_r5_scan_side_ops_are_shuffle_free(spark, sf_dir):
    """PII redaction, chunking, and winnowing are pure scan-side
    Column work; the JL projection is one scan-side Arrow stage (r13)
    — zero exchanges in any of these plans."""
    for name in (
        "text_pii_redact",
        "text_chunk_windows",
        "text_winnow_fingerprint",
        "embedding_random_projection",
    ):
        assert shuffle_count(REG[name].fn(spark, sf_dir), include_repartition=False) == 0, name  # intentional spread exchanges excluded (explain.py:shuffle_count)


def test_funnel_single_aggregation_pass(spark, sf_dir):
    """The curation funnel is one scan + conditional aggregation: the
    doc_id materialization exchange, the partial->final agg exchange
    (+AQE) — never one pass per filter stage. (Keying the
    materialization on `source` would save one exchange by satisfying
    the agg's distribution, but collapses parallelism to |sources|
    partitions at scale — the deliberate trade-off: the extra shuffle
    moves only the map-side-combined per-source partials.)"""
    df = REG["pipeline_filter_funnel"].fn(spark, sf_dir)
    assert shuffle_count(df) <= 4
    scans = scan_columns(df)
    assert scans and all(len(cols) <= 4 for cols in scans), scans


def test_chunk_dedup_two_hash_aggregates(spark, sf_dir):
    """Chunk-level dedup: chunk-hash count agg + doc rollup + the
    hash join back — bounded exchanges, no window, no sort."""
    df = REG["dedup_chunk_fraction"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "TakeOrdered" not in plan
    assert shuffle_count(df, include_repartition=False) <= 4  # intentional spread exchanges excluded (explain.py:shuffle_count)


def test_tfidf_window_partitions_by_doc(spark, sf_dir):
    """tf-idf ranking windows on doc_id (high cardinality — small
    per-partition sorts), never a global sort."""
    df = REG["text_tfidf_keywords"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_leakage_split_broadcasts_labels(spark, sf_dir):
    """At test scale the component labels fit the broadcast budget, so
    the corpus never shuffles for the label join."""
    df = REG["sample_split_leakage_safe"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_leakage_split_size_gates_the_broadcast(spark, sf_dir):
    """Both regimes of the size gate (operators/sampling.py): labels
    below the threshold broadcast; above it (threshold forced to 0 =
    disabled) the join falls back to a shuffle join on doc_id — at
    crawl scale near-dup pairs can cover 30-50% of documents, so an
    unconditional broadcast of labels is a driver OOM."""
    from fuse_query_spark.operators.sampling import leakage_safe_split
    from fuse_query_spark.queries.sampling import _leakage_inputs

    docs, pairs = _leakage_inputs(spark, sf_dir)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1048576000")
        assert has_broadcast_join(leakage_safe_split(docs, pairs))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = leakage_safe_split(docs, pairs)
        plan = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_repetition_topk_single_join(spark, sf_dir):
    """r12 opt: the per-doc top-bigram is ONE hash aggregate
    (min over the orderable (-count, bigram) struct), so the whole
    plan carries exactly one join — base metrics ⋈ top — instead of
    the old max-count agg + join-back + re-agg formulation."""
    import re

    df = REG["text_repetition_metrics"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    assert len(joins) == 1, joins
    assert "Window" not in plan and "TakeOrdered" not in plan
