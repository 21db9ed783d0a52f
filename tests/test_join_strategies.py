"""Scale-strategy joins: salted (skew) equivalence and bucketed
co-located joins with zero exchanges."""

import pytest
from pyspark.sql import functions as F

from fuse_query_spark.operators.joins import salted_join
from fuse_query_spark.plans.explain import formatted_plan, shuffle_count
from fuse_query_spark.sources.bucketed import colocated_join, write_bucketed
from fuse_query_spark.sources.tables import table


def test_salted_join_equals_plain_join(spark):
    # skewed left: 90% of rows share key 1
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame([(1, "hot"), (11, "cold"), (42, "x")], "k LONG, tag STRING")
    plain = set(map(tuple, left.join(right, "k").select("payload", "tag").collect()))
    salted = set(map(tuple, salted_join(left, right, "k", n_salt=8).select("payload", "tag").collect()))
    assert salted == plain
    assert len(plain) >= 9000  # the hot key actually dominated


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k LONG, v STRING")
    right = spark.createDataFrame([(1, "r")], "k LONG, tag STRING")
    out = {tuple(r) for r in salted_join(left, right, "k", n_salt=4, how="left").select("v", "tag").collect()}
    assert out == {("a", "r"), ("b", None)}


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(o, "bt_orders", "o_orderkey", 8)
    write_bucketed(li, "bt_lineitem", "o_orderkey", 8)
    yield "bt_orders", "bt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_colocated_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the planner must pick the shuffle-family
    # join — the case bucketing exists to optimize (at 100 TB neither
    # side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, "o_orderkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert shuffle_count(joined) == 0, plan  # bucketing elided both exchanges
        count_bucketed = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and it is still correct
    expected = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        .count()
    )
    assert count_bucketed == expected


def test_aqe_skew_join_splits_hot_partition(spark):
    """The SCALE.md claim 'AQE skew-join splits hot partitions
    automatically' — demonstrated, not just asserted: one key carries
    ~12x the median partition bytes; the executed adaptive plan must
    mark the join skew=true (hot partition split into subpartitions)
    and the join result must stay exact."""
    from pyspark.sql import functions as F

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )
    prev = {k: spark.conf.get(k) for k in keys}
    try:
        # scale the skew thresholds down to test-sized shuffles
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        fact = (
            spark.range(120_000)
            .select(F.lit(0).alias("k"), F.xxhash64("id").alias("v"))
            .unionAll(
                spark.range(9_900).select(
                    (F.col("id") % 99 + 1).alias("k"), F.xxhash64("id").alias("v")
                )
            )
        )
        dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        j = fact.join(dim, "k")
        rows = j.collect()  # executes THIS Dataset -> final adaptive plan
        assert len(rows) == 129_900
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_salted_join_rejects_right_and_full_outer(spark):
    import pytest

    from fuse_query_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    right = spark.createDataFrame([(1, "x")], "k INT, tag STRING")
    for how in ("right", "right_outer", "full", "fullouter", "outer"):
        with pytest.raises(ValueError, match="replicated right side"):
            salted_join(left, right, "k", n_salt=4, how=how)
