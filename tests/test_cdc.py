"""SCD2 merge semantics + stateful-streaming operator."""

from pyspark.sql import functions as F


def _dim(spark):
    return spark.createDataFrame(
        [
            (1, "gold", "2024-01-01", None),
            (2, "silver", "2024-01-01", None),
            (3, "bronze", "2024-01-01", "2024-02-01"),  # history row
            (3, "silver", "2024-02-01", None),
        ],
        "k INT, tier STRING, effective_from STRING, effective_to STRING",
    )


def test_scd2_merge(spark):
    from fuse_query_spark.operators.cdc import scd2_merge

    updates = spark.createDataFrame(
        [
            (1, "platinum", "2024-03-01"),  # changed → close + insert
            (2, "silver", "2024-03-01"),  # unchanged → no-op
            (9, "gold", "2024-03-01"),  # new key → insert
        ],
        "k INT, tier STRING, change_ts STRING",
    )
    out = scd2_merge(_dim(spark), updates, key="k", tracked=["tier"]).collect()
    rows = {(r["k"], r["tier"], r["effective_from"], r["effective_to"]) for r in out}
    assert rows == {
        (1, "gold", "2024-01-01", "2024-03-01"),      # closed
        (1, "platinum", "2024-03-01", None),          # new version
        (2, "silver", "2024-01-01", None),            # untouched
        (3, "bronze", "2024-01-01", "2024-02-01"),    # history preserved
        (3, "silver", "2024-02-01", None),            # current untouched
        (9, "gold", "2024-03-01", None),              # brand new
    }


def test_scd2_merge_is_idempotent(spark):
    from fuse_query_spark.operators.cdc import scd2_merge

    updates = spark.createDataFrame([(1, "platinum", "2024-03-01")], "k INT, tier STRING, change_ts STRING")
    once = scd2_merge(_dim(spark), updates, key="k", tracked=["tier"])
    twice = scd2_merge(once, updates, key="k", tracked=["tier"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_stateful_running_totals_stream(spark, sf_dir, tmp_path):
    import shutil

    from fuse_query_spark.sources.tables import table
    from fuse_query_spark.streaming.events import read_events_stream
    from fuse_query_spark.streaming.stateful import running_user_totals

    out = str(tmp_path / "ev")
    shutil.rmtree(out, ignore_errors=True)
    table(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(out)
    stream = read_events_stream(spark, out)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode appends one row per (user, batch); the final state is
    # the row with the max n_events per user
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            "SELECT user_id, max_by(n_events, n_events) n_events, max_by(total_value, n_events) total_value "
            "FROM user_totals GROUP BY user_id"
        ).collect()
    }
    batch = {
        r["user_id"]: (r["n"], float(r["s"]))
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert set(got) == set(batch)
    for uid, (n, s) in batch.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - s) < 0.05  # python float fold vs spark sum
