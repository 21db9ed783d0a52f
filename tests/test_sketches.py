"""HLL sketch rollup: accuracy vs exact, merge-consistency, and the
fixed-size-rollup property that makes the pattern work at 100 TB."""

from pyspark.sql import functions as F

from fuse_query_spark.operators.sketches import (
    daily_uniq_sketches,
    global_uniq_estimate,
    rollup_uniq_estimate,
)
from fuse_query_spark.sources.tables import table


def test_rollup_estimate_within_5pct_of_exact(spark, sf_dir):
    """High-cardinality key (event_id): merged-rollup estimate lands
    within the HLL error envelope of the exact distinct count."""
    ev = table(spark, sf_dir, "events")
    sk = daily_uniq_sketches(ev, key_col="event_id")
    est = global_uniq_estimate(sk).collect()[0]["uniq_estimate"]
    exact = ev.agg(F.countDistinct("event_id")).collect()[0][0]
    assert exact > 100  # the test is vacuous on a low-cardinality key
    assert abs(est - exact) / exact < 0.05


def test_merge_consistency_daily_vs_direct(spark, sf_dir):
    """Merging per-day sketches estimates the same range as one sketch
    built directly over it, within sketch resolution (DataSketches'
    union gadget re-targets the register type, so estimates are
    merge-consistent, not bit-identical — both sit inside the same
    ~1.6% RSE envelope)."""
    ev = table(spark, sf_dir, "events")
    merged = global_uniq_estimate(daily_uniq_sketches(ev, key_col="event_id"))
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("event_id", F.lit(12))).alias(
            "uniq_estimate"
        )
    )
    m = merged.collect()[0]["uniq_estimate"]
    d = direct.collect()[0]["uniq_estimate"]
    assert abs(m - d) / d < 0.02
    exact = ev.agg(F.countDistinct("event_id")).collect()[0][0]
    assert abs(m - exact) / exact < 0.05 and abs(d - exact) / exact < 0.05


def test_rollup_conserves_events_and_is_fixed_size(spark, sf_dir):
    """n_events is conserved through the rollup, the weekly grain
    partitions the days, and sketch payloads stay bounded (~2^lgk
    bytes) regardless of the day's row count — the property that makes
    the rollup table O(days), not O(events)."""
    ev = table(spark, sf_dir, "events")
    sk = daily_uniq_sketches(ev).cache()
    wk = rollup_uniq_estimate(sk, "week")
    assert (
        wk.agg(F.sum("n_events")).collect()[0][0]
        == ev.count()
        == sk.agg(F.sum("n_events")).collect()[0][0]
    )
    sizes = [r[0] for r in sk.select(F.length("sketch")).collect()]
    assert max(sizes) < 64 * 1024
    per_day = {r["day"] for r in sk.select("day").collect()}
    assert len(per_day) == sk.count()  # one sketch row per day
    sk.unpersist()


def test_weekly_estimates_bounded_by_daily_sum(spark, sf_dir):
    """Each week's distinct estimate is <= the sum of its days'
    estimates (union bound) and >= the max single day (containment),
    within HLL error (3% slack)."""
    ev = table(spark, sf_dir, "events")
    sk = daily_uniq_sketches(ev, key_col="event_id").cache()
    daily = [
        (r["day"], r["est"])
        for r in sk.select(
            "day", F.hll_sketch_estimate("sketch").alias("est")
        ).collect()
    ]
    weekly = {
        r["bucket"]: r["uniq_estimate"]
        for r in rollup_uniq_estimate(sk, "week").collect()
    }
    import collections
    import datetime

    by_week = collections.defaultdict(list)
    for day, est in daily:
        wk = day - datetime.timedelta(days=day.weekday())
        by_week[wk].append(est)
    for wk, ests in by_week.items():
        assert weekly[wk] <= sum(ests) * 1.03
        assert weekly[wk] >= max(ests) * 0.97
    sk.unpersist()


class TestTopKSketch:
    def test_topk_sketch_exact_at_low_cardinality(self, spark, sf_dir):
        """event_type cardinality << max_items_tracked, so the
        frequent-items sketch degenerates to exact counts: every
        (week, item) count from the rollup must equal the true count,
        and the top-3 count multiset must match the exact rollup's."""
        from fuse_query_spark.operators.sketches import (
            daily_topk_sketches,
            rollup_topk_estimate,
        )

        ev = table(spark, sf_dir, "events")
        est = rollup_topk_estimate(daily_topk_sketches(ev), k=3, grain="week").collect()
        exact = {
            (r["week"], r["event_type"]): r["n"]
            for r in ev.groupBy(
                F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert est, "rollup must produce rows"
        for r in est:
            assert exact[(r["bucket"], r["item"])] == r["cnt"]
        import collections

        top3 = collections.defaultdict(list)
        for (wk, _), n in exact.items():
            top3[wk].append(n)
        for wk in top3:
            top3[wk] = sorted(top3[wk], reverse=True)[:3]
        got = collections.defaultdict(list)
        for r in est:
            got[r["bucket"]].append(r["cnt"])
        for wk, cnts in got.items():
            assert sorted(cnts, reverse=True) == top3[wk]

    def test_topk_merge_consistency(self, spark, sf_dir):
        """Combining daily sketches must equal sketching the whole
        range directly (exact regime ⇒ strict equality)."""
        from fuse_query_spark.operators.sketches import (
            daily_topk_sketches,
            rollup_topk_estimate,
        )

        ev = table(spark, sf_dir, "events")
        merged = {
            (r["bucket"], r["item"]): r["cnt"]
            for r in rollup_topk_estimate(
                daily_topk_sketches(ev), k=5, grain="year"
            ).collect()
        }
        direct = {
            (r["bucket"], r["item"]): r["cnt"]
            for r in rollup_topk_estimate(
                ev.groupBy(F.to_date("ts").alias("day")).agg(
                    F.expr("approx_top_k_accumulate(event_type, 10000)").alias("sketch"),
                    F.count(F.lit(1)).alias("n_events"),
                ),
                k=5,
                grain="year",
            ).collect()
        }
        assert merged == direct and merged


def test_mixed_lgk_rollup_escape_hatch(spark):
    """code-review r8: a rollup table appended across lgk config
    changes holds mixed sketches; the default union rejects them and
    the functions now expose allow_different_lgk to recover."""
    import pytest as _pytest

    from fuse_query_spark.operators.sketches import (
        daily_uniq_sketches,
        global_uniq_estimate,
    )

    ev = spark.range(0, 2000).selectExpr(
        "cast(id % 500 as string) AS user_id",
        "timestamp_seconds(1700000000 + id * 3600) AS ts",
    )
    mixed = daily_uniq_sketches(ev, lgk=12).union(daily_uniq_sketches(ev, lgk=14))
    with _pytest.raises(Exception):
        global_uniq_estimate(mixed).collect()
    row = global_uniq_estimate(mixed, allow_different_lgk=True).collect()[0]
    assert abs(row.uniq_estimate - 500) / 500 < 0.05


def test_topk_sketch_quoted_key_col(spark):
    """code-review r8: key_col goes through the SQL parser; names the
    parser can't take bare (hyphens, spaces) must work like the typed
    HLL twin."""
    from fuse_query_spark.operators.sketches import daily_topk_sketches

    ev = spark.range(0, 300).selectExpr(
        "concat('t', cast(id % 3 as string)) AS `event-type`",
        "timestamp_seconds(1700000000 + id * 60) AS ts",
    )
    out = daily_topk_sketches(ev, key_col="event-type").collect()
    assert out and all(r.n_events > 0 for r in out)
