"""threshold_topk (operators/topk.py): exactness vs the plain
TakeOrdered plan under ties, NULLs, NaNs, both directions, and the
small-input fallback. The operator's contract pins NULLS LAST in both
directions, so every comparison here uses the same pinned ordering on
the plain side."""

import random

import pytest
from pyspark.sql import functions as F

from fuse_query_spark.operators.topk import threshold_topk


def _plain(df, col, k, desc):
    o = F.col(col).desc_nulls_last() if desc else F.col(col).asc_nulls_last()
    return df.orderBy(o).limit(k)


def _key(rows, col):
    return sorted((r[col] is None, r[col] if r[col] is not None else 0) for r in rows)


@pytest.fixture(scope="module")
def tied_df(spark):
    random.seed(7)
    data = [(random.randint(0, 50),) for _ in range(200_000)] + [(None,)] * 100
    return spark.createDataFrame(data, "v: int").repartition(8).persist()


@pytest.mark.parametrize("desc", [True, False])
def test_matches_plain_under_heavy_ties_and_nulls(spark, tied_df, desc):
    a = threshold_topk(tied_df, "v", 37, descending=desc, min_rows=10).collect()
    b = _plain(tied_df, "v", 37, desc).collect()
    assert len(a) == 37
    assert _key(a, "v") == _key(b, "v")


def test_exact_on_adversarial_order(spark):
    """Ascending input, descending sort — the worst case for the
    per-partition heap, and the case the threshold path accelerates."""
    df = spark.range(20_000_000).withColumnRenamed("id", "number")
    rows = threshold_topk(df, "number", 100, min_rows=1000).collect()
    assert [r.number for r in rows] == list(range(19_999_999, 19_999_899, -1))


def test_small_input_falls_back(spark):
    df = spark.range(1000).withColumnRenamed("id", "number")
    rows = threshold_topk(df, "number", 10).collect()  # default min_rows
    assert [r.number for r in rows] == list(range(999, 989, -1))


def test_k_exceeding_rows_returns_all(spark):
    df = spark.range(500).withColumnRenamed("id", "number")
    assert threshold_topk(df, "number", 10_000, min_rows=10).count() == 500


def test_nan_rows_stay_on_top(spark):
    """Spark orders NaN above every other double; the threshold filter
    must keep NaN rows (NaN >= thr is true in Spark's ordering), so
    the result matches the plain plan."""
    data = [(float(i),) for i in range(100_000)] + [(float("nan"),)] * 5
    df = spark.createDataFrame(data, "x: double").repartition(4)
    a = threshold_topk(df, "x", 10, min_rows=10).collect()
    b = _plain(df, "x", 10, True).collect()
    import math

    assert sum(1 for r in a if math.isnan(r.x)) == 5
    assert sorted(str(r.x) for r in a) == sorted(str(r.x) for r in b)


def test_all_null_column_falls_back(spark):
    df = spark.createDataFrame([(None,)] * 50_000, "v: int")
    assert threshold_topk(df, "v", 5, min_rows=10).count() == 5


def test_tie_breaker_columns_respected(spark):
    df = (
        spark.range(100_000)
        .select((F.col("id") % 10).alias("g"), F.col("id").alias("k"))
        .repartition(8)
    )
    a = threshold_topk(
        df, "g", 20, min_rows=10, tie_breakers=[F.col("k").asc()]
    ).collect()
    b = df.orderBy(F.col("g").desc_nulls_last(), F.col("k").asc()).limit(20).collect()
    assert [(r.g, r.k) for r in a] == [(r.g, r.k) for r in b]


def test_null_heavy_column_sample_stays_bounded(spark):
    """code-review r8: the sample fraction is sized from the NON-NULL
    count; sampling must therefore also exclude NULLs or a NULL-heavy
    column collects n_total*f >> sample_target driver rows. Correctness
    check at small scale (forcing the threshold path): 90% NULLs, the
    result must equal the plain plan exactly."""
    from fuse_query_spark.operators.topk import threshold_topk

    df = spark.range(0, 50_000).selectExpr(
        "CASE WHEN id % 10 = 0 THEN cast(id as double) ELSE NULL END AS v", "id"
    )
    n_notnull = 5_000
    got = threshold_topk(
        df, "v", 20, min_rows=0, n_rows=n_notnull, sample_target=1_000
    ).collect()
    want = df.orderBy(F.col("v").desc_nulls_last()).limit(20).collect()
    assert [r.v for r in got] == [r.v for r in want]


@pytest.mark.parametrize("desc", [True, False])
@pytest.mark.parametrize("k", [65, 100, 150])
def test_exact_beyond_sample_floor_k_gt_64(spark, desc, k):
    """judge r8 fix: for k > 64 the old j = max(64, ceil(2kf)) left the
    deterministic survivor floor at 64 < k whenever 2kf < 64 (any large
    n), so exactness rested on sample concentration. j now includes k —
    the j sampled rows at-or-beyond the threshold are j distinct input
    rows the filter keeps, so >= k survivors is certain. Adversarial
    duplicate-heavy distribution: a huge tied plateau right at the
    boundary (most of the top-k are ties) plus a thin unique tail, with
    sample_target sized so ceil(2kf) << k and the k term is the one
    doing the work."""
    random.seed(k)
    # 240k rows: 95% from 12 duplicate-heavy values, 5% unique tail
    data = [(random.choice([0, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144]),) for _ in range(228_000)]
    data += [(1000 + i,) for i in range(12_000)]
    df = spark.createDataFrame(data, "v: int").repartition(8)
    # f = 1000/240k ≈ 0.0042 -> ceil(2kf) <= 2 for every k here
    a = threshold_topk(
        df, "v", k, descending=desc, min_rows=0, n_rows=240_000, sample_target=1_000
    ).collect()
    b = _plain(df, "v", k, desc).collect()
    assert len(a) == k
    assert _key(a, "v") == _key(b, "v")


def test_strict_mode_falls_back_when_under_k(spark):
    """strict=True verifies the survivor set and falls back to the
    plain plan deterministically; with a sane threshold it returns the
    same exact top-k."""
    from fuse_query_spark.operators.topk import threshold_topk

    df = spark.range(0, 100_000).selectExpr("cast(id as double) AS v", "id")
    got = threshold_topk(
        df, "v", 50, min_rows=0, n_rows=100_000, sample_target=2_000, strict=True
    ).collect()
    assert [r.v for r in got] == [float(99_999 - i) for i in range(50)]
