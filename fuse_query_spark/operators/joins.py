"""Join operators beyond Spark's built-ins: as-of join and range join.

Spark has no native ASOF JOIN (the guide's canonical gap). The naive
formulation — inequality join + per-left-row max — explodes into a
cartesian-ish range join. The scalable formulation used here is
union + window:

    tag left/right rows, union them, sort within (key) by (ts,
    right-before-left), carry the right row's payload forward with
    last_value(ignoreNulls) over rows-unbounded-preceding, keep left
    rows.

One shuffle on the key (same as any keyed join), no row explosion,
and the window state is a single row — this survives 100 TB where the
inequality-join version dies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts within the same `on` key (nulls when no such
    row). Matches DuckDB's `ASOF JOIN … ON l.key = r.key AND l.ts >=
    r.ts` (LEFT variant).

    Ties: a right row with right_ts == left_ts matches (<=); multiple
    right rows sharing right_ts resolve to the last one in (ts,
    input-order) — pre-deduplicate the right side for full
    determinism.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols])

    l_tag = left.withColumn("__is_left", F.lit(1)).withColumn("__payload", F.lit(None).cast(
        "struct<" + ",".join(
            [f"__ts:{dict(right.dtypes)[right_ts]}"]
            + [f"{c}:{dict(right.dtypes)[c]}" for c in right_cols]
        ) + ">"
    )).withColumn("__ts_sort", F.col(left_ts))
    r_tag = right.select(
        F.col(on),
        F.lit(0).alias("__is_left"),
        payload.alias("__payload"),
        F.col(right_ts).alias("__ts_sort"),
    )
    # left rows need all their columns; right rows only key+payload
    r_full = r_tag
    for c in left.columns:
        if c not in (on,):
            r_full = r_full.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tag.select(*left.columns, "__is_left", "__payload", "__ts_sort").unionByName(
        r_full.select(*left.columns, "__is_left", "__payload", "__ts_sort")
    )
    # right rows sort BEFORE left rows at equal ts (so ts-equal rights match)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts_sort").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1).select(
        *left.columns,
        F.col("__match.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) left side gets a
    deterministic salt derived from a hash of its other columns; the
    (smaller) right side is replicated n_salt times. The shuffle key
    becomes (on, salt), splitting a hot key across n_salt reducers.

    AQE's skew-join handles most cases automatically; this is the
    explicit form for when a single key exceeds what AQE can split
    (e.g. one join key holding >50% of a 100 TB fact). Deterministic —
    no rand() — so retried tasks produce identical output.

    Only inner/left/semi/anti shapes are sound: the right side is
    REPLICATED n_salt times, so right/full outer would emit n_salt
    copies of every unmatched right row — rejected loudly."""
    norm = how.lower().replace("_", "")
    if norm in ("right", "rightouter", "full", "fullouter", "outer"):
        raise ValueError(
            f"salted_join cannot run how={how!r}: the replicated right side "
            "would duplicate unmatched right rows n_salt times"
        )
    salt = F.pmod(
        F.xxhash64(*[c for c in left.columns if c != on]), F.lit(n_salt)
    ).alias("__salt")
    l_salted = left.withColumn("__salt", salt)
    r_rep = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = l_salted.join(r_rep, [on, "__salt"], how)
    return out.drop("__salt")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """All (left, right) pairs within the same key whose timestamps are
    within max_gap_seconds — bucketized so the join is equi on
    (key, bucket) instead of a full inequality join: each left row
    probes its own and the previous bucket, bounding fan-out.
    """
    bucket = lambda c: (F.unix_micros(F.col(c)) / F.lit(max_gap_seconds * 1_000_000)).cast("long")  # noqa: E731
    l = left.withColumn("__b", bucket(left_ts))
    l = l.withColumn("__probe", F.explode(F.array(F.col("__b"), F.col("__b") - 1)))
    r = right.withColumn("__b", bucket(right_ts))
    joined = l.join(
        r,
        (l[on] == r[on]) & (l["__probe"] == r["__b"]),
    )
    gap_ok = (
        F.abs(F.unix_micros(l[left_ts]) - F.unix_micros(r[right_ts]))
        <= max_gap_seconds * 1_000_000
    ) & (r[right_ts] <= l[left_ts])
    return joined.filter(gap_ok)
