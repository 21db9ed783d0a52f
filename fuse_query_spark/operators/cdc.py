"""CDC / slowly-changing-dimension operators.

Spark without Delta has no MERGE INTO; the batch SCD2 emulation is the
standard anti-join + union formulation (guide §Common OLAP patterns):
close changed rows, append new versions, pass history through. All
joins are keyed equi-joins (one shuffle each, broadcast when the
update batch is small — the usual case: daily updates ≪ dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str = "change_ts",
    eff_from: str = "effective_from",
    eff_to: str = "effective_to",
) -> DataFrame:
    """Type-2 merge: `dim` rows carry (key, tracked…, eff_from,
    eff_to — NULL means current); `updates` carries (key, tracked…,
    ts_col). A key whose tracked values differ from its current row is
    closed at ts and re-inserted; unseen keys insert as new-current.
    Unchanged updates are no-ops (idempotent re-runs)."""
    history = dim.filter(F.col(eff_to).isNotNull())
    current = dim.filter(F.col(eff_to).isNull())

    u = updates.select(
        F.col(key), *[F.col(c).alias(f"__u_{c}") for c in tracked], F.col(ts_col).alias("__u_ts")
    )
    j = current.join(u, key, "left")
    diff = F.lit(False)
    for c in tracked:
        diff = diff | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    has_update = F.col("__u_ts").isNotNull()

    unchanged_current = j.filter(~has_update | ~diff).select(*dim.columns)
    closed = j.filter(has_update & diff).select(
        *[F.col(c) for c in dim.columns if c != eff_to],
        F.col("__u_ts").alias(eff_to),
    ).select(*dim.columns)
    new_versions = j.filter(has_update & diff).select(
        F.col(key),
        *[F.col(f"__u_{c}").alias(c) for c in tracked],
        F.col("__u_ts").alias(eff_from),
        F.lit(None).cast(dict(dim.dtypes)[eff_to]).alias(eff_to),
    ).select(*dim.columns)
    brand_new = (
        updates.join(current.select(key), key, "left_anti")
        .select(
            F.col(key),
            *[F.col(c) for c in tracked],
            F.col(ts_col).alias(eff_from),
            F.lit(None).cast(dict(dim.dtypes)[eff_to]).alias(eff_to),
        )
        .select(*dim.columns)
    )
    return history.unionByName(unchanged_current).unionByName(closed).unionByName(
        new_versions
    ).unionByName(brand_new)
