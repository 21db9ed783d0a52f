"""Partition-lifecycle demo — the day-2 operations a partitioned
warehouse actually runs, end-to-end through the SQL engine:

  1. CREATE TABLE … PARTITION BY (day)         (hive layout)
  2. daily INSERTs (clustered writes)           (1 file/partition/insert)
  3. system.parts                               (which partitions grew messy?)
  4. OPTIMIZE TABLE PARTITION (day='…')         (bytes-sized compaction)
  5. INSERT OVERWRITE (one-day backfill)        (dynamic overwrite, idempotent)
  6. CREATE/REFRESH MATERIALIZED VIEW           (per-partition recompute)
  7. ALTER TABLE DROP PARTITION                 (retention)

Usage: python examples/partitioned_warehouse.py [sf_dir]
Every statement is plain engine SQL — this file only sequences them.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuse_query_spark.engine import Engine
from fuse_query_spark.session import get_spark


def show(df, label):
    print(f"\n-- {label}")
    for r in df.collect():
        print("  ", tuple(r))


def main() -> None:
    spark = get_spark()
    eng = Engine(spark=spark)
    root = tempfile.mkdtemp(prefix="warehouse_")
    loc, mv_loc = f"{root}/sales", f"{root}/daily_mv"

    # 1. partitioned fact table
    eng.sql(
        f"CREATE TABLE sales(v bigint, qty bigint, day string) "
        f"ENGINE = Parquet PARTITION BY (day) location = '{loc}'"
    )

    # 2. three "daily" ingest runs — each insert appends one file per
    # partition it touches (clustered write), so file count grows with
    # ingest cadence, not task count
    for i in range(3):
        eng.sql(
            f"INSERT INTO sales SELECT number + {100 * i}, number % 7, "
            "if(number % 2 = 0, '2026-08-01', '2026-08-02') FROM numbers(20)"
        )

    # 3. the operator's view: which partitions need compaction?
    show(
        eng.sql(
            "SELECT partition, files, bytes, rows FROM system.parts "
            "WHERE name = 'sales' ORDER BY partition"
        ),
        "system.parts after 3 ingests (3 files per partition)",
    )

    # 4. compact ONE subtree — the unit of rewrite is a partition
    show(
        eng.sql("OPTIMIZE TABLE sales PARTITION (day='2026-08-01')"),
        "OPTIMIZE day=2026-08-01",
    )

    # 5. idempotent one-day backfill: only day 02 is replaced,
    # re-running it converges (no duplication)
    for _ in range(2):
        eng.sql(
            "INSERT OVERWRITE sales SELECT number + 9000, number % 7, "
            "'2026-08-02' FROM numbers(10)"
        )
    show(
        eng.sql(
            "SELECT day, count(1) AS n, min(v) AS lo FROM sales "
            "GROUP BY day ORDER BY day"
        ),
        "after running the day-02 backfill TWICE (idempotent)",
    )

    # 6. precomputed daily rollup; refresh only the backfilled day —
    # the partition predicate pushes into the base scan (one day read)
    eng.sql(
        f"CREATE MATERIALIZED VIEW daily PARTITION BY (day) "
        f"location = '{mv_loc}' "
        "AS SELECT day, count(1) AS n, sum(v) AS s FROM sales GROUP BY day"
    )
    eng.sql("INSERT INTO sales SELECT 1, 1, '2026-08-02' FROM numbers(1)")
    eng.sql("REFRESH MATERIALIZED VIEW daily PARTITION (day='2026-08-02')")
    show(eng.sql("SELECT * FROM daily ORDER BY day"), "materialized daily rollup")

    # 7. retention: dropping an expired day removes one directory
    eng.sql("ALTER TABLE sales DROP PARTITION (day='2026-08-01')")
    show(eng.sql("SHOW PARTITIONS sales"), "partitions after retention drop")

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
