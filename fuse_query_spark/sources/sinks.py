"""Partitioned parquet sinks — the write side of a 100 TB pipeline.

The reference's write surface is Table::append_data into Memory/Null
or a flat file directory (fusequery/query/src/interpreters/
interpreter_insert_into.rs:33-45; our Engine._insert mirrors it).
This module is the capability extension a training-data pipeline
actually deploys: hive-layout partitioned writes, so that every
downstream read with a partition predicate prunes to the matching
directories at PLANNING time — the scan never even lists the other
partitions' files. That directory-level pruning composes with (and
precedes) row-group statistics and predicate pushdown.

Scale posture: partition by LOW-cardinality routing columns only
(source, date, lang — tens to thousands of values). A high-cardinality
partition column is the classic small-files catastrophe: #partitions ×
#write-tasks output files. maxRecordsPerFile bounds the other extreme
(one giant file per partition). Dynamic partition overwrite replaces
ONLY the partitions present in the incoming data — the idempotent
re-run story for a daily pipeline (a failed day re-runs without
touching other days).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("source",),
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
    overwrite_mode: str = "dynamic",
) -> None:
    """Hive-layout partitioned parquet write (path/col=value/part-*).

    overwrite_mode picks the overwrite contract and the choice is
    semantic, not cosmetic:
    - "dynamic" (default): only partitions PRESENT in `df` are
      replaced — the idempotent incremental/daily-rerun story.
    - "static": the whole layout is replaced — required for full
      REBUILDS, where a partition that received no rows this time
      must disappear (dynamic would leave its stale directory
      behind, silently serving last build's rows)."""
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", overwrite_mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-layout directory; partition columns come back as
    real columns and predicates on them prune directories at planning
    time (gated in tests/test_sources.py)."""
    return spark.read.parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 512,
    partition_by: tuple[str, ...] = (),
) -> dict:
    """Small-files compaction — the maintenance pass every long-lived
    100 TB dataset needs: streaming/incremental writers leave thousands
    of KB-scale files per partition, and scan planning degrades with
    file COUNT (listing, footer reads, task scheduling) long before it
    degrades with bytes.

    Sizes the output from the INPUT's real bytes: file count =
    ceil(input_bytes / target_file_mb), one repartition (round-robin —
    no key skew by construction), optional re-partitioning into a hive
    layout. Returns {files_before, files_after, bytes, rows} so a
    scheduler can log/assert the effect.

    Posture notes: compaction is a full rewrite of `src` — run it per
    partition (src = '.../day=X') in production so the unit of rewrite
    is bounded; round-robin repartition deliberately destroys any
    incidental ordering (compaction is for file geometry; use
    write-time sortWithinPartitions/bucketing — sources/bucketed.py —
    when layout must carry clustering)."""
    import math
    import os

    def _stats(path: str) -> tuple[int, int]:
        files = bytes_ = 0
        for root, _dirs, names in os.walk(path):
            for n in names:
                if n.endswith(".parquet"):
                    files += 1
                    bytes_ += os.path.getsize(os.path.join(root, n))
        return files, bytes_

    files_before, input_bytes = _stats(src)
    n_files = max(1, math.ceil(input_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    rows = df.count()
    out = df.repartition(n_files)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst)
    files_after, _ = _stats(dst)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "input_bytes": input_bytes,
        "rows": rows,
    }
