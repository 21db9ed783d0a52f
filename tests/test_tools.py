"""Invariants of the measurement tools (tools/scaling_probe.py): the
replication scheme must preserve dup structure within copies and
create none across copies — otherwise its slopes measure an artifact."""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "tools")

from fuse_query_spark.sources.tables import table


def test_replicated_copies_are_disjoint_and_salted(spark, sf_dir):
    from scaling_probe import replicated

    base = table(spark, sf_dir, "documents").limit(100)
    rep = replicated(base, 3)
    n = base.count()
    assert rep.count() == 3 * n
    assert rep.select("doc_id").distinct().count() == 3 * n  # ids disjoint

    # no token is shared between copies (per-copy vocabulary salt):
    # tokens of copy 0 start with c0, copy 1 with c1, ...
    toks = rep.select(
        (F.col("doc_id") / 10_000_000).cast("int").alias("copy"),
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    )
    cross = (
        toks.groupBy("tok")
        .agg(F.count_distinct("copy").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .count()
    )
    assert cross == 0
