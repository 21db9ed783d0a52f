"""End-to-end training-data curation demo — the full pass a 100 TB
pipeline runs, on the driver's test corpus, in ~30 s on local[32]:

  1. PII redaction + quality/repetition scoring  (scan-side Columns)
  2. exact + chunk-level + MinHash-LSH dedup     (banded, not O(n^2))
  3. duplicate-cluster resolution                (connected components)
     + SoftDeDup sampling weights                (reweight, not drop)
  4. decontamination vs an eval set              (n-gram hash join)
     + DSIR target-domain selection              (hashed-ngram models)
  5. leakage-safe train/val/test split           (component-keyed)
  6. funnel + vocabulary + BPE-budget reports    (observability)
  7. compacted partitioned parquet landing zone  (write side)

Usage: python examples/curation_pipeline.py [sf_dir] [out_dir]
Every stage is the SAME operator the oracle-checked registry queries
use — this file only composes them.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fuse_query_spark.operators.dedup import (
    connected_components,
    jaccard_verify,
    lsh_candidate_pairs_md5,
    minhash_signatures_md5,
)
from fuse_query_spark.operators.dedup import soft_dedup_weights
from fuse_query_spark.operators.sampling import (
    contaminated_ids,
    dsir_select,
    leakage_safe_split,
)
from fuse_query_spark.operators.text import (
    chunk_dup_fraction,
    pii_counts,
    quality_score,
    redact_pii,
    token_count,
)
from fuse_query_spark.queries import load_registry
from fuse_query_spark.session import get_spark
from fuse_query_spark.sources.sinks import write_partitioned
from fuse_query_spark.sources.tables import table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curated_")
    spark = get_spark("curation-pipeline-demo")
    docs = table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. per-row stages: redact, score (one scan, no shuffle)
    scored = docs.select(
        "doc_id",
        "source",
        "lang",
        redact_pii("text").alias("text"),
        quality_score("text").alias("quality"),
        token_count("text").alias("n_tokens"),
        *pii_counts("text"),
    )

    # 2a. chunk-level dup scoring -> drop mostly-duplicated docs
    chunk_frac = chunk_dup_fraction(docs, 32, 32).select("doc_id", "dup_chunk_frac")
    scored = scored.join(chunk_frac, "doc_id").filter(F.col("dup_chunk_frac") < 0.8)

    # 2b. near-dup pairs -> 3. clusters -> keep canonical per cluster
    sigs = minhash_signatures_md5(docs, k=8)
    pairs = jaccard_verify(docs, lsh_candidate_pairs_md5(sigs, k=8, bands=4), threshold=0.2)
    cc = connected_components(pairs)
    scored = scored.join(F.broadcast(cc), "doc_id", "left").filter(
        F.col("component").isNull() | (F.col("component") == F.col("doc_id"))
    )
    # 3b. SoftDeDup: carry the cluster-size sampling weight so the
    # trainer can REWEIGHT canonical docs whose family was large,
    # instead of losing that signal with the hard drop above
    weights = soft_dedup_weights(docs, pairs).select("doc_id", "weight_r6")
    scored = scored.join(weights, "doc_id")

    # 4. decontaminate: drop docs sharing 4-grams with the "eval" slice
    evals = docs.filter(F.col("doc_id") % 97 == 0)
    contaminated = contaminated_ids(docs, evals, n=4).select("doc_id")
    scored = scored.join(contaminated, "doc_id", "left_anti")

    # 4b. DSIR: keep docs distributed like the target domain (exact
    # cut here; cut="approx" is the no-global-sort path at scale)
    selected = dsir_select(docs).filter(F.col("selected") == 1).select("doc_id")
    dsir_kept = scored.join(selected, "doc_id", "left_semi").count()
    print(f"DSIR would select {dsir_kept} of the surviving docs for a "
          "target-domain run (kept as a report; the demo lands the full set)")

    # 5. leakage-safe split (components share a split by construction)
    split = leakage_safe_split(docs, pairs).select("doc_id", "split")
    curated = scored.join(split, "doc_id")

    # 6. observability: the oracle-checked report queries
    reg = load_registry()
    funnel = reg["pipeline_filter_funnel"].fn(spark, sf_dir)
    vocab = reg["corpus_vocab_stats"].fn(spark, sf_dir)
    bpe = reg["text_bpe_segment"].fn(spark, sf_dir)
    token_budget = bpe.agg(F.sum("n_bpe_tokens").alias("total")).collect()[0]["total"]

    # 7. land partitioned by split (hive layout, downstream pruning)
    write_partitioned(curated, out_dir, partition_by=("split",))

    n1 = curated.count()
    print(f"docs in: {n0}; curated out: {n1} ({n1 / n0:.1%} retained)")
    print("per-split:", {r["split"]: r["n"] for r in
          curated.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()})
    print("funnel:")
    funnel.orderBy("source").show(5, truncate=False)
    print("vocab:", vocab.collect()[0].asDict())
    print(f"BPE token budget (corpus, real merge table): {token_budget}")
    print(f"landed at: {out_dir}")


if __name__ == "__main__":
    main()
