"""Continuous-crawl dedup lifecycle demo — the incremental path a
100 TB corpus runs between full curation passes, on the driver's test
corpus, in ~1 min on local[32]:

  1. build the persisted LSH band index     one pass over the corpus
  2. batch decide: new slice vs the index   broadcast-into-scan join
  3. land the keepers, append their bands   index grows incrementally
  4. streaming ingest (foreachBatch)        batch N+1 dedups vs batch N
     + intra_batch="drop"                   same-batch near-dups too
     + compact_every_files                  auto-compaction trigger
  5. replay the stream, fresh checkpoint    corpus CONVERGES (no dups)
  6. manual compaction                      lsh_index_compact swap

Usage: python examples/incremental_dedup_pipeline.py [sf_dir] [work_dir]
Every stage is the SAME operator the oracle-checked registry query
`dedup_incremental_index` uses — this file only composes them.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fuse_query_spark.operators.dedup_index import (
    _index_data_file_count,
    dedup_against_index,
    ingest_dedup_stream,
    lsh_index_append,
    lsh_index_compact,
    lsh_index_write,
)
from fuse_query_spark.session import get_spark
from fuse_query_spark.sources.tables import table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="dedup_demo_")
    spark = get_spark("incremental-dedup-demo")
    d = table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    crawl1 = d.filter(F.col("source") == "src0").drop("source")
    crawl2 = d.filter(F.col("source") == "src1").drop("source")
    base = d.filter(~F.col("source").isin("src0", "src1")).drop("source")

    # 1. the standing artifact: band index over the landed corpus
    idx = os.path.join(work, "lsh_index")
    corpus = os.path.join(work, "corpus")
    base.write.parquet(corpus)
    lsh_index_write(base, idx, k=8, bands=4)
    print(f"index built over {base.count()} docs")

    # 2. a new crawl decided against it — one narrow index scan,
    #    the batch's band rows broadcast in
    dec = dedup_against_index(
        crawl1, spark.read.parquet(corpus), spark, idx, threshold=0.2
    )
    kept = crawl1.join(
        dec.filter(~F.col("is_dup")).select(F.col("id_new").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    n_new, n_kept = crawl1.count(), kept.count()
    print(f"crawl 1: {n_new} docs -> {n_kept} kept, {n_new - n_kept} near-dups dropped")

    # 3. land the keepers and grow the index (no rebuild)
    kept.write.mode("append").parquet(corpus)
    lsh_index_append(kept, idx, k=8, bands=4)

    # 4. the same flow as a stream: crawl 2 arrives in 2 micro-batches
    inbox = os.path.join(work, "inbox")
    crawl2.repartition(2).write.parquet(inbox)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    decisions = os.path.join(work, "decisions")
    ingest_dedup_stream(
        stream, spark, idx, corpus, decisions, os.path.join(work, "ckpt1"),
        threshold=0.2,
        intra_batch="drop",        # same-batch near-dups: smallest id wins
        compact_every_files=64,    # auto-recompact once appends fragment
    )
    n_corpus = spark.read.parquet(corpus).count()
    print(f"after streaming crawl 2: corpus {n_corpus} docs")

    # 5. replay the whole inbox with a FRESH checkpoint — every
    #    replayed doc matches its own landed copy at jaccard 1.0
    stream2 = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    ingest_dedup_stream(
        stream2, spark, idx, corpus, decisions, os.path.join(work, "ckpt2"),
        threshold=0.2, intra_batch="drop",
    )
    n_after = spark.read.parquet(corpus).count()
    print(f"replayed inbox, fresh checkpoint: corpus {n_after} docs "
          f"(converged: {n_after == n_corpus})")

    # 6. periodic compaction: staging rebuild + rename swap folds all
    #    appends; decisions before/after identical by construction
    before = _index_data_file_count(idx)
    lsh_index_compact(spark, idx, corpus, k=8, bands=4)
    print(f"compacted index: {before} -> {_index_data_file_count(idx)} data files, "
          f"{spark.read.parquet(idx + '/bands').count()} band rows")


if __name__ == "__main__":
    main()
