"""Embedding / ANN lifecycle demo — the retrieval-side pipeline a
100 TB corpus runs, on the driver's test embeddings, in ~1 min on
local[32]:

  1. semantic dedup (SemDeDup)            k-means cells + per-cell GEMM
  2. PQ codebook training (Lloyd)         32x storage cut, 8x16 codes
  3. PQ encode + ADC top-k + exact rerank shortlist-bounded full reads
  4. batch IVF index build                cell-partitioned parquet
  5. streaming ingest of new vectors      exactly-once delta zone
  6. fresh search over base + delta       per-zone partition pruning
  7. compaction                           re-train + atomic swap

Usage: python examples/ann_pipeline.py [sf_dir] [work_dir]
Every stage is the SAME operator the oracle-checked registry queries
use — this file only composes them.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fuse_query_spark.operators.similarity import (
    ivf_index_write,
    knn_pq_adc_rerank,
    pq_codebooks_lloyd,
    pq_encode,
    semantic_dedup_cells,
)
from fuse_query_spark.session import get_spark
from fuse_query_spark.sources.tables import table
from fuse_query_spark.streaming.ann_index import (
    compact_index,
    index_vectors_fresh,
    ingest_into_index,
    ivf_index_search_fresh,
    read_embeddings_stream,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="ann_demo_")
    spark = get_spark("ann-pipeline-demo")
    emb = table(spark, sf_dir, "embeddings")
    n0 = emb.count()

    # 1. semantic dedup — keep one representative per near-dup group
    kept = semantic_dedup_cells(emb, threshold=0.35, k_cells=16)
    corpus = emb.join(kept.select("vec_id"), "vec_id")
    n1 = corpus.count()
    print(f"semantic dedup: {n0} -> {n1} vectors")

    # 2-3. PQ: train, encode, ADC + rerank search
    cb = pq_codebooks_lloyd(corpus, m=8, k_codes=16, iters=2)
    codes = pq_encode(corpus, cb)
    print(f"pq encode: {codes.count()} vectors -> 8-byte codes")
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    top = knn_pq_adc_rerank(corpus, cb, qv, k=5, shortlist=100).collect()
    print("adc+rerank top-5:", [r["vec_id"] for r in top])

    # 4. batch IVF index over the deduped first half
    idx = os.path.join(work, "ivf_index")
    first = corpus.filter(F.col("vec_id") % 2 == 0)
    late = corpus.filter(F.col("vec_id") % 2 == 1)
    centroids = ivf_index_write(first, idx, k_cells=8, iters=1)
    print(f"ivf index built: {spark.read.parquet(idx + '/vectors').count()} vectors")

    # 5. stream the second half into the delta zone
    src = os.path.join(work, "late_src")
    late.repartition(2).write.parquet(src)
    q = ingest_into_index(
        read_embeddings_stream(spark, src), centroids, idx, os.path.join(work, "ckpt")
    )
    q.awaitTermination(120)
    print(f"after streaming ingest: {index_vectors_fresh(spark, idx).count()} vectors")

    # 6. fresh search sees a streamed vector
    probe = late.orderBy("vec_id").first()
    hits = ivf_index_search_fresh(
        spark, idx, [float(x) for x in probe["embedding"]], k=3, n_probe=3
    ).collect()
    print(f"fresh search for streamed vec {probe['vec_id']}:",
          [r["vec_id"] for r in hits])

    # 7. compact: delta folds into a re-trained base
    compact_index(spark, idx, k_cells=8, iters=1)
    print(f"compacted: {spark.read.parquet(idx + '/vectors').count()} vectors, "
          f"delta gone: {not os.path.exists(idx + '/vectors_delta')}")


if __name__ == "__main__":
    main()
