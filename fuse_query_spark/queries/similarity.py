"""Similarity-search queries over `embeddings` (array<float>, 64-dim):
brute-force cosine top-k (oracle-checked on ids), threshold pairs with
label blocking (oracle-checked), and LSH-bucketed ANN (rows-only;
recall asserted vs brute force in tests/test_similarity.py).

Float policy: similarity *scores* are never in oracle-checked output —
dot-product op orders differ across engines in the low bits; rankings
are stable because random 64-dim cosine gaps (~1e-2) dwarf fp error
(~1e-12).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fuse_query_spark.operators.similarity import (
    brute_force_topk,
    knn_lsh,
    lsh_bucket,
    pairs_above_threshold_blas,
)
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import table


def _query_vec(spark, sf_dir, vec_id: int = 0) -> list[float]:
    row = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


@register(
    "similarity_topk_bruteforce",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity", "knn", "bruteforce"),
)
def similarity_topk_bruteforce(spark, sf_dir):
    """Exact top-10 neighbours of vec_id 0 by cosine. Plan: single scan
    → projected dot product (zip_with/aggregate, codegen) →
    TakeOrderedAndProject. No shuffle of the corpus; at 100 TB this is
    scan-bound — the right baseline."""
    qv = _query_vec(spark, sf_dir, 0)
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return brute_force_topk(e, qv, k=10).select("vec_id")


@register(
    "similarity_pairs_label_blocked",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.35
    """,
    tags=("similarity", "pairs", "blocking"),
)
def similarity_pairs_label_blocked(spark, sf_dir):
    """All same-label pairs with cosine ≥ 0.35 — the blocked quadratic
    verify step (block = label here; an LSH bucket in the unsupervised
    case), computed as one BLAS GEMM per block via applyInPandas. Ids
    only in output (see module float policy)."""
    e = table(spark, sf_dir, "embeddings")
    return pairs_above_threshold_blas(e, 0.35, block_col="label").select("id_a", "id_b")


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dups AS (
        SELECT b.vec_id AS dup_id
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.35
    )
    SELECT vec_id, label FROM embeddings
    WHERE vec_id NOT IN (SELECT dup_id FROM dups)
    """,
    tags=("dedup", "similarity", "embedding"),
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup dedup: within each block, drop every
    vector that has a lower-id neighbour at cosine ≥ τ (greedy keep-
    first — the standard semantic-dedup policy). Pair generation is the
    blocked BLAS kernel; removal is a left-anti join."""
    e = table(spark, sf_dir, "embeddings")
    dups = (
        pairs_above_threshold_blas(e, 0.35, block_col="label")
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    return e.join(dups, e.vec_id == dups.dup_id, "left_anti").select("vec_id", "label")


@register(
    "similarity_knn_lsh",
    oracle=None,  # ANN: approximate by design; recall vs brute force in tests
    tags=("similarity", "knn", "lsh", "ann"),
)
def similarity_knn_lsh(spark, sf_dir):
    """ANN top-10 for vec_id 0 via sign-LSH (8 planes, multi-probe
    Hamming≤1). Probes ~9/256 of the corpus instead of all of it."""
    qv = _query_vec(spark, sf_dir, 0)
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return knn_lsh(e, qv, k=10, n_planes=8).select("vec_id", "cos_sim").select("vec_id")


@register(
    "similarity_knn_ivf",
    oracle=None,  # ANN: approximate by design; recall vs brute force in tests
    tags=("similarity", "knn", "ivf", "ann"),
)
def similarity_knn_ivf(spark, sf_dir):
    """ANN top-10 via IVF (16 cells, 4 probes): the second scale path —
    coarse quantizer + probed exact search, scanning ~1/4 of the
    corpus. Recall vs brute force asserted in tests/test_similarity.py."""
    from fuse_query_spark.operators.similarity import knn_ivf

    qv = _query_vec(spark, sf_dir, 0)
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return knn_ivf(e, qv, k=10, k_cells=16, n_probe=4).select("vec_id")


@register(
    "similarity_bucket_histogram",
    oracle=None,  # bucket ids depend on our plane constants
    tags=("similarity", "lsh"),
)
def similarity_bucket_histogram(spark, sf_dir):
    """LSH bucket occupancy histogram — the operator a pipeline runs to
    validate bucket balance before committing to an ANN index layout."""
    e = table(spark, sf_dir, "embeddings")
    return (
        lsh_bucket(e, n_planes=8)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )
