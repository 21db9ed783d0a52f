"""ANN (sign-LSH) recall vs brute force; cosine operator sanity."""

import math

from pyspark.sql import functions as F

from fuse_query_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    knn_lsh,
    lsh_bucket,
)
from fuse_query_spark.sources.tables import table


def test_cosine_expression(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0], [0.5, 0.5])], ["id", "a", "b"])
    val = df.select(cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
    assert abs(val - 1 / math.sqrt(2)) < 1e-12


def test_bruteforce_topk_self_is_nearest(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 1).first()["embedding"]]
    top = brute_force_topk(e, q, k=3).collect()
    assert top[0]["vec_id"] == 1  # the query vector itself, cos=1
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-9


def test_knn_lsh_recall_on_planted_neighbors(spark, sf_dir):
    """Sign-LSH guarantees recall for HIGH-similarity vectors (P(bit
    agree) = 1-θ/π). Plant 5 near-copies of the query (cos≈0.99) and
    require the ANN path to find most of them; random corpus vectors at
    cos≈0.3 are not its contract."""
    e = table(spark, sf_dir, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    # deterministic near-copies: scale one coordinate slightly
    planted = []
    for i in range(5):
        v = list(q)
        v[i] = v[i] * 1.2 + 0.01
        planted.append((10_000 + i, v, -1))
    extra = spark.createDataFrame(planted, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    corpus = (
        e.filter(F.col("vec_id") != 0)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .select("vec_id", "embedding", "label")
        .union(extra)
    )
    exact = [r["vec_id"] for r in brute_force_topk(corpus, q, k=5).collect()]
    assert set(exact) == {10_000 + i for i in range(5)}  # planted are the true top-5
    approx = [r["vec_id"] for r in knn_lsh(corpus, q, k=5, n_planes=8).collect()]
    found = len(set(exact) & set(approx))
    assert found >= 4, f"found {found}/5 planted: approx={approx}"


def test_knn_ivf_recall_on_planted_neighbors(spark, sf_dir):
    from fuse_query_spark.operators.similarity import knn_ivf

    e = table(spark, sf_dir, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    planted = []
    for i in range(5):
        v = list(q)
        v[i] = v[i] * 1.2 + 0.01
        planted.append((10_000 + i, v, -1))
    extra = spark.createDataFrame(planted, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    corpus = (
        e.filter(F.col("vec_id") != 0)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .select("vec_id", "embedding", "label")
        .union(extra)
    )
    approx = [r["vec_id"] for r in knn_ivf(corpus, q, k=5, k_cells=16, n_probe=4).collect()]
    found = len(set(approx) & {10_000 + i for i in range(5)})
    # near-copies of the query land in the query's own cell
    assert found >= 4, f"found {found}/5: {approx}"


def test_knn_ivf_lloyd_recall_and_refinement(spark, sf_dir):
    """Lloyd refinement must (a) keep planted-neighbor recall and
    (b) actually move the centroids toward cell means."""
    from fuse_query_spark.operators.similarity import (
        ivf_lloyd_refine,
        knn_ivf_lloyd,
    )

    e = table(spark, sf_dir, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    planted = []
    for i in range(5):
        v = list(q)
        v[i] = v[i] * 1.2 + 0.01
        planted.append((10_000 + i, v, -1))
    extra = spark.createDataFrame(planted, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    corpus = (
        e.filter(F.col("vec_id") != 0)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .select("vec_id", "embedding", "label")
        .union(extra)
    )
    approx = [r["vec_id"] for r in knn_ivf_lloyd(corpus, q, k=5, k_cells=16, n_probe=4).collect()]
    found = len(set(approx) & {10_000 + i for i in range(5)})
    assert found >= 4, f"found {found}/5: {approx}"

    seed = [[float(x) for x in r["embedding"]] for r in corpus.limit(4).collect()]
    refined = ivf_lloyd_refine(corpus, seed, iters=1)
    assert len(refined) == len(seed) and len(refined[0]) == len(seed[0])
    assert refined != seed  # means moved


def test_ivf_assignment_covers_corpus(spark, sf_dir):
    from fuse_query_spark.operators.similarity import ivf_assign

    e = table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_assign(e, k_cells=8)
    assert len(centroids) == 8
    n = assigned.count()
    assert n == e.count()
    cells = assigned.groupBy("cell").count().collect()
    assert 1 < len(cells) <= 8  # non-degenerate partitioning


def test_lsh_bucket_is_deterministic(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings").limit(50)
    b1 = {r["vec_id"]: r["bucket"] for r in lsh_bucket(e, n_planes=8).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in lsh_bucket(e, n_planes=8).collect()}
    assert b1 == b2
    assert all(0 <= v < 256 for v in b1.values())


def test_ivf_index_persist_and_search(spark, sf_dir, tmp_path):
    """Persisted IVF index: search results must equal the in-memory
    knn_ivf_lloyd with the same parameters (same deterministic
    centroids → same probes → same exact top-k), and the probe must
    prune partitions at planning time."""
    from fuse_query_spark.operators.similarity import (
        ivf_index_search,
        ivf_index_write,
        knn_ivf_lloyd,
    )

    e = table(spark, sf_dir, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 7).first()["embedding"]]

    idx = str(tmp_path / "ivf_idx")
    centroids = ivf_index_write(e, idx, k_cells=16, iters=2)
    assert len(centroids) == 16

    got_df = ivf_index_search(spark, idx, q, k=5, n_probe=4)
    got = [(r["vec_id"], round(r["cos_sim"], 9)) for r in got_df.collect()]
    want = [
        (r["vec_id"], round(r["cos_sim"], 9))
        for r in knn_ivf_lloyd(e, q, k=5, k_cells=16, n_probe=4, iters=2).collect()
    ]
    assert got == want and got[0][0] == 7  # self is nearest

    # the probe is a partition PRUNE: cell filter reaches the scan as
    # a PartitionFilter, and only probed directories are read
    probed = ivf_index_search(spark, idx, q, k=5, n_probe=4)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan[:1500]


class TestRandomProjection:
    def test_jl_distance_preservation(self, spark, sf_dir):
        """Pairwise distances in 16-dim projected space approximate the
        64-dim originals within the JL distortion bound (~1/sqrt(16),
        checked loosely at 3x sigma over a sample)."""
        import math

        from fuse_query_spark.operators.similarity import random_projection
        from fuse_query_spark.sources.tables import table

        emb = table(spark, sf_dir, "embeddings").limit(40)
        rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
        proj = {
            r["vec_id"]: [r[f"proj{j}"] for j in range(16)]
            for r in random_projection(emb, in_dim=64, out_dim=16).collect()
        }
        ids = sorted(rows)[:20]
        ratios = []
        for a in ids:
            for b in ids:
                if a >= b:
                    continue
                d0 = math.dist(rows[a], rows[b])
                d1 = math.dist(proj[a], proj[b])
                if d0 > 1e-9:
                    ratios.append(d1 / d0)
        mean = sum(ratios) / len(ratios)
        assert 0.8 < mean < 1.2  # unbiased in expectation
        assert all(0.25 < r < 2.5 for r in ratios)  # no catastrophic collapse

    def test_projection_deterministic(self, spark, sf_dir):
        from fuse_query_spark.operators.similarity import random_projection
        from fuse_query_spark.sources.tables import table

        emb = table(spark, sf_dir, "embeddings").limit(5)
        a = random_projection(emb, 64, 16).orderBy("vec_id").collect()
        b = random_projection(emb, 64, 16).orderBy("vec_id").collect()
        assert a == b

    def test_sign_matrix_balanced(self):
        """md5-parity signs are ~balanced (no constant row/col)."""
        from fuse_query_spark.operators.similarity import _rademacher_signs

        s = _rademacher_signs(64, 16)
        total = sum(sum(r) for r in s)
        assert abs(total) < 64 * 16 * 0.2
        assert all(abs(sum(r)) < 16 for r in s)  # no all-same row

    def test_projection_preserves_strong_pairs(self, spark, sf_dir):
        """The production property: every STRONG near-dup pair (64-dim
        cosine >= 0.35 — the dedup threshold) keeps a clearly-elevated
        cosine in 16-dim projected space, so projection-side pruning
        never drops true duplicates. (Top-10 rank recall is NOT tested:
        on this isotropic corpus the non-dup 'neighbours' are noise
        ties with gaps below the JL distortion, so rank overlap there
        is meaningless by construction.)"""
        import math

        from fuse_query_spark.operators.similarity import (
            pairs_above_threshold_blas,
            random_projection,
        )
        from fuse_query_spark.sources.tables import table

        e = table(spark, sf_dir, "embeddings")
        strong = pairs_above_threshold_blas(e, 0.35, block_col="label").collect()
        assert strong, "corpus must contain planted near-dup pairs"
        proj = {
            r["vec_id"]: [r[f"proj{j}"] for j in range(16)]
            for r in random_projection(e, 64, 16).collect()
        }

        def cos(a, b):
            num = sum(x * y for x, y in zip(a, b))
            return num / (math.hypot(*a) * math.hypot(*b))

        pair_cos = [cos(proj[r["id_a"]], proj[r["id_b"]]) for r in strong]
        assert min(pair_cos) > 0.1  # strong pairs survive projection
        # while typical unrelated pairs sit near zero
        ids = sorted(proj)[:30]
        bg = [cos(proj[a], proj[b]) for a in ids for b in ids if a < b]
        assert abs(sum(bg) / len(bg)) < 0.15
