

class TestDsirSelect:
    """DSIR importance selection (operators/sampling.py:dsir_select):
    the oracle query pins hashes/scores bit-exact; these pin the
    SEMANTICS — cut size and direction of the importance weights."""

    def test_cut_size_and_direction(self, spark, sf_dir):
        import math

        from fuse_query_spark.operators.sampling import dsir_select
        from fuse_query_spark.sources.tables import table

        rows = dsir_select(table(spark, sf_dir, "documents")).collect()
        n = len(rows)
        assert n > 0
        k = sum(r["selected"] for r in rows)
        assert k == math.ceil(0.1 * n)
        # every selected doc outranks (rounded score, id) every
        # unselected doc — the deterministic top-frac contract
        sel = sorted(
            ((-r["logw_r"], r["doc_id"]) for r in rows if r["selected"])
        )
        uns = sorted(
            ((-r["logw_r"], r["doc_id"]) for r in rows if not r["selected"])
        )
        assert not uns or sel[-1] < uns[0]

    def test_selected_docs_look_like_target(self, spark, sf_dir):
        """Selection must pull toward the target distribution: mean
        English-stopword density of the selected decile exceeds the
        corpus mean (the entire point of DSIR)."""
        from pyspark.sql import functions as F

        from fuse_query_spark.operators.sampling import dsir_select
        from fuse_query_spark.operators.text import STOPWORDS, tokens
        from fuse_query_spark.sources.tables import table

        docs = table(spark, sf_dir, "documents")
        dens = docs.select(
            "doc_id",
            (
                F.size(
                    F.filter(
                        tokens("text"), lambda w: w.isin(STOPWORDS["en"])
                    )
                )
                / F.size(tokens("text"))
            ).alias("dens"),
        )
        j = dsir_select(docs).join(dens, "doc_id")
        m = j.groupBy("selected").agg(F.avg("dens").alias("d")).collect()
        by = {r["selected"]: r["d"] for r in m}
        assert by[1] > by[0]


class TestSoftDedup:
    """SoftDeDup reweighting (operators/dedup.py:soft_dedup_weights):
    the oracle pins the full pipeline bit-exact; these pin semantics."""

    def test_weights_and_keep_rule(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from fuse_query_spark.operators.dedup import (
            jaccard_verify,
            lsh_candidate_pairs_md5,
            minhash_signatures_md5,
            soft_dedup_weights,
        )
        from fuse_query_spark.sources.tables import table

        d = table(spark, sf_dir, "documents")
        sigs = minhash_signatures_md5(d, k=8)
        pairs = jaccard_verify(d, lsh_candidate_pairs_md5(sigs, k=8, bands=4), threshold=0.2)
        rows = soft_dedup_weights(d, pairs).collect()
        assert len(rows) == d.count()  # every doc gets a weight
        import math

        for r in rows:
            assert r["weight_r6"] == round(1.0 / math.sqrt(r["cluster_size"]), 6)
        # singletons are always kept: u/1e6 < 1 holds for every bucket
        for r in rows:
            if r["cluster_size"] == 1:
                assert r["kept"] == 1
        # expected survivors of a cluster of size s is ~s * s^-1/2:
        # duplicate-family mass is compressed, i.e. keep-rate of
        # clustered docs < 1 whenever any cluster is nontrivial
        clustered = [r for r in rows if r["cluster_size"] > 1]
        if clustered:
            assert sum(r["kept"] for r in clustered) < len(clustered)


class TestDsirApproxCut:
    def test_approx_threshold_agrees_with_exact(self, spark, sf_dir):
        """cut='approx' (the 100 TB lever: percentile threshold, no
        global sort) must agree with the exact window cut up to
        quantile-sketch accuracy and rounded-score ties."""
        from fuse_query_spark.operators.sampling import dsir_select
        from fuse_query_spark.sources.tables import table

        docs = table(spark, sf_dir, "documents")
        exact = {r["doc_id"]: r["selected"] for r in dsir_select(docs).collect()}
        approx = {
            r["doc_id"]: r["selected"]
            for r in dsir_select(docs, cut="approx").collect()
        }
        assert set(exact) == set(approx)
        n = len(exact)
        agree = sum(exact[d] == approx[d] for d in exact)
        # sketch accuracy 1e-4 at n=500 -> the cut moves by at most a
        # handful of tie-adjacent docs
        assert agree >= n - max(3, n // 100)
        # and the approx keep-rate is within a point of the target
        k = sum(approx.values())
        assert abs(k / n - 0.1) < 0.02
