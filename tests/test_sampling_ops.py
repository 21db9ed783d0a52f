"""Property tests for the sampling/quantization pipeline operators
(oracle hash-equality is covered by the driver gate / check_oracle;
these pin the operator INVARIANTS that survive any corpus)."""

import pytest
from pyspark.sql import functions as F

from fuse_query_spark.operators.sampling import temperature_quotas
from fuse_query_spark.operators.similarity import quantize_int8
from fuse_query_spark.sources.tables import table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents")


class TestTemperatureQuotas:
    def test_total_within_budget(self, docs):
        rows = temperature_quotas(docs, total_out=200).collect()
        # floor() quotas can undershoot but never overshoot the budget
        assert sum(r.n_sampled for r in rows) <= 200
        assert all(r.n_sampled <= r.quota for r in rows)

    def test_alpha_flattens_the_mix(self, docs):
        # alpha=0 gives every source the same quota (uniform mix);
        # alpha=1 is proportional to raw weight
        flat = {r.source: r.quota for r in temperature_quotas(docs, alpha=0.0).collect()}
        assert len(set(flat.values())) == 1
        prop = {r.source: r.quota for r in temperature_quotas(docs, alpha=1.0).collect()}
        w = {
            r.source: r.w
            for r in docs.groupBy("source").agg(F.sum("n_chars").alias("w")).collect()
        }
        # proportional quotas order the same way as raw weights
        bysrc = sorted(prop, key=lambda s: (prop[s], w[s]))
        assert all(w[a] <= w[b] for a, b in zip(bysrc, bysrc[1:]))

    def test_deterministic_under_repartition(self, docs):
        a = {tuple(r) for r in temperature_quotas(docs).collect()}
        b = {tuple(r) for r in temperature_quotas(docs.repartition(13)).collect()}
        assert a == b


class TestQuantizeInt8:
    def test_error_bounded_by_half_scale(self, spark, sf_dir):
        emb = table(spark, sf_dir, "embeddings")
        out = quantize_int8(emb).collect()
        assert out
        scales = {r.vec_id: r.scale_r9 for r in out}
        for r in out:
            # round-to-nearest with symmetric clipping: error <= scale/2
            # on unsaturated lanes; saturated lanes can exceed it only
            # if |x| > 127.5*scale, impossible under scale = max|x|/127
            assert r.max_err_r9 <= scales[r.vec_id] / 2 + 1e-9, r

    def test_no_saturation_under_maxabs_scale(self, spark, sf_dir):
        # scale = max|x|/127 means |x/scale| <= 127 exactly at the max:
        # floor(127 + 0.5) = 127 -> the max lane reports saturated,
        # but NEVER clips beyond (checked via the error bound above)
        emb = table(spark, sf_dir, "embeddings")
        out = quantize_int8(emb).collect()
        assert all(r.n_saturated >= 1 for r in out)  # the argmax lane

    def test_deterministic_under_repartition(self, spark, sf_dir):
        emb = table(spark, sf_dir, "embeddings")
        a = {tuple(r) for r in quantize_int8(emb).collect()}
        b = {tuple(r) for r in quantize_int8(emb.repartition(7)).collect()}
        assert a == b


class TestBloomPrefilterEquality:
    def test_bloom_variant_matches_exact(self, spark, sf_dir):
        """contaminated_ids_bloom must be row-identical to
        contaminated_ids — the prefilter may only drop rows the exact
        join drops anyway (checked at every prefix width, including a
        tiny one where buckets saturate and the filter passes all)."""
        from pyspark.sql import functions as F

        from fuse_query_spark.operators.sampling import (
            contaminated_ids,
            contaminated_ids_bloom,
        )
        from fuse_query_spark.sources.tables import table

        d = table(spark, sf_dir, "documents")
        corpus = d.filter(F.col("doc_id") % 97 != 0)
        ev = d.filter(F.col("doc_id") % 97 == 0)
        exact = {(r.doc_id, r.n_shared) for r in contaminated_ids(corpus, ev, n=4).collect()}
        for bits in (4, 20):
            got = {
                (r.doc_id, r.n_shared)
                for r in contaminated_ids_bloom(corpus, ev, n=4, prefix_bits=bits).collect()
            }
            assert got == exact, f"prefix_bits={bits}"


def test_leakage_safe_split_no_pair_straddles(spark, sf_dir):
    """The whole point: every near-dup pair lands in ONE split; the
    doc-keyed split on the same corpus DOES straddle (proving the test
    has teeth); split fractions stay near 90/5/5."""
    from fuse_query_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs_md5,
        minhash_signatures_md5,
    )
    from fuse_query_spark.operators.sampling import (
        deterministic_split,
        leakage_safe_split,
    )
    from fuse_query_spark.sources.tables import table

    d = table(spark, sf_dir, "documents")
    sigs = minhash_signatures_md5(d, k=8)
    pairs = jaccard_verify(d, lsh_candidate_pairs_md5(sigs, k=8, bands=4), threshold=0.2)
    pair_rows = pairs.select("id_a", "id_b").collect()
    assert pair_rows, "corpus must contain near-dup pairs"

    safe = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(d, pairs).select("doc_id", "split").collect()
    }
    assert all(safe[r["id_a"]] == safe[r["id_b"]] for r in pair_rows)

    naive = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(d).select("doc_id", "split").collect()
    }
    assert any(naive[r["id_a"]] != naive[r["id_b"]] for r in pair_rows), (
        "doc-keyed split should straddle at least one pair on this corpus"
    )

    from collections import Counter

    frac = Counter(safe.values())
    n = len(safe)
    assert 0.8 < frac["train"] / n < 0.97
    assert frac["val"] > 0 and frac["test"] > 0


def test_dsir_empty_target_raises(spark):
    """code-review r8: an empty target set (no doc meets stop_frac)
    previously produced an arbitrary id-ordered selection presented as
    DSIR output; it must fail loudly."""
    import pytest as _pytest

    from fuse_query_spark.operators.sampling import dsir_select

    df = spark.createDataFrame(
        [(i, "zqx wvu tsr qpo nml") for i in range(30)], "doc_id LONG, text STRING"
    )
    with _pytest.raises(ValueError, match="target set is empty"):
        dsir_select(df, stop_frac=0.9).collect()


def test_temperature_quotas_approx_cut(spark, sf_dir):
    """cut='approx' replaces the per-source hot-partition window with a
    closed-form uniform-hash threshold: quotas identical, sampled
    counts within Binomial noise, plan WindowExec-free."""
    from fuse_query_spark.operators.sampling import temperature_quotas
    from fuse_query_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents")
    exact = {r.source: (r.quota, r.n_sampled) for r in temperature_quotas(docs).collect()}
    approx = {
        r.source: (r.quota, r.n_sampled)
        for r in temperature_quotas(docs, cut="approx").collect()
    }
    assert set(approx) == set(exact)
    for src, (q, n) in exact.items():
        aq, an = approx[src]
        assert aq == q
        assert abs(an - q) <= max(4, 4 * q**0.5), (src, q, an)
    plan = temperature_quotas(docs, cut="approx")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exact.*approx|approx.*exact"):
        temperature_quotas(docs, cut="aprox")
