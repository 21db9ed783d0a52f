"""Unit tests for the r5 text-pipeline operators: PII redaction,
unigram-LM quality scoring, tf-idf keyword extraction (the oracle
cross-checks live in the registry; these pin hand-computed values)."""

import math

from pyspark.sql import functions as F

from fuse_query_spark.operators.text import (
    pii_counts,
    redact_pii,
    tfidf_topk,
    unigram_logprob,
)


def test_redact_pii_all_categories(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "mail bob.smith+x@corp.io or 10.0.0.1, ssn 123-45-6789, "
                "phone 555-867-5309 end",
            )
        ],
        "doc_id LONG, text STRING",
    )
    row = df.select(
        redact_pii("text").alias("red"), *pii_counts("text")
    ).collect()[0]
    assert row["red"] == (
        "mail <EMAIL> or <IP>, ssn <SSN>, phone <PHONE> end"
    )
    assert (row["n_email"], row["n_ssn"], row["n_phone"], row["n_ipv4"]) == (
        1,
        1,
        1,
        1,
    )


def test_redact_pii_disjoint_and_clean(spark):
    """SSN (3-2-4) and phone (3-3-4) patterns never cross-match; clean
    text passes through untouched."""
    df = spark.createDataFrame(
        [(1, "ssn 078-05-1120 only"), (2, "just plain words here")],
        "doc_id LONG, text STRING",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select("doc_id", redact_pii("text").alias("red"), *pii_counts("text")).collect()
    }
    assert rows[1]["red"] == "ssn <SSN> only"
    assert rows[1]["n_phone"] == 0 and rows[1]["n_ssn"] == 1
    assert rows[2]["red"] == "just plain words here"
    assert all(rows[2][c] == 0 for c in ("n_email", "n_ssn", "n_phone", "n_ipv4"))


def test_unigram_logprob_hand_computed(spark):
    """Corpus 'a a b' / 'b c': counts a=2 b=2 c=1, total 5."""
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id LONG, text STRING"
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert rows[1]["n_tokens"] == 3 and rows[2]["n_tokens"] == 2
    assert rows[1]["avg_nll"] == round(math.log(5 / 2), 4)  # all tokens p=2/5
    assert rows[2]["avg_nll"] == round(
        (math.log(5 / 2) + math.log(5 / 1)) / 2, 4
    )


def test_tfidf_topk_hand_computed(spark):
    """N=2; df: a=1 b=2 c=1 -> idf ln2 for a/c, 0 for b."""
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id LONG, text STRING"
    )
    out = [
        (r["doc_id"], r["rank"], r["term"], r["score"])
        for r in tfidf_topk(df, k=3).orderBy("doc_id", "rank").collect()
    ]
    ln2 = round(math.log(2), 4)
    assert out == [
        (1, 1, "a", round(2 * math.log(2), 4)),
        (1, 2, "b", 0.0),
        (2, 1, "c", ln2),
        (2, 2, "b", 0.0),
    ]


def test_tfidf_tie_break_deterministic(spark):
    """Equal scores rank by term string ascending."""
    df = spark.createDataFrame(
        [(1, "z y x"), (2, "q r s")], "doc_id LONG, text STRING"
    )
    rows = tfidf_topk(df, k=3).filter(F.col("doc_id") == 1).orderBy("rank").collect()
    assert [r["term"] for r in rows] == ["x", "y", "z"]  # all scores equal


def test_chunk_windows_hand_computed(spark):
    from fuse_query_spark.operators.text import chunk_windows

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id LONG, text STRING")
    rows = [
        (r["chunk_id"], r["start_token"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_windows(df, chunk_tokens=3, stride=2).orderBy("chunk_id").collect()
    ]
    assert rows == [(0, 0, 3, "a b c"), (1, 2, 3, "c d e"), (2, 4, 1, "e")]


def test_chunk_dup_fraction_identical_docs(spark):
    """Two identical docs: every chunk occurs twice -> frac 1.0; a
    unique doc scores 0.0."""
    from fuse_query_spark.operators.text import chunk_dup_fraction

    df = spark.createDataFrame(
        [(1, "w x y z"), (2, "w x y z"), (3, "p q r s")],
        "doc_id LONG, text STRING",
    )
    rows = {
        r["doc_id"]: r for r in chunk_dup_fraction(df, chunk_tokens=2, stride=2).collect()
    }
    assert rows[1]["dup_chunk_frac"] == 1.0 and rows[1]["n_chunks"] == 2
    assert rows[2]["dup_chunk_frac"] == 1.0
    assert rows[3]["dup_chunk_frac"] == 0.0 and rows[3]["n_dup_chunks"] == 0


def test_chunk_dup_fraction_partial_overlap(spark):
    """Docs sharing one 2-token chunk out of two -> frac 0.5 each."""
    from fuse_query_spark.operators.text import chunk_dup_fraction

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b e f")], "doc_id LONG, text STRING"
    )
    rows = {
        r["doc_id"]: r for r in chunk_dup_fraction(df, chunk_tokens=2, stride=2).collect()
    }
    assert rows[1]["dup_chunk_frac"] == 0.5
    assert rows[2]["dup_chunk_frac"] == 0.5


def test_winnow_guarantee_shared_run(spark):
    """Winnowing guarantee: docs sharing a run of >= w+k-1 tokens
    (here 4+3-1=6) share at least one selected fingerprint VALUE.
    Verified on the raw sets (re-derived), not just the digest."""
    from fuse_query_spark.operators.text import ngrams_from_tokens, tokens

    shared = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, f"one two {shared} three four"), (2, f"{shared} five six seven")],
        "doc_id LONG, text STRING",
    )
    hashed = df.select(
        "doc_id", F.transform(ngrams_from_tokens(tokens("text"), 3), F.md5).alias("h")
    )
    h = F.col("h")
    mins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(h) - 4, F.lit(0))),
        lambda p: F.array_min(F.slice(h, p + 1, 4)),
    )
    sets = {
        r["doc_id"]: set(r["fps"])
        for r in hashed.select("doc_id", F.array_distinct(mins).alias("fps")).collect()
    }
    assert sets[1] & sets[2], "shared 6-token run must produce a common fingerprint"


def test_winnow_density_and_digest(spark):
    """Fingerprint density lands near the 2/(w+1) winnowing bound on
    random-ish text, and identical docs get identical digests."""
    from fuse_query_spark.operators.text import winnow_fingerprints

    words = [f"w{i * 7919 % 1000}" for i in range(200)]
    text = " ".join(words)
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, " ".join(reversed(words)))],
        "doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r for r in winnow_fingerprints(df, k=3, w=4).collect()}
    assert rows[1]["fp_digest"] == rows[2]["fp_digest"]
    assert rows[1]["fp_digest"] != rows[3]["fp_digest"]
    assert 0.2 < rows[1]["fp_density"] < 0.6  # ~2/(w+1) = 0.4
    assert rows[1]["n_grams"] == 198


def test_winnow_short_doc(spark):
    """Docs shorter than k tokens have no grams -> empty fingerprint
    set; docs shorter than w grams fall back to one global-min window."""
    from fuse_query_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d")], "doc_id LONG, text STRING"
    )
    rows = {r["doc_id"]: r for r in winnow_fingerprints(df, k=3, w=4).collect()}
    assert rows[1]["n_grams"] == 0 and rows[1]["n_fingerprints"] == 0
    assert rows[2]["n_grams"] == 2 and rows[2]["n_fingerprints"] == 1


def test_bigram_nll_detects_shuffled_text(spark):
    """The reason to go past unigram: a token-shuffled doc keeps its
    unigram NLL (same bag of words) but its bigram NLL rises (broken
    transitions). Corpus: many fluent docs + one shuffled copy."""
    from fuse_query_spark.operators.text import bigram_logprob, unigram_logprob

    fluent = "the quick brown fox jumps over the lazy dog again and again"
    words = fluent.split()
    shuffled = " ".join(words[::2] + words[1::2])  # derangement-ish, same bag
    rows = [(i, fluent) for i in range(20)] + [(99, shuffled)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    uni = {r["doc_id"]: r["avg_nll"] for r in unigram_logprob(df).collect()}
    assert uni[99] == uni[0]  # unigram is blind to order

    bi = {r["doc_id"]: r["avg_bigram_nll"] for r in bigram_logprob(df).collect()}
    assert bi[99] > bi[0] + 0.5  # bigram flags the broken transitions


class TestBoilerplateScrub:
    def test_shared_header_dropped_content_kept_in_order(self, spark):
        from fuse_query_spark.operators.text import remove_boilerplate_chunks

        header = "subscribe to newsletter"  # shows up in every doc
        rows = [(i, f"{header} unique{i}a text{i} unique{i}b body{i}") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        # chunk=1 token, drop chunks present in >50% of docs
        out = {
            r["doc_id"]: r
            for r in remove_boilerplate_chunks(
                df, chunk_tokens=1, max_doc_frac=0.5
            ).collect()
        }
        for i in range(10):
            r = out[i]
            assert r["clean_text"] == f"unique{i}a text{i} unique{i}b body{i}"
            assert r["n_dropped_chunks"] == 3 and r["n_chunks"] == 7

    def test_nothing_dropped_below_threshold(self, spark):
        from fuse_query_spark.operators.text import remove_boilerplate_chunks

        rows = [(i, f"only{i} unique{i} words{i}") for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        out = remove_boilerplate_chunks(df, chunk_tokens=1, max_doc_frac=0.5).collect()
        assert all(r["n_dropped_chunks"] == 0 for r in out)
        assert {r["clean_text"] for r in out} == {f"only{i} unique{i} words{i}" for i in range(5)}


class TestContainment:
    def test_quote_detected_where_jaccard_misses(self, spark):
        from fuse_query_spark.operators.dedup import (
            containment_verify,
            jaccard_verify,
        )

        quote = "alpha beta gamma delta epsilon zeta"
        filler = " ".join(f"w{i}" for i in range(120))
        df = spark.createDataFrame(
            [(1, quote), (2, f"{filler} {quote}")], "doc_id LONG, text STRING"
        )
        pairs = spark.createDataFrame([(1, 2)], "id_a LONG, id_b LONG")
        cont = containment_verify(df, pairs, threshold=0.9).collect()
        directed = {(r["src_id"], r["dst_id"]): r["containment"] for r in cont}
        assert directed[(1, 2)] == 1.0  # the quote is fully contained
        assert (2, 1) not in directed  # big doc not contained in quote
        jac = jaccard_verify(df, pairs, threshold=0.2).collect()
        assert not jac  # Jaccard structurally misses the embedding

    def test_full_pipeline_reflexivity_bounds(self, spark, sf_dir):
        from fuse_query_spark.operators.dedup import minhash_containment_pairs
        from fuse_query_spark.sources.tables import table

        d = table(spark, sf_dir, "documents")
        rows = minhash_containment_pairs(d, threshold=0.5).collect()
        assert rows, "corpus has planted near-dups"
        assert all(0.5 <= r["containment"] <= 1.0 for r in rows)
        assert all(r["src_id"] != r["dst_id"] for r in rows)


class TestHashedLinearScore:
    def test_deterministic_and_token_exact(self, spark):
        from fuse_query_spark.operators.text import hashed_linear_score

        df = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "the the the")],
            "doc_id LONG, text STRING",
        )
        a = {r["doc_id"]: r for r in hashed_linear_score(df).collect()}
        b = {r["doc_id"]: r for r in hashed_linear_score(df).collect()}
        assert a == b
        assert a[1]["n_tokens"] == 4 and a[2]["n_tokens"] == 3
        # a repeated token contributes its weight exactly k times
        assert a[2]["score_raw"] % 3 == 0
        assert abs(a[1]["mean_weight_r6"]) <= 100


class TestBpeSegment:
    """Rank-ordered BPE application (operators/text.py:bpe_token_stats).
    The oracle query pins the whole corpus bit-exact; these pin the
    merge semantics on hand-checked words."""

    def test_hand_checked_merges(self, spark):
        from fuse_query_spark.operators.text import bpe_token_stats

        df = spark.createDataFrame(
            [(1, "the scan join data narrow")], "doc_id long, text string"
        )
        r = bpe_token_stats(df).collect()[0]
        # the->1, scan->1, join->1 (multi-rank chains), data->[d,a,ta],
        # narrow->[n,ar,row] (hand-derived; the rank-11 (a,'ta') rule is
        # dead because 'ta' does not exist until rank 12)
        assert (r["n_words"], r["n_bpe_tokens"]) == (5, 9)

    def test_consecutive_pair_occurrences_all_merge(self, spark):
        """'a b a b' must merge to [ab, ab] — the case a naive
        space-separated replace gets wrong (shared delimiter)."""
        from fuse_query_spark.operators.text import bpe_token_stats

        df = spark.createDataFrame([(1, "ananan")], "doc_id long, text string")
        # merges (a,n) -> an: a n a n a n => an an an (3 tokens)
        r = bpe_token_stats(df).collect()[0]
        assert r["n_bpe_tokens"] == 3

    def test_no_boundary_bleed_into_longer_symbols(self, spark):
        """(t,h) must not fire inside a word where 't' is the tail of
        a longer symbol: 'sth' -> [st, h] via (s,t), and the 'th' rule
        (rank 1 < (s,t) rank 7) fires first on the raw chars: s,t,h ->
        s,th. Verifies rank order wins, not pattern greed."""
        from fuse_query_spark.operators.text import bpe_token_stats

        df = spark.createDataFrame([(1, "sth")], "doc_id long, text string")
        r = bpe_token_stats(df).collect()[0]
        # rank 1 (t,h) fires before rank 7 (s,t): s,th -> 2 tokens
        assert r["n_bpe_tokens"] == 2

    def test_delimiter_collision_stripped(self, spark):
        from fuse_query_spark.operators.text import bpe_token_stats

        df = spark.createDataFrame([(1, "t|he")], "doc_id long, text string")
        r = bpe_token_stats(df).collect()[0]
        # '|' stripped -> 'the' -> 1 token
        assert r["n_bpe_tokens"] == 1


class TestPerplexityBands:
    def test_equal_count_bands_and_ordering(self, spark, sf_dir):
        from fuse_query_spark.operators.text import perplexity_bands
        from fuse_query_spark.sources.tables import table

        rows = perplexity_bands(table(spark, sf_dir, "documents")).collect()
        n = len(rows)
        counts = {}
        for r in rows:
            counts[r["band_name"]] = counts.get(r["band_name"], 0) + 1
        assert set(counts) == {"head", "middle", "tail"}
        assert max(counts.values()) - min(counts.values()) <= 1  # equal cut
        # ordering contract: every head score <= every tail score
        head_max = max(r["avg_nll"] for r in rows if r["band_name"] == "head")
        tail_min = min(r["avg_nll"] for r in rows if r["band_name"] == "tail")
        assert head_max <= tail_min

    def test_approx_bands_agree_with_exact(self, spark, sf_dir):
        """The 100 TB path (bands='approx': percentile_approx
        thresholds + CASE, no global sort) must agree with the exact
        ntile cut on every document whose score is not ON a threshold
        — only boundary ties may land one band over, and band
        populations stay within sketch accuracy of the exact thirds."""
        from fuse_query_spark.operators.text import perplexity_bands
        from fuse_query_spark.sources.tables import table

        docs = table(spark, sf_dir, "documents")
        exact = {
            r["doc_id"]: (r["band"], r["avg_nll"])
            for r in perplexity_bands(docs).collect()
        }
        approx_rows = perplexity_bands(docs, bands="approx").collect()
        approx = {r["doc_id"]: r["band"] for r in approx_rows}
        assert set(approx) == set(exact)
        # scores sitting exactly on a band boundary may legitimately
        # differ; everything else must match
        boundary_scores = set()
        for b in (1, 2):
            hi = max(s for (bb, s) in exact.values() if bb == b)
            lo = min(s for (bb, s) in exact.values() if bb == b + 1)
            boundary_scores.update({hi, lo})
        mismatch = [
            d for d, b in approx.items()
            if b != exact[d][0] and exact[d][1] not in boundary_scores
        ]
        assert mismatch == []
        # populations within 5%-of-corpus of the exact thirds
        n = len(approx)
        for b in (1, 2, 3):
            got = sum(1 for v in approx.values() if v == b)
            want = sum(1 for v in exact.values() if v[0] == b)
            assert abs(got - want) <= max(2, 0.05 * n)

    def test_approx_bands_plan_has_no_global_window(self, spark, sf_dir):
        """The scale path must not contain a partition-less WindowExec
        (the single-partition global sort the exact ntile cut pays)."""
        from fuse_query_spark.operators.text import perplexity_bands
        from fuse_query_spark.sources.tables import table

        docs = table(spark, sf_dir, "documents")
        plan = perplexity_bands(docs, bands="approx")._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        exact_plan = perplexity_bands(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Window" in exact_plan  # the lint has teeth
