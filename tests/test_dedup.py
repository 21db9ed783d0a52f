"""MinHash-LSH and SimHash correctness: recall vs the exact method on
planted near-duplicates."""

from pyspark.sql import functions as F

from fuse_query_spark.operators.dedup import (
    dedup_exact,
    jaccard_verify,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash,
    simhash_near_pairs,
)
from fuse_query_spark.sources.tables import table


def _docs_with_planted_dups(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 1
        (3, "completely different text about spark query engines and column pruning at scale"),
        (4, "completely different text about spark query engines and column pruning at speed"),  # near-dup of 3
        (5, "an unrelated document mentioning benchmarks partitions shuffles and broadcast joins"),
        (6, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    ]
    return spark.createDataFrame(base, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(spark):
    d = _docs_with_planted_dups(spark)
    out = dedup_exact(d).collect()
    assert len(out) == 5  # 6 docs, one exact dup collapses
    by_id = {r["doc_id"]: r["dup_count"] for r in out}
    assert by_id[1] == 2  # docs 1 and 6 collapse onto min id 1
    assert 6 not in by_id


def test_minhash_lsh_finds_planted_near_dups(spark):
    d = _docs_with_planted_dups(spark).filter(F.col("doc_id") != 6)
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(d, k=16, bands=8, threshold=0.5).collect()}
    # jaccard(1,2) and jaccard(3,4) are high; with 8 bands of 2 rows the
    # collision probability at j>=0.7 is >0.99
    assert (1, 2) in pairs
    assert (3, 4) in pairs
    assert (1, 3) not in pairs and (2, 5) not in pairs


def test_minhash_recall_vs_exact_on_corpus(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    # exact ground truth: all-pairs jaccard >= 0.5 within prefix blocks
    blocked = d.withColumn("blk", F.md5(F.substring("text", 1, 40)))
    exact_pairs = (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    truth = {
        (r["id_a"], r["id_b"])
        for r in jaccard_verify(d, exact_pairs, threshold=0.5).collect()
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(d, k=16, bands=8, threshold=0.5).collect()
    }
    # verification step guarantees precision; recall should be high
    assert found <= found | truth
    if truth:
        recall = len(found & truth) / len(truth)
        assert recall >= 0.8, f"recall {recall} over {len(truth)} true pairs"


def test_simhash_is_deterministic_and_discriminative(spark):
    d = _docs_with_planted_dups(spark)
    sh = {r["doc_id"]: r["simhash"] for r in simhash(d).collect()}
    assert sh[1] == sh[6]  # identical text → identical simhash
    ham12 = bin(sh[1] ^ sh[2]).count("1")
    ham15 = bin(sh[1] ^ sh[5]).count("1")
    assert ham12 < ham15  # near-dup closer than unrelated


def test_simhash_md5_variant_matches_xxhash_structure(spark):
    """The portable md5_int32 hasher must behave like the fast path:
    identical docs hash identically, near-dups land closer than
    unrelated docs, and hashes fit in 32 bits."""
    from fuse_query_spark.operators.dedup import md5_int32

    d = _docs_with_planted_dups(spark)
    sh = {r["doc_id"]: r["simhash"] for r in simhash(d, hasher=md5_int32).collect()}
    assert sh[1] == sh[6]
    assert all(0 <= v < 2**32 for v in sh.values())
    ham12 = bin(sh[1] ^ sh[2]).count("1")
    ham15 = bin(sh[1] ^ sh[5]).count("1")
    assert ham12 < ham15


def test_first_band_emission_matches_distinct(spark, sf_dir):
    """r13: simhash_near_pairs emits each pair only at its FIRST
    matching band (a join predicate on xor(s_a, s_b)) instead of
    collapsing multi-band copies with a distinct. The output must be
    (a) duplicate-free without any distinct and (b) set-identical to
    the reference distinct-based formulation, on the real corpus."""
    from fuse_query_spark.operators.dedup import simhash
    from fuse_query_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents")
    got = simhash_near_pairs(docs, bits=32, max_hamming=3).collect()
    keys = [(r["id_a"], r["id_b"]) for r in got]
    assert len(keys) == len(set(keys)), "first-band emission produced duplicates"

    # reference: every-band emission + hamming filter + distinct
    nb, width = 4, 8
    s = simhash(docs, bits=32).localCheckpoint(eager=True)
    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright("simhash", i * width).bitwiseAND(F.lit((1 << width) - 1)).alias("bh"),
            F.col("doc_id").alias("id"),
            F.col("simhash").alias("s"),
        )
        for i in range(nb)
    ]
    buckets = s.select(F.explode(F.array(*bands)).alias("x")).select("x.*")
    a, b = buckets.alias("a"), buckets.alias("b")
    ref = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.s").bitwiseXOR(F.col("b.s"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))


def test_minhash_signature_shape(spark):
    d = _docs_with_planted_dups(spark)
    sigs = minhash_signatures(d, k=8)
    assert sigs.columns == ["doc_id"] + [f"mh{i}" for i in range(8)]
    assert sigs.count() == 6
