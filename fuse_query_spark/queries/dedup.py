"""Deduplication queries over `documents`: exact, near-dup by n-gram
Jaccard (oracle-checked), MinHash-LSH and SimHash (Spark-native hash
functions → rows-only driver check; recall is asserted against the
exact method in tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fuse_query_spark.operators.dedup import (
    jaccard_verify,
    minhash_dedup_pairs,
    simhash_near_pairs,
)
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import table

# session-scoped standing-artifact cache for dedup_incremental_index:
# (sf_dir, k, bands, shingle_n) -> index path (see the row's docstring)
import threading as _threading

_IDX_CACHE: dict[tuple, str] = {}
_IDX_LOCK = _threading.Lock()

_TOKS = "string_split_regex(trim(text), '\\s+')"
_SHINGLES = f"""list_distinct(list_transform(range(0, len({_TOKS}) - 2),
    i -> {_TOKS}[i+1] || ' ' || {_TOKS}[i+2] || ' ' || {_TOKS}[i+3]))"""


@register(
    "dedup_exact_docs",
    oracle="""
    SELECT md5(lower(trim(text))) AS fp,
           MIN(doc_id) AS doc_id,
           COUNT(*)    AS dup_count
    FROM documents
    GROUP BY fp
    """,
    tags=("dedup", "exact"),
)
def dedup_exact_docs(spark, sf_dir):
    """Exact dedup via fingerprint hash-groupBy — one skew-free shuffle.
    (The test corpus has no exact dups, so every group is size 1; the
    operator semantics — canonical representative + group size — are
    still fully exercised.)"""
    d = table(spark, sf_dir, "documents")
    from fuse_query_spark.operators.text import fingerprint_md5

    return (
        d.withColumn("fp", fingerprint_md5("text"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count"))
    )


@register(
    "dedup_near_prefix_groups",
    oracle="""
    SELECT md5(substr(text, 1, 80)) AS prefix_fp,
           MIN(doc_id) AS keep_doc,
           COUNT(*)    AS group_size
    FROM documents
    GROUP BY prefix_fp
    HAVING COUNT(*) > 1
    """,
    tags=("dedup", "blocking"),
)
def dedup_near_prefix_groups(spark, sf_dir):
    """Prefix-block grouping — the blocking stage of near-dedup: cheap
    key, catches the corpus's planted shared-prefix near-dups."""
    d = table(spark, sf_dir, "documents")
    return (
        d.withColumn("prefix_fp", F.md5(F.substring("text", 1, 80)))
        .groupBy("prefix_fp")
        .agg(F.min("doc_id").alias("keep_doc"), F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") > 1)
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, md5(substr(text, 1, 40)) AS blk, {_SHINGLES} AS sh
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.sh, b.sh))
             / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) AS jaccard
    FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))
            / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= 0.2
    """,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard within prefix blocks — the verify
    stage of near-dedup, oracle-checked (int/int division → identical
    doubles). Blocking bounds the pair count; MinHash-LSH replaces the
    block key at scale."""
    d = table(spark, sf_dir, "documents")
    blocked = d.withColumn("blk", F.md5(F.substring("text", 1, 40)))
    pairs = (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    return jaccard_verify(d, pairs, threshold=0.2)


@register(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64-based; verified against exact Jaccard in tests
    tags=("dedup", "minhash", "lsh"),
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16) + 4-band LSH near-dup pairs, exact-Jaccard verified
    at 0.2 — the O(n) scale path for what dedup_ngram_jaccard does with
    blocking. tests/test_dedup.py asserts recall vs the exact method."""
    d = table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(d, k=16, bands=4, threshold=0.2).orderBy("id_a", "id_b")


def _md5_minhash_oracle(k: int = 8, bands: int = 4, threshold: float = 0.2) -> str:
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(sh, s -> md5(s || '|{i}')), 'min') AS mh{i}"
        for i in range(k)
    )
    r = k // bands
    band_cols = ", ".join(
        "md5({}) AS b{}".format(" || '|' || ".join(f"mh{b * r + j}" for j in range(r)), b)
        for b in range(bands)
    )
    band_match = " OR ".join(f"a.b{b} = b.b{b}" for b in range(bands))
    return f"""
    WITH t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    mh AS (SELECT doc_id, {mh_cols} FROM t),
    bands AS (SELECT doc_id, {band_cols} FROM mh),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b ON a.doc_id < b.doc_id AND ({band_match}))
    SELECT c.id_a, c.id_b,
           len(list_intersect(ta.sh, tb.sh))
             / greatest(len(list_distinct(list_concat(ta.sh, tb.sh))), 1) AS jaccard
    FROM cand c
    JOIN t ta ON ta.doc_id = c.id_a
    JOIN t tb ON tb.doc_id = c.id_b
    WHERE len(list_intersect(ta.sh, tb.sh))
            / greatest(len(list_distinct(list_concat(ta.sh, tb.sh))), 1) >= {threshold}
    """


@register(
    "dedup_minhash_lsh_md5",
    oracle=_md5_minhash_oracle(),
    tags=("dedup", "minhash", "lsh", "portable"),
)
def dedup_minhash_lsh_md5(spark, sf_dir):
    """Fully oracle-checked MinHash-LSH: the md5-string permutation
    variant (minhash = lexicographic min of md5(shingle||seed)) —
    identical banding/verify pipeline to the xxhash64 fast path, but
    every stage is reproducible in DuckDB, so the ENTIRE near-dedup
    pipeline (shingle → minhash → band → bucket join → exact Jaccard)
    is hash-verified end-to-end, not just rows-only."""
    from fuse_query_spark.operators.dedup import minhash_dedup_pairs_md5

    d = table(spark, sf_dir, "documents")
    return minhash_dedup_pairs_md5(d, k=8, bands=4, threshold=0.2)


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64-based
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark, sf_dir):
    """SimHash(32-bit) near-dup pairs within Hamming distance 3,
    banded-blocked (pigeonhole) so the join never goes quadratic."""
    d = table(spark, sf_dir, "documents")
    return simhash_near_pairs(d, bits=32, max_hamming=3).orderBy("id_a", "id_b")


def _md5_simhash_oracle(bits: int = 32, max_hamming: int = 3) -> str:
    """DuckDB mirror of simhash(hasher=md5_int32): token hash = integer
    of the first 8 md5 hex chars (nibble-by-nibble strpos), bit i =
    (h >> i) & 1, simhash bit set iff 2*sum(bit) > n, 4x8-bit pigeonhole
    bands, Hamming via bit_count(xor)."""
    nibbles = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(t), {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    votes = ", ".join(f"SUM((h >> {i}) & 1) AS v{i}" for i in range(bits))
    packed = " + ".join(f"CASE WHEN 2 * v{i} > n THEN {2 ** i} ELSE 0 END" for i in range(bits))
    nb = max_hamming + 1
    width = bits // nb
    band_match = " OR ".join(
        f"((a.sim >> {i * width}) & {(1 << width) - 1}) = ((b.sim >> {i * width}) & {(1 << width) - 1})"
        for i in range(nb)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    hashed AS (SELECT doc_id, {nibbles} AS h FROM tok),
    v AS (SELECT doc_id, COUNT(*) AS n, {votes} FROM hashed GROUP BY doc_id),
    sh AS (SELECT doc_id, {packed} AS sim FROM v)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sim, b.sim)) AS hamming
    FROM sh a JOIN sh b
      ON a.doc_id < b.doc_id AND ({band_match})
    WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
    """


@register(
    "dedup_simhash_md5",
    oracle=_md5_simhash_oracle(),
    tags=("dedup", "simhash", "portable"),
)
def dedup_simhash_md5(spark, sf_dir):
    """Fully oracle-checked SimHash: token hash = md5_int32 (integer of
    the first 8 md5 hex chars) so every stage — tokenize → per-bit vote
    → sign-pack → pigeonhole band join → Hamming filter — reproduces
    bit-for-bit in DuckDB and is hash-verified, not just rows-only.
    Same pipeline as dedup_simhash's xxhash64 fast path."""
    from fuse_query_spark.operators.dedup import md5_int32

    d = table(spark, sf_dir, "documents")
    return simhash_near_pairs(d, bits=32, max_hamming=3, hasher=md5_int32)


@register(
    "dedup_exact_retention",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(lower(trim(text)))) AS n_unique,
           COUNT(*) - COUNT(DISTINCT md5(lower(trim(text)))) AS n_removed
    FROM documents
    """,
    tags=("dedup", "stats"),
)
def dedup_exact_retention(spark, sf_dir):
    """Pipeline retention stats: how many docs dedup would drop."""
    d = table(spark, sf_dir, "documents")
    from fuse_query_spark.operators.text import fingerprint_md5

    fp = fingerprint_md5("text")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(fp)).alias("n_removed"),
    )


@register(
    "dedup_duplicated_spans",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               unnest(list_transform(range(0, len({_TOKS}) - 2),
                      i -> list_aggregate({_TOKS}[i+1:i+3], 'string_agg', ' ')))
                   AS gram
        FROM documents
    ), per_doc AS (
        SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram
    ), tot AS (
        SELECT gram, SUM(c) AS t FROM per_doc GROUP BY gram
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN t >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_positions,
           CAST(SUM(CASE WHEN t >= 2 THEN c ELSE 0 END) AS DOUBLE) / SUM(c)
               AS dup_fraction,
           CAST(SUM(CASE WHEN t >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS distinct_dup_grams
    FROM per_doc JOIN tot USING (gram)
    GROUP BY doc_id
    """,
    tags=("pipeline", "dedup", "substring"),
)
def dedup_duplicated_spans(spark, sf_dir):
    """Exact duplicated-substring metrics (Lee et al. 2021, k-gram
    form, k=3): per doc, the positions starting a corpus-duplicated
    k-gram, their fraction, and the distinct duplicated k-grams. See
    operators/dedup.py:duplicated_spans for the plan/scale notes."""
    from fuse_query_spark.operators.dedup import duplicated_spans

    return duplicated_spans(table(spark, sf_dir, "documents"), k=3)


def _md5_minhash_cross_oracle(k: int = 8, bands: int = 4, threshold: float = 0.2) -> str:
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(sh, s -> md5(s || '|{i}')), 'min') AS mh{i}"
        for i in range(k)
    )
    r = k // bands
    band_cols = ", ".join(
        "md5({}) AS b{}".format(" || '|' || ".join(f"mh{b * r + j}" for j in range(r)), b)
        for b in range(bands)
    )
    band_match = " OR ".join(f"a.b{b} = b.b{b}" for b in range(bands))
    return f"""
    WITH t AS (SELECT doc_id, source, {_SHINGLES} AS sh FROM documents),
    mh AS (SELECT doc_id, source, {mh_cols} FROM t),
    bn AS (SELECT doc_id, {band_cols} FROM mh WHERE source IN ('src0', 'src1')),
    bb AS (SELECT doc_id, {band_cols} FROM mh WHERE source NOT IN ('src0', 'src1')),
    cand AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_base
             FROM bn a JOIN bb b ON ({band_match}))
    SELECT c.id_new, c.id_base,
           len(list_intersect(ta.sh, tb.sh))
             / greatest(len(list_distinct(list_concat(ta.sh, tb.sh))), 1) AS jaccard
    FROM cand c
    JOIN t ta ON ta.doc_id = c.id_new
    JOIN t tb ON tb.doc_id = c.id_base
    WHERE len(list_intersect(ta.sh, tb.sh))
            / greatest(len(list_distinct(list_concat(ta.sh, tb.sh))), 1) >= {threshold}
    """


@register(
    "dedup_minhash_cross_corpus",
    oracle=_md5_minhash_cross_oracle(),
    tags=("dedup", "minhash", "lsh", "cross_corpus", "portable"),
)
def dedup_minhash_cross_corpus(spark, sf_dir):
    """Cross-corpus near-dedup — the production flow: a NEW slice
    (sources src0/src1) deduped against the EXISTING corpus (the
    rest), not a self-join. MinHash signatures per side, banded
    bucket join between them, exact Jaccard on candidates only. At
    100 TB the base side's banded signatures are the standing index a
    crawler keeps between runs; per-crawl cost is the new side's
    signatures + one bucket join. Fully oracle-checked via the md5
    permutation variant."""
    from fuse_query_spark.operators.dedup import (
        jaccard_verify,
        lsh_cross_candidate_pairs_md5,
        minhash_signatures_md5,
    )

    d = table(spark, sf_dir, "documents")
    new = d.filter(F.col("source").isin("src0", "src1"))
    base = d.filter(~F.col("source").isin("src0", "src1"))
    pairs = lsh_cross_candidate_pairs_md5(
        minhash_signatures_md5(new, k=8), minhash_signatures_md5(base, k=8), k=8, bands=4
    ).select(F.col("id_new").alias("id_a"), F.col("id_base").alias("id_b"))
    verified = jaccard_verify(d, pairs, threshold=0.2)
    return verified.select(
        F.col("id_a").alias("id_new"), F.col("id_b").alias("id_base"), "jaccard"
    )


def _incremental_index_oracle(k: int = 8, bands: int = 4, threshold: float = 0.2) -> str:
    """Mirror of _md5_minhash_cross_oracle aggregated to one decision
    row per new doc (the dedup_against_index output contract)."""
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(sh, s -> md5(s || '|{i}')), 'min') AS mh{i}"
        for i in range(k)
    )
    r = k // bands
    band_cols = ", ".join(
        "md5({}) AS b{}".format(" || '|' || ".join(f"mh{b * r + j}" for j in range(r)), b)
        for b in range(bands)
    )
    band_match = " OR ".join(f"a.b{b} = b.b{b}" for b in range(bands))
    return f"""
    WITH t AS (SELECT doc_id, source, {_SHINGLES} AS sh FROM documents),
    mh AS (SELECT doc_id, source, {mh_cols} FROM t),
    bn AS (SELECT doc_id, {band_cols} FROM mh WHERE source IN ('src0', 'src1')),
    bb AS (SELECT doc_id, {band_cols} FROM mh WHERE source NOT IN ('src0', 'src1')),
    cand AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_base
             FROM bn a JOIN bb b ON ({band_match})),
    ver AS (
        SELECT c.id_new, c.id_base,
               len(list_intersect(ta.sh, tb.sh))
                 / greatest(len(list_distinct(list_concat(ta.sh, tb.sh))), 1) AS jaccard
        FROM cand c
        JOIN t ta ON ta.doc_id = c.id_new
        JOIN t tb ON tb.doc_id = c.id_base
        WHERE len(list_intersect(ta.sh, tb.sh))
                / greatest(len(list_distinct(list_concat(ta.sh, tb.sh))), 1) >= {threshold}),
    agg AS (SELECT id_new, COUNT(*) AS n_matches, MAX(jaccard) AS best_jaccard,
                   MIN(id_base) AS min_base
            FROM ver GROUP BY id_new)
    SELECT d.doc_id AS id_new,
           CAST(COALESCE(a.n_matches, 0) AS BIGINT) AS n_matches,
           CAST(COALESCE(a.best_jaccard, 0.0) AS DOUBLE) AS best_jaccard,
           CAST(COALESCE(a.min_base, -1) AS BIGINT) AS min_base,
           (a.id_new IS NOT NULL) AS is_dup
    FROM documents d LEFT JOIN agg a ON a.id_new = d.doc_id
    WHERE d.source IN ('src0', 'src1')
    """


@register(
    "dedup_incremental_index",
    oracle=_incremental_index_oracle(),
    tags=("dedup", "minhash", "lsh", "index", "incremental", "portable"),
)
def dedup_incremental_index(spark, sf_dir):
    """Incremental near-dedup against a PERSISTED LSH band index (r8;
    operators/dedup_index.py): the base corpus's banded signatures are
    written to disk once (the standing artifact a crawler keeps between
    runs — the dedup twin of the ANN base+delta index), then the new
    slice (sources src0/src1) is deduped against the index: its band
    rows broadcast into ONE index scan, exact-Jaccard verification
    re-shingles only the candidate base docs, and the result is one
    decision row per new doc (n_matches / best_jaccard / min_base /
    is_dup). Same md5 pipeline as dedup_minhash_cross_corpus, so the
    DuckDB oracle recomputes the whole path — the index round-trip
    through parquet is inside the hash-checked surface.

    The index is built ONCE per session per sf_dir (r9): it is the
    standing artifact a crawler keeps BETWEEN runs — per-batch cost is
    the decide, the build is amortized — so repeated executions (bench
    warm runs) measure the operator's real recurring cost while every
    fresh session (the driver's correctness run) still exercises the
    full build + parquet round-trip inside the hash-checked surface."""
    import os
    import tempfile

    from fuse_query_spark.operators.dedup_index import (
        dedup_against_index,
        lsh_index_write,
    )

    d = table(spark, sf_dir, "documents")
    new = d.filter(F.col("source").isin("src0", "src1"))
    base = d.filter(~F.col("source").isin("src0", "src1"))
    # key includes a cheap corpus fingerprint (mtime_ns + size of the
    # documents parquet path) so a regenerated corpus at the same
    # sf_dir can never reuse a stale index (code-review r9); the build
    # itself runs OUTSIDE the lock (keys for other sf_dirs must not
    # serialize behind a multi-second Spark write) with a lost-race /
    # failure cleanup.
    import shutil

    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    key = (sf_dir, st.st_mtime_ns, st.st_size, 8, 4, 3)
    with _IDX_LOCK:
        path = _IDX_CACHE.get(key)
    if path is None or not os.path.isdir(os.path.join(path, "bands")):
        built = tempfile.mkdtemp(prefix="lsh_idx_")
        try:
            lsh_index_write(base, built, k=8, bands=4)
        except BaseException:
            shutil.rmtree(built, ignore_errors=True)
            raise
        with _IDX_LOCK:
            # 'lost a race to a VALID build' and 'cache holds a stale
            # path' (e.g. a /tmp reaper deleted the dir mid-session)
            # must be distinguished here: setdefault would hand back
            # the dead path forever and rmtree every fresh build — a
            # permanent wedge (advice r9). Re-check the entry's dir
            # under the lock and REPAIR it with ours when invalid.
            cur = _IDX_CACHE.get(key)
            if cur is not None and os.path.isdir(os.path.join(cur, "bands")):
                path = cur
            else:
                _IDX_CACHE[key] = built
                path = built
        if path is not built:  # lost a race to a valid build — drop ours
            shutil.rmtree(built, ignore_errors=True)
    return dedup_against_index(new, base, spark, path, k=8, bands=4, threshold=0.2)


def _cc_oracle(k: int = 8, bands: int = 4, threshold: float = 0.2) -> str:
    """Recursive-CTE connected components over the SAME md5-minhash
    pair pipeline _md5_minhash_oracle checks: reach(a,b) = b reachable
    from a, component = min reachable node (including self)."""
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(sh, s -> md5(s || '|{i}')), 'min') AS mh{i}"
        for i in range(k)
    )
    r = k // bands
    band_cols = ", ".join(
        "md5({}) AS b{}".format(" || '|' || ".join(f"mh{b * r + j}" for j in range(r)), b)
        for b in range(bands)
    )
    band_match = " OR ".join(f"a.b{b} = b.b{b}" for b in range(bands))
    return f"""
    WITH RECURSIVE
    t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    mh AS (SELECT doc_id, {mh_cols} FROM t),
    bands AS (SELECT doc_id, {band_cols} FROM mh),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b ON a.doc_id < b.doc_id AND ({band_match})),
    p AS (SELECT c.id_a, c.id_b
          FROM cand c
          JOIN t ta ON ta.doc_id = c.id_a
          JOIN t tb ON tb.doc_id = c.id_b
          WHERE len(list_intersect(ta.sh, tb.sh))
                  / greatest(len(list_distinct(list_concat(ta.sh, tb.sh))), 1) >= {threshold}),
    edges AS (SELECT id_a AS x, id_b AS y FROM p
              UNION SELECT id_b, id_a FROM p),
    reach(a, b) AS (
        SELECT x, x FROM (SELECT DISTINCT x FROM edges)
        UNION
        SELECT r.a, e.y FROM reach r JOIN edges e ON e.x = r.b
    )
    SELECT a AS doc_id,
           CAST(MIN(b) AS BIGINT) AS component,
           (a = MIN(b)) AS is_canonical
    FROM reach GROUP BY a
    """


@register(
    "dedup_cluster_canonical",
    oracle=_cc_oracle(),
    tags=("dedup", "minhash", "graph", "portable"),
)
def dedup_cluster_canonical(spark, sf_dir):
    """Near-dup CLUSTER resolution (r5): the md5-minhash pair pipeline
    (identical to dedup_minhash_lsh_md5) fed into connected components
    by min-label propagation — per-document cluster assignment plus
    the canonical-keep flag, the form a curation pass consumes (keep
    doc_id == component, drop the rest). Oracle recomputes the whole
    thing in DuckDB: pairs via the md5 pipeline, components via a
    recursive reachability CTE."""
    from fuse_query_spark.operators.dedup import (
        connected_components,
        minhash_dedup_pairs_md5,
    )

    d = table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs_md5(d, k=8, bands=4, threshold=0.2)
    cc = connected_components(pairs)
    return cc.withColumn("is_canonical", F.col("doc_id") == F.col("component"))


def _md5_containment_oracle(k: int = 8, bands: int = 4, threshold: float = 0.5) -> str:
    """Directional-containment mirror of _md5_minhash_oracle: same
    shingle → md5 minhash → band → bucket-join candidates, then
    |A∩B|/|src| for BOTH directions of each undirected candidate."""
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(sh, s -> md5(s || '|{i}')), 'min') AS mh{i}"
        for i in range(k)
    )
    r = k // bands
    band_cols = ", ".join(
        "md5({}) AS b{}".format(" || '|' || ".join(f"mh{b * r + j}" for j in range(r)), b)
        for b in range(bands)
    )
    band_match = " OR ".join(f"a.b{b} = b.b{b}" for b in range(bands))
    return f"""
    WITH t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    mh AS (SELECT doc_id, {mh_cols} FROM t),
    bands AS (SELECT doc_id, {band_cols} FROM mh),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b ON a.doc_id < b.doc_id AND ({band_match})),
    scored AS (
        SELECT c.id_a, c.id_b,
               len(list_intersect(ta.sh, tb.sh)) AS inter,
               greatest(len(ta.sh), 1) AS na,
               greatest(len(tb.sh), 1) AS nb
        FROM cand c
        JOIN t ta ON ta.doc_id = c.id_a
        JOIN t tb ON tb.doc_id = c.id_b),
    directed AS (
        SELECT id_a AS src_id, id_b AS dst_id, inter / na AS containment FROM scored
        UNION ALL
        SELECT id_b AS src_id, id_a AS dst_id, inter / nb AS containment FROM scored)
    SELECT src_id, dst_id, containment FROM directed WHERE containment >= {threshold}
    """


@register(
    "dedup_containment_md5",
    oracle=_md5_containment_oracle(),
    tags=("dedup", "minhash", "lsh", "containment", "portable"),
)
def dedup_containment_md5(spark, sf_dir):
    """ASYMMETRIC near-dup detection (r5 late): directional shingle
    containment |A∩B|/|A| over MinHash-LSH candidates — catches a
    document quoted inside a larger one, which Jaccard structurally
    misses. Whole pipeline (shingle → md5 minhash → band → bucket join
    → both-direction containment) reproduces in DuckDB; int/int
    division yields identical doubles. See
    operators/dedup.py:minhash_containment_pairs (incl. the recall
    caveat for extreme asymmetry and the production mitigation)."""
    from fuse_query_spark.operators.dedup import minhash_containment_pairs

    d = table(spark, sf_dir, "documents")
    return minhash_containment_pairs(d, k=8, bands=4, threshold=0.5)


def _soft_dedup_oracle(k: int = 8, bands: int = 4, threshold: float = 0.2) -> str:
    """_cc_oracle's pipeline (md5 minhash -> bands -> verified pairs ->
    recursive-CTE components) extended with cluster sizes, the
    1/sqrt(size) weight, and the integer acceptance rule."""
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(sh, s -> md5(s || '|{i}')), 'min') AS mh{i}"
        for i in range(k)
    )
    r = k // bands
    band_cols = ", ".join(
        "md5({}) AS b{}".format(" || '|' || ".join(f"mh{b * r + j}" for j in range(r)), b)
        for b in range(bands)
    )
    band_match = " OR ".join(f"a.b{b} = b.b{b}" for b in range(bands))
    u_expr = (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), {j + 1}, 1)) - 1)"
            f" * {16 ** (7 - j)}"
            for j in range(8)
        )
        + ") % 1000000"
    )
    return f"""
    WITH RECURSIVE
    t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    mh AS (SELECT doc_id, {mh_cols} FROM t),
    bands AS (SELECT doc_id, {band_cols} FROM mh),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b ON a.doc_id < b.doc_id AND ({band_match})),
    p AS (SELECT c.id_a, c.id_b
          FROM cand c
          JOIN t ta ON ta.doc_id = c.id_a
          JOIN t tb ON tb.doc_id = c.id_b
          WHERE len(list_intersect(ta.sh, tb.sh))
                  / greatest(len(list_distinct(list_concat(ta.sh, tb.sh))), 1) >= {threshold}),
    edges AS (SELECT id_a AS x, id_b AS y FROM p
              UNION SELECT id_b, id_a FROM p),
    reach(a, b) AS (
        SELECT x, x FROM (SELECT DISTINCT x FROM edges)
        UNION
        SELECT r.a, e.y FROM reach r JOIN edges e ON e.x = r.b
    ),
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a),
    sizes AS (SELECT component, COUNT(*) AS csize FROM comp GROUP BY component),
    sized AS (
        SELECT d.doc_id AS doc_id,
               CAST(COALESCE(s.csize, 1) AS BIGINT) AS cluster_size,
               CAST({u_expr} AS BIGINT) AS u
        FROM documents d
        LEFT JOIN comp c ON c.doc_id = d.doc_id
        LEFT JOIN sizes s ON s.component = c.component)
    SELECT doc_id, cluster_size,
           round(1.0 / sqrt(cluster_size), 6) AS weight_r6,
           CAST(CASE WHEN u * u * cluster_size < 1000000000000
                THEN 1 ELSE 0 END AS INT) AS kept
    FROM sized
    """


@register(
    "dedup_soft_reweight",
    oracle=_soft_dedup_oracle(),
    tags=("dedup", "minhash", "graph", "reweight", "pipeline", "portable"),
)
def dedup_soft_reweight(spark, sf_dir):
    """SoftDeDup reweighting (r6; Xue et al. 2024): the md5-minhash
    LSH pair pipeline -> connected components -> per-doc sampling
    weight cluster_size^-1/2 and a deterministic integer-exact keep
    flag (u^2 * size < 1e12). Down-weights duplicate families instead
    of dropping them — the published middle ground between hard dedup
    and no dedup. The oracle recomputes the ENTIRE path in DuckDB,
    recursive-CTE components included. See
    operators/dedup.py:soft_dedup_weights."""
    from fuse_query_spark.operators.dedup import (
        minhash_dedup_pairs_md5,
        soft_dedup_weights,
    )

    d = table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs_md5(d, k=8, bands=4, threshold=0.2)
    return soft_dedup_weights(d, pairs)
