"""Training-pipeline sampling / split / decontamination queries over
`documents` — deterministic (hash-based), so fully oracle-checkable."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuse_query_spark.operators.sampling import (
    contaminated_ids,
    deterministic_split,
    temperature_quotas,
)
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import table

# DuckDB mirror of hash_bucket(): integer of the first 8 md5 hex chars
# (nibble-by-nibble strpos — same pattern as the md5 dedup oracles).
_BUCKET = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    + ") % 100"
)


@register(
    "sample_split_documents",
    oracle=f"""
    WITH b AS (SELECT *, {_BUCKET} AS bucket FROM documents)
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM b GROUP BY split
    """,
    tags=("pipeline", "sampling", "split"),
)
def sample_split_documents(spark, sf_dir):
    """Deterministic train/val/test split (90/5/5) by md5-hash bucket
    of doc_id, with per-split stats. No shuffle for the split itself
    (narrow projection); one partial/final aggregate for the stats.
    Same doc always lands in the same split at any scale factor."""
    d = deterministic_split(table(spark, sf_dir, "documents"))
    return d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.min("doc_id").alias("first_doc"),
    )


_TOKS = "string_split_regex(trim(text), '\\s+')"
_SH4 = f"""list_distinct(list_transform(range(0, len({_TOKS}) - 3),
    i -> list_aggregate({_TOKS}[i+1:i+4], 'string_agg', ' ')))"""


@register(
    "decontaminate_ngram",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SH4}) AS s FROM documents
    )
    SELECT a.doc_id AS doc_id, COUNT(DISTINCT a.s) AS n_shared
    FROM sh a
    JOIN (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0) e USING (s)
    WHERE a.doc_id % 97 <> 0
    GROUP BY a.doc_id
    """,
    tags=("pipeline", "dedup", "decontamination"),
)
def decontaminate_ngram(spark, sf_dir):
    """Benchmark decontamination: training docs (doc_id % 97 != 0)
    sharing a word 4-gram with the synthetic eval slice
    (doc_id % 97 == 0). Explode → equi-join on the shingle → count
    distinct shared shingles per doc. The eval side is NOT broadcast:
    at 100 TB even a 1% eval slice is too big; AQE decides from actual
    sizes."""
    d = table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    eval_set = d.filter(F.col("doc_id") % 97 == 0)
    return contaminated_ids(corpus, eval_set, n=4)

@register(
    "decontaminate_bloom",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SH4}) AS s FROM documents
    )
    SELECT a.doc_id AS doc_id, COUNT(DISTINCT a.s) AS n_shared
    FROM sh a
    JOIN (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0) e USING (s)
    WHERE a.doc_id % 97 <> 0
    GROUP BY a.doc_id
    """,
    tags=("pipeline", "dedup", "decontamination", "bloom"),
)
def decontaminate_bloom(spark, sf_dir):
    """Decontamination with the Bloom-style broadcast bucket
    prefilter in front of the exact shingle join — identical output
    to decontaminate_ngram (same oracle), but corpus shingles whose
    hash bucket no eval shingle occupies die map-side before the
    shuffle. See operators/sampling.py:contaminated_ids_bloom for
    why Catalyst's runtime bloom filter can't do this one itself."""
    from fuse_query_spark.operators.sampling import contaminated_ids_bloom

    d = table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    eval_set = d.filter(F.col("doc_id") % 97 == 0)
    # adaptive=True: keep the measured saturation gate on the driver/
    # bench path (construction-time laziness is the operator default)
    return contaminated_ids_bloom(corpus, eval_set, n=4, adaptive=True)


_Q_TOKS = "string_split_regex(trim(text), '\\s+')"


@register(
    "pack_token_bins",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id, len({_Q_TOKS}) AS ntok FROM documents
    ),
    c AS (
        SELECT source, doc_id, ntok,
               SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT source, CAST(floor((cum - ntok) / 4096) AS BIGINT) AS bin,
           COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS sum_tokens
    FROM c GROUP BY source, bin
    """,
    tags=("pipeline", "packing"),
)
def pack_token_bins(spark, sf_dir):
    """Sequence packing for training batches: assign docs to ~4096-token
    bins per source via a running token count (deterministic doc_id
    order), then per-bin stats. Integer arithmetic only — exact across
    engines. One shuffle on source for the window, reused by the
    aggregate. At 100 TB the per-source window is the skew risk: a
    dominant source serializes — real deployments pack per (source,
    shard) with a hash-derived shard key, which keeps identical
    semantics per shard."""
    from pyspark.sql.window import Window

    from fuse_query_spark.operators.text import token_count

    d = table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id", token_count("text").alias("ntok"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = t.withColumn("cum", F.sum("ntok").over(w))
    return (
        # explicit floor: Spark's double→bigint cast truncates but
        # DuckDB's ROUNDS — a bare cast would disagree at frac ≥ .5
        c.withColumn("bin", F.floor((F.col("cum") - F.col("ntok")) / 4096))
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("ntok").cast("bigint").alias("sum_tokens"))
    )

def _quality_oracle_cte() -> str:
    from fuse_query_spark.queries.text import _SW_EN, _TOKS

    return f"""
    WITH t AS (
        SELECT source, doc_id, text, {_TOKS} AS toks,
               len(list_filter({_TOKS}, x -> list_contains([{_SW_EN}], lower(x)))) AS sw
        FROM documents
    ),
    q AS (
        SELECT source, doc_id,
               (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
                + sw / greatest(len(toks), 1)
                + length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                  / greatest(length(text), 1)
               ) / 3.0 AS quality
        FROM t
    )"""


@register(
    "sample_quota_per_source",
    oracle=_quality_oracle_cte()
    + """
    SELECT source, doc_id, quality
    FROM (SELECT source, doc_id, quality,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY quality DESC, doc_id) AS rn
          FROM q)
    WHERE rn <= 20
    """,
    tags=("pipeline", "sampling", "quota"),
)
def sample_quota_per_source(spark, sf_dir):
    """Per-domain quota sampling: the top 20 docs per source by quality
    score (doc_id tie-break makes the ranking total). The quality
    heuristic is rational arithmetic (bit-equal across engines — see
    text_quality_score), so ranking on it is oracle-safe. One shuffle
    on source; the window computes a running rank, not a full sort of
    the corpus."""
    from pyspark.sql.window import Window

    from fuse_query_spark.operators.text import quality_score, tokens

    d = table(spark, sf_dir, "documents")
    tok = d.select("source", "doc_id", "text", tokens("text").alias("_toks"))
    q = tok.select(
        "source", "doc_id", quality_score("text", toks=F.col("_toks")).alias("quality")
    )
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("source", "doc_id", "quality")
    )


@register(
    "sample_temperature_mix",
    oracle="""
    WITH wts AS (
        SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS w
        FROM documents GROUP BY source
    ), wa AS (
        SELECT source, pow(w, 0.5) AS wa FROM wts
    ), q AS (
        SELECT source,
               CAST(floor(200.0 * wa / (SELECT SUM(wa) FROM wa)) AS BIGINT) AS quota
        FROM wa
    ), ranked AS (
        SELECT d.*, q.quota,
               row_number() OVER (PARTITION BY d.source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents d JOIN q USING (source)
    )
    SELECT source, quota, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM ranked WHERE rk <= quota
    GROUP BY source, quota
    """,
    tags=("pipeline", "sampling", "temperature"),
)
def sample_temperature_mix(spark, sf_dir):
    """Temperature-weighted source mixing (alpha=0.5, 200 docs out):
    quota_s = floor(200 * chars_s^0.5 / sum), docs picked per source by
    deterministic md5 rank — see operators.sampling.temperature_quotas
    for the scale posture (tiny weight aggregate, broadcast quota
    join, one per-source window; no corpus-wide sort)."""
    return temperature_quotas(table(spark, sf_dir, "documents"))


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id, text, len({_Q_TOKS}) AS ntok FROM documents
    ),
    c AS (
        SELECT source, doc_id, text, ntok,
               SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT source, CAST(floor((cum - ntok) / 4096) AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS sum_tokens,
           md5(string_agg(text, ' <|eos|> ' ORDER BY doc_id)) AS seq_md5
    FROM c GROUP BY source, bin
    """,
    tags=("pipeline", "packing", "sequence"),
)
def pack_sequences(spark, sf_dir):
    """The packing pipeline's FINAL step: materialize each ~4096-token
    bin as one training sequence — documents concatenated in
    deterministic doc_id order with an EOS separator (md5 of the
    sequence in the output so the oracle compares content, not
    megabytes). Same binning as pack_token_bins; the concat is a
    collect_list sorted by a struct key — per-bin data, never
    driver-side. At 100 TB bins are bounded (~4096 tokens), so the
    per-group state the sort+concat holds is constant-size regardless
    of corpus scale — the property that makes this shape safe where
    an unbounded per-key collect would OOM."""
    from pyspark.sql.window import Window

    from fuse_query_spark.operators.text import token_count

    d = table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id", "text", token_count("text").alias("ntok"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = t.withColumn("cum", F.sum("ntok").over(w))
    seq = F.concat_ws(
        " <|eos|> ",
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
            lambda x: x.text,
        ),
    )
    return (
        c.withColumn("bin", F.floor((F.col("cum") - F.col("ntok")) / 4096))
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("sum_tokens"),
            F.md5(seq).alias("seq_md5"),
        )
    )


@register(
    "sample_stratified_rates",
    oracle=f"""
    WITH b AS (SELECT *, {_BUCKET} AS bucket FROM documents)
    SELECT lang, COUNT(*) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS first_kept,
           CAST(MAX(doc_id) AS BIGINT) AS last_kept
    FROM b
    WHERE bucket < CASE lang WHEN 'en' THEN 30
                             WHEN 'zh' THEN 60
                             ELSE 100 END
    GROUP BY lang
    """,
    tags=("pipeline", "sampling", "stratified"),
)
def sample_stratified_rates(spark, sf_dir):
    """Rate-based stratified sampling — the data-mixing primitive:
    keep 30% of English, 60% of Chinese, 100% of everything else, by
    the SAME md5 hash bucket as the train/val/test split, so the
    decision is deterministic per document and stable under corpus
    growth (df.sampleBy cannot promise either). A pure narrow filter
    — no shuffle at all before the stats aggregate; at 100 TB this
    is a scan predicate."""
    from fuse_query_spark.operators.sampling import hash_bucket

    d = table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 30)
        .when(F.col("lang") == "zh", 60)
        .otherwise(100)
    )
    return (
        d.filter(hash_bucket("doc_id") < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("first_kept"),
            F.max("doc_id").alias("last_kept"),
        )
    )


@register(
    "pipeline_curation_end_to_end",
    oracle=_quality_oracle_cte()
    + f""",
    fp AS (
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canon
        FROM documents
    ),
    tk AS (
        SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
        FROM (SELECT doc_id, {_Q_TOKS} AS l FROM documents)
    ),
    base AS (
        SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct
        FROM tk GROUP BY doc_id
    ),
    topn AS (
        SELECT doc_id, MAX(n) AS top_n
        FROM (SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram, COUNT(*) AS n
              FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.i = a.i + 1
              GROUP BY a.doc_id, bigram)
        GROUP BY doc_id
    ),
    bk AS (SELECT doc_id, {_BUCKET} AS bucket FROM documents)
    SELECT d.source, COUNT(*) AS n_docs,
           CAST(SUM(base.n_tokens) AS BIGINT) AS sum_tokens,
           CAST(MIN(d.doc_id) AS BIGINT) AS first_doc
    FROM documents d
    JOIN fp   ON fp.doc_id = d.doc_id
    JOIN base ON base.doc_id = d.doc_id
    JOIN topn ON topn.doc_id = d.doc_id
    JOIN q    ON q.doc_id = d.doc_id
    JOIN bk   ON bk.doc_id = d.doc_id
    WHERE fp.canon = d.doc_id
      AND NOT ((base.n_tokens - base.n_distinct)
                   / CAST(base.n_tokens AS DOUBLE) > 0.8
               OR topn.top_n / CAST(base.n_tokens - 1 AS DOUBLE) > 0.18)
      AND q.quality >= 0.5
      AND d.lang <> 'zh'
      AND bk.bucket < 90
    GROUP BY d.source
    """,
    tags=("pipeline", "curation", "capstone"),
)
def pipeline_curation_end_to_end(spark, sf_dir):
    """The whole curation pass as ONE declarative plan — the capstone
    composition a real training-data pipeline runs: exact-dedup
    canonical pick (min doc_id per md5 fingerprint), Gopher
    repetition filter (dup-token and top-bigram thresholds), quality
    score >= 0.5, language gate, and the deterministic train split,
    rolled up per source. Every stage reuses the operator the
    standalone queries verify; composing them stays a single Catalyst
    plan — shared scans, one aggregate per stage, no materialization
    between stages. Docs too short to have bigrams (<2 tokens) drop
    out of the repetition join on both engines identically."""
    from pyspark.sql.window import Window

    from fuse_query_spark.operators.text import (
        fingerprint_md5,
        ngrams_from_tokens,
        quality_score,
        tokens,
    )
    from fuse_query_spark.operators.sampling import hash_bucket

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", "lang", "text", tokens("text").alias("_toks")
    )
    enriched = tok.select(
        "doc_id",
        "source",
        "lang",
        F.size("_toks").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).alias("n_distinct"),
        quality_score("text", toks=F.col("_toks")).alias("quality"),
        fingerprint_md5("text").alias("_fp"),
        hash_bucket("doc_id").alias("bucket"),
        ngrams_from_tokens(F.col("_toks"), 2).alias("_bgs"),
    )
    canon = F.min("doc_id").over(Window.partitionBy("_fp"))
    topn = (
        enriched.select("doc_id", F.explode("_bgs").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_n"))
    )
    dup_frac = (F.col("n_tokens") - F.col("n_distinct")).cast("double") / F.col("n_tokens")
    top_frac = F.col("top_n").cast("double") / (F.col("n_tokens") - 1)
    return (
        enriched.withColumn("_canon", canon)
        .join(topn, "doc_id")
        .filter(
            (F.col("_canon") == F.col("doc_id"))
            & ~((dup_frac > 0.8) | (top_frac > 0.18))
            & (F.col("quality") >= 0.5)
            & (F.col("lang") != "zh")
            & (F.col("bucket") < 90)
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


def _funnel_oracle() -> str:
    from fuse_query_spark.operators.text import PII_RULES, STOPWORDS

    sw = ",".join(f"'{w}'" for w in STOPWORDS["en"])
    toks = "string_split_regex(trim(text), '\\s+')"
    pii_total = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for _, pat, _ in PII_RULES
    )
    return f"""
    WITH t AS (
        SELECT source, lang, text, {toks} AS toks,
               len(list_filter({toks}, x -> list_contains([{sw}], lower(x)))) AS sw
        FROM documents
    ), q AS (
        SELECT source, lang, toks,
               (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
                + sw / greatest(len(toks), 1)
                + length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                  / greatest(length(text), 1)) / 3.0 AS quality,
               CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
                   / greatest(len(toks), 1) AS dup_frac,
               {pii_total} AS pii_hits
        FROM t
    ), s AS (
        SELECT source,
               (lang = 'en') AS s1,
               (lang = 'en') AND len(toks) BETWEEN 10 AND 1000
                   AND quality >= 0.5 AS s2,
               (lang = 'en') AND len(toks) BETWEEN 10 AND 1000
                   AND quality >= 0.5 AND dup_frac <= 0.8 AS s3,
               (lang = 'en') AND len(toks) BETWEEN 10 AND 1000
                   AND quality >= 0.5 AND dup_frac <= 0.8
                   AND pii_hits = 0 AS s4
        FROM q
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
           CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetition_ok,
           CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n_final
    FROM s GROUP BY source
    """


@register(
    "pipeline_filter_funnel",
    oracle=_funnel_oracle(),
    tags=("pipeline", "curation", "funnel", "observability"),
)
def pipeline_filter_funnel(spark, sf_dir):
    """Curation-funnel observability (r5): per-source survivor counts
    through CUMULATIVE filter stages (lang -> length+quality ->
    repetition -> PII-clean) in ONE scan — the report every pipeline
    run emits so a mis-tuned filter that nukes a source is visible
    immediately. Pure Column conditional aggregation; no UDF, one
    shuffle on the (tiny) source key."""
    from fuse_query_spark.operators.text import PII_RULES, quality_score, tokens

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", "lang", "text", tokens("text").alias("_toks")
    )
    # materialization exchange keyed on the HIGH-cardinality doc_id —
    # keying on `source` (tens of values) would collapse parallelism
    # at scale; the per-source final shuffle stays tiny either way
    # because the conditional counts partial-aggregate map-side
    tok = tok.repartition(
        tok.sparkSession.sparkContext.defaultParallelism, "doc_id"
    ).drop("doc_id")
    n = F.size(F.col("_toks"))
    quality = quality_score("text", toks=F.col("_toks"))
    dup_frac = (n - F.size(F.array_distinct(F.col("_toks")))).cast("double") / F.greatest(
        n, F.lit(1)
    )
    pii_hits = None
    for _, pat, _ in PII_RULES:
        c = F.regexp_count(F.col("text"), F.lit(pat))
        pii_hits = c if pii_hits is None else pii_hits + c
    s1 = F.col("lang") == "en"
    s2 = s1 & n.between(10, 1000) & (quality >= 0.5)
    s3 = s2 & (dup_frac <= 0.8)
    s4 = s3 & (pii_hits == 0)
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        cnt(s1).alias("n_lang"),
        cnt(s2).alias("n_quality"),
        cnt(s3).alias("n_repetition_ok"),
        cnt(s4).alias("n_final"),
    )


def _bucket_of(expr: str) -> str:
    """hash_bucket() mirror over an arbitrary SQL expression."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5(CAST({expr} AS VARCHAR)), {j + 1}, 1)) - 1)"
            f" * {16 ** (7 - j)}"
            for j in range(8)
        )
        + ") % 100"
    )


def _leakage_safe_oracle() -> str:
    from fuse_query_spark.queries.dedup import _cc_oracle

    gk = "COALESCE(c.component, d.doc_id)"
    b = _bucket_of(gk)
    return f"""
    SELECT d.doc_id,
           {gk} AS group_key,
           CASE WHEN {b} < 90 THEN 'train'
                WHEN {b} < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN ({_cc_oracle()}) c ON d.doc_id = c.doc_id
    """


def _leakage_inputs(spark, sf_dir):
    """(documents, verified near-dup pairs) — shared by the registry
    query and the broadcast-size-gate plan test."""
    from fuse_query_spark.operators.dedup import minhash_dedup_pairs_md5

    d = table(spark, sf_dir, "documents")
    return d, minhash_dedup_pairs_md5(d, k=8, bands=4, threshold=0.2)


@register(
    "sample_split_leakage_safe",
    oracle=_leakage_safe_oracle(),
    tags=("pipeline", "sampling", "split", "dedup", "graph"),
)
def sample_split_leakage_safe(spark, sf_dir):
    """Leakage-safe train/val/test split (r5): near-dup components
    (the md5-minhash pair pipeline -> connected components) share one
    split bucket, so no near-duplicate pair ever straddles train and
    eval — the contamination guard a doc-keyed split lacks. Oracle
    recomputes pairs + components (recursive CTE) + the md5 bucket.
    See operators/sampling.py:leakage_safe_split."""
    from fuse_query_spark.operators.sampling import leakage_safe_split

    d, pairs = _leakage_inputs(spark, sf_dir)
    return leakage_safe_split(d, pairs).select("doc_id", "group_key", "split")


def _md5i(expr: str) -> str:
    """DuckDB mirror of operators.dedup.md5_int32 over an arbitrary
    expression: integer of the first 8 md5 hex chars."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({expr}), {j + 1}, 1)) - 1)"
            f" * {16 ** (7 - j)}"
            for j in range(8)
        )
        + ")"
    )


def _dsir_oracle(n_buckets: int = 512, select_frac: float = 0.1, stop_frac: float = 0.07) -> str:
    from fuse_query_spark.queries.text import _SW_EN

    b = n_buckets
    return f"""
    WITH t AS (SELECT doc_id, {_Q_TOKS} AS toks FROM documents),
    pos AS (SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS w FROM t),
    feat AS (
        SELECT doc_id, {_md5i('w')} % {b} AS f FROM pos
        UNION ALL
        SELECT a.doc_id, {_md5i("a.w || ' ' || b.w")} % {b} AS f
        FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ),
    dtf AS (SELECT doc_id, f, COUNT(*) AS tf FROM feat GROUP BY doc_id, f),
    tgt_ids AS (
        SELECT doc_id FROM pos GROUP BY doc_id
        HAVING SUM(CASE WHEN lower(w) IN ({_SW_EN}) THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
               >= {stop_frac!r}
    ),
    raw AS (SELECT f, SUM(tf) AS c_raw FROM dtf GROUP BY f),
    tgt AS (SELECT f, SUM(tf) AS c_tgt FROM dtf JOIN tgt_ids USING (doc_id) GROUP BY f),
    tot AS (SELECT (SELECT SUM(c_raw) FROM raw) AS t_raw,
                   (SELECT SUM(c_tgt) FROM tgt) AS t_tgt),
    lr AS (
        SELECT raw.f,
               ln((COALESCE(c_tgt, 0) + 1.0) / (t_tgt + {float(b)!r}))
             - ln((c_raw + 1.0) / (t_raw + {float(b)!r})) AS lr
        FROM raw LEFT JOIN tgt USING (f) CROSS JOIN tot
    ),
    scored AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_feat,
               round(SUM(tf * lr), 4) AS logw_r
        FROM dtf JOIN lr USING (f) GROUP BY doc_id
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM scored)
    SELECT doc_id, n_feat, logw_r,
           CAST(CASE WHEN row_number() OVER (ORDER BY logw_r DESC, doc_id)
                          <= CEIL({select_frac!r} * n_docs)
                THEN 1 ELSE 0 END AS INT) AS selected
    FROM scored CROSS JOIN n
    """


@register(
    "sample_dsir_importance",
    oracle=_dsir_oracle(),
    tags=("sampling", "pipeline", "dsir", "importance", "selection"),
)
def sample_dsir_importance(spark, sf_dir):
    """DSIR data selection (r6; Xie et al. 2023 "Data Selection for
    Language Models via Importance Resampling"): hashed unigram+bigram
    bag-of-ngrams models for a target distribution (here: documents
    with >= 7% English-stopword density, a deterministic intrinsic
    stand-in for a target-domain sample) and the raw corpus; each doc
    scored by its Laplace-smoothed log importance weight; top 10% kept
    via a deterministic rounded-score cut. The log-ratio table is
    <= 512 rows — broadcast, so scoring adds no shuffle beyond the
    feature-count aggs. See operators/sampling.py:dsir_select for the
    100 TB posture (quantile-threshold cut instead of the global
    window)."""
    from fuse_query_spark.operators.sampling import dsir_select

    return dsir_select(table(spark, sf_dir, "documents"))
