"""Text-analysis queries over `documents` — the training-data-pipeline
surface (SURVEY §7 Phase 5): token stats, quality scoring, language ID,
fingerprinting. All pure-SQL-expressible → full oracle coverage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fuse_query_spark.operators.text import (
    STOPWORDS,
    fingerprint_md5,
    language_id,
    min_shingle_fingerprint,
    quality_score,
    regexp_tokens,
    stopword_hits,
    token_count,
    tokens,
    uniq_token_count,
)
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import spread_table, table

_TOKS = "string_split_regex(trim(text), '\\s+')"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS})                 AS n_tokens,
           len(list_distinct({_TOKS}))  AS n_uniq_tokens,
           list_aggregate(list_transform({_TOKS}, x -> length(x)), 'sum')
               / len({_TOKS})           AS avg_token_len,
           length(text)                 AS n_chars_measured
    FROM documents
    """,
    tags=("text", "tokenize"),
)
def text_token_stats(spark, sf_dir):
    """Whitespace token counting — JVM-side split + array ops, no UDF.
    avg_token_len is int/int division → identical double on both
    engines."""
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    t = tokens("text")
    sum_len = F.aggregate(F.transform(t, F.length), F.lit(0), lambda a, x: a + x)
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        uniq_token_count("text").alias("n_uniq_tokens"),
        (sum_len / token_count("text")).alias("avg_token_len"),
        F.length("text").alias("n_chars_measured"),
    )


_SW_EN = ",".join(f"'{w}'" for w in STOPWORDS["en"])


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, {_TOKS} AS toks,
               len(list_filter({_TOKS}, x -> list_contains([{_SW_EN}], lower(x)))) AS sw
        FROM documents
    )
    SELECT doc_id,
           (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END
            + sw / greatest(len(toks), 1)
            + length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              / greatest(length(text), 1)
           ) / 3.0 AS quality,
           sw AS stopword_hits
    FROM t
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark, sf_dir):
    """Composite quality heuristic (length band + stopword ratio +
    alphabetic density) — the filter stage of a data pipeline, rational
    arithmetic only so the oracle hashes bit-equal."""
    d = table(spark, sf_dir, "documents")
    # materialize tokens below an exchange so the lambda filters read
    # an array, not a re-split-per-element expression (see
    # operators/text.stopword_hits note)
    tok = d.select("doc_id", "text", tokens("text").alias("_toks"))
    tok = tok.repartition(tok.sparkSession.sparkContext.defaultParallelism, "doc_id")
    t = F.col("_toks")
    return tok.select(
        "doc_id",
        quality_score("text", toks=t).alias("quality"),
        stopword_hits("text", "en", toks=t).alias("stopword_hits"),
    )


def _lang_id_oracle() -> str:
    langs = list(STOPWORDS)
    score_cols = ", ".join(
        "len(list_filter({toks}, x -> list_contains([{words}], lower(x)))) AS s_{lang}".format(
            toks=_TOKS, words=",".join(f"'{w}'" for w in ws), lang=lang
        )
        for lang, ws in STOPWORDS.items()
    )
    # earlier language wins ties — mirrors the Spark struct-max priority
    cases = []
    for i, lang in enumerate(langs):
        rest = [f"s_{lang} >= s_{other}" for other in langs[i + 1 :]]
        cases.append(f"WHEN {' AND '.join(rest)} THEN '{lang}'" if rest else f"ELSE '{lang}'")
    case = "CASE " + " ".join(cases) + " END"
    return f"""
    WITH scored AS (SELECT doc_id, {score_cols} FROM documents)
    SELECT {case} AS lang_pred, COUNT(*) AS n
    FROM scored GROUP BY lang_pred
    """


@register(
    "text_lang_id",
    oracle=_lang_id_oracle(),
    tags=("text", "lang_id"),
)
def text_lang_id(spark, sf_dir):
    """Stopword-vote language ID (deterministic tie-break by priority).
    The corpus is synthetic word-salad, so this tests the operator's
    determinism, not linguistic accuracy."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "text", tokens("text").alias("_toks"))
    tok = tok.repartition(tok.sparkSession.sparkContext.defaultParallelism, "doc_id")
    return (
        tok.select(language_id("text", toks=F.col("_toks")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_digit_runs,
           CAST(length(text) AS DOUBLE)
             / greatest(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 1)
             AS chars_per_token
    FROM documents
    """,
    tags=("text", "tokenize", "bpe"),
)
def text_bpe_token_count(spark, sf_dir):
    """BPE-ish pre-token counting (letter/digit runs + punctuation) —
    the token-budget estimator of a training-data pipeline. Same regex
    class semantics on both engines → full oracle check."""
    d = table(spark, sf_dir, "documents")
    bpe = regexp_tokens("text")
    digits = F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)
    return d.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(digits).alias("n_digit_runs"),
        (F.length("text").cast("double") / F.greatest(F.size(bpe), F.lit(1))).alias(
            "chars_per_token"
        ),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           md5(lower(trim(text))) AS fp_md5,
           list_aggregate(
               list_transform(range(0, len(toks) - 2),
                              i -> md5(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])),
               'min') AS fp_min_shingle
    FROM t
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprints: md5 of normalized text (exact dup key) +
    lexicographic-min shingle md5 (winnowing-style near-dup prefilter).
    md5 hex strings are engine-portable; xxhash64 is not."""
    d = spread_table(spark, sf_dir, "documents", "doc_id")
    return d.select(
        "doc_id",
        fingerprint_md5("text").alias("fp_md5"),
        min_shingle_fingerprint("text", 3).alias("fp_min_shingle"),
    )


@register(
    "text_repetition_metrics",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
        FROM (SELECT doc_id, {_TOKS} AS l FROM documents)
    ), base AS (
        SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct
        FROM toks GROUP BY doc_id
    ), bg AS (
        SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ), cnt AS (
        SELECT doc_id, bigram, COUNT(*) AS n FROM bg GROUP BY doc_id, bigram
    ), top AS (
        SELECT doc_id, bigram, n,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY n DESC, bigram) AS rn
        FROM cnt
    )
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_tokens - b.n_distinct AS DOUBLE) / b.n_tokens AS dup_token_frac,
           t.bigram AS top_bigram,
           CAST(t.n AS BIGINT) AS top_bigram_n,
           CAST(t.n AS DOUBLE) / (b.n_tokens - 1) AS top_bigram_frac,
           (CAST(b.n_tokens - b.n_distinct AS DOUBLE) / b.n_tokens > 0.8
            OR CAST(t.n AS DOUBLE) / (b.n_tokens - 1) > 0.18) AS repetition_flag
    FROM base b JOIN top t ON b.doc_id = t.doc_id AND t.rn = 1
    WHERE b.n_tokens >= 2
    """,
    tags=("text", "quality", "repetition"),
)
def text_repetition_metrics(spark, sf_dir):
    """Gopher-style repetition filters per document: duplicate-token
    fraction and most-frequent-bigram coverage, with the resulting
    keep/drop flag. See operators/text.py:repetition_metrics for the
    exactness and scale notes."""
    from fuse_query_spark.operators.text import repetition_metrics

    return repetition_metrics(spread_table(spark, sf_dir, "documents", "doc_id"))


# --- r5: PII redaction / unigram-LM quality / tf-idf keywords -----------

# The corpus is letter-only word soup, so the PII query plants
# deterministic synthetic PII derived from doc_id — BOTH engines build
# the same augmented string, then count and redact it. Concatenation
# is explicit (`||` / F.concat) so spacing is bit-identical.
_PII_AUG = (
    "text || ' user' || CAST(doc_id AS VARCHAR) || '@example.com 10.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 97 AS VARCHAR)"
    " || CASE WHEN doc_id % 3 = 0 THEN ' call 555-123-4567' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' ssn 078-05-1120' ELSE '' END"
)


def _pii_oracle() -> str:
    from fuse_query_spark.operators.text import PII_RULES

    counts = ", ".join(
        f"len(regexp_extract_all(full_text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_RULES
    )
    red = "full_text"
    for _, pat, repl in PII_RULES:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG} AS full_text FROM documents)
    SELECT doc_id, {counts},
           md5({red}) AS redacted_md5,
           length({red}) AS redacted_len
    FROM aug
    """


@register(
    "text_pii_redact",
    oracle=_pii_oracle(),
    tags=("text", "pii", "redaction", "pipeline"),
)
def text_pii_redact(spark, sf_dir):
    """PII scrubbing stage (r5): ordered regexp_replace chain
    (email -> SSN -> phone -> IPv4) + per-category audit counts on the
    original. Pure Column codegen at scan speed — the oracle checks
    the md5 of the fully redacted string, so the replacement semantics
    (global, ordered, boundary-anchored) match end-to-end."""
    from fuse_query_spark.operators.text import pii_counts, redact_pii

    d = spread_table(spark, sf_dir, "documents", "doc_id")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            (F.col("doc_id") % 97).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" ssn 078-05-1120")).otherwise(
                F.lit("")
            ),
        ).alias("full_text"),
    )
    red = redact_pii("full_text")
    return aug.select(
        "doc_id",
        *pii_counts("full_text"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("redacted_len"),
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
    vocab AS (SELECT w, SUM(tf) AS c FROM tf GROUP BY w),
    tot AS (SELECT SUM(c) AS t FROM vocab)
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           round(SUM(tf.tf * -ln(vocab.c / tot.t)) / SUM(tf.tf), 4) AS avg_nll
    FROM tf JOIN vocab ON tf.w = vocab.w CROSS JOIN tot
    GROUP BY tf.doc_id
    """,
    tags=("text", "quality", "language_model", "pipeline"),
)
def text_unigram_logprob(spark, sf_dir):
    """Perplexity-proxy quality scoring (r5): mean token NLL under the
    corpus's own unigram LM (the engine-native analog of CCNet's KenLM
    filter). Compared at 1e-4 granularity — the weighted double sum
    differs in final ulps between engines. See
    operators/text.py:unigram_logprob for the scale shape."""
    from fuse_query_spark.operators.text import unigram_logprob

    return unigram_logprob(table(spark, sf_dir, "documents"))


@register(
    "text_tfidf_keywords",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
    dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.w,
               round(tf.tf * ln(nd.n_docs / dfq.df), 4) AS score
        FROM tf JOIN dfq ON tf.w = dfq.w CROSS JOIN nd
    ),
    ranked AS (
        SELECT doc_id, w, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, w) AS rank
        FROM scored
    )
    SELECT doc_id, CAST(rank AS INT) AS rank, w AS term, score
    FROM ranked WHERE rank <= 3
    """,
    tags=("text", "tfidf", "keywords", "pipeline"),
)
def text_tfidf_keywords(spark, sf_dir):
    """Top-3 tf-idf keywords per document (r5) — corpus tagging stage.
    Deterministic: rank on the rounded score, term string breaks ties.
    See operators/text.py:tfidf_topk for the scale shape."""
    from fuse_query_spark.operators.text import tfidf_topk

    return tfidf_topk(spread_table(spark, sf_dir, "documents", "doc_id"), k=3)


@register(
    "text_chunk_windows",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks), 1), 48)) AS start
          FROM t)
    SELECT doc_id,
           CAST(start // 48 AS INT) AS chunk_id,
           CAST(start AS INT) AS start_token,
           len(list_slice(toks, start + 1, start + 64)) AS n_chunk_tokens,
           array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text
    FROM s
    """,
    tags=("text", "chunking", "rag", "pipeline"),
)
def text_chunk_windows(spark, sf_dir):
    """Overlapping token-window chunking (r5): 64-token chunks every 48
    tokens (16-token overlap) — the RAG / context-window prep stage.
    Linear scan-side work, no shuffle. See
    operators/text.py:chunk_windows."""
    from fuse_query_spark.operators.text import chunk_windows

    return chunk_windows(spread_table(spark, sf_dir, "documents", "doc_id"), chunk_tokens=64, stride=48)


@register(
    "dedup_chunk_fraction",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks), 1), 32)) AS start
          FROM t),
    c AS (SELECT doc_id,
                 md5(array_to_string(list_slice(toks, start + 1, start + 32), ' ')) AS h
          FROM s),
    cnt AS (SELECT h, COUNT(*) AS n_occ FROM c GROUP BY h)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS dup_chunk_frac
    FROM c JOIN cnt USING (h) GROUP BY doc_id
    """,
    tags=("dedup", "chunking", "paragraph", "pipeline"),
)
def dedup_chunk_fraction(spark, sf_dir):
    """Chunk-level (paragraph-analog) dedup scoring (r5): fraction of a
    document's 32-token windows that occur more than once corpus-wide
    — the Dolma-style doc-level drop signal. One hash agg on the chunk
    md5 + one doc rollup. See operators/text.py:chunk_dup_fraction."""
    from fuse_query_spark.operators.text import chunk_dup_fraction

    return chunk_dup_fraction(spread_table(spark, sf_dir, "documents", "doc_id"), chunk_tokens=32, stride=32)


@register(
    "text_winnow_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id,
                 list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                     i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS h
          FROM t),
    f AS (SELECT doc_id, h,
                 list_sort(list_distinct(list_filter(
                     list_transform(range(0, greatest(len(h) - 4, 0) + 1),
                         p -> list_min(h[p+1 : p+4])),
                     x -> x IS NOT NULL))) AS fps
          FROM g)
    SELECT doc_id,
           len(h) AS n_grams,
           len(fps) AS n_fingerprints,
           len(fps) / greatest(len(h), 1) AS fp_density,
           md5(array_to_string(fps, '')) AS fp_digest
    FROM f
    """,
    tags=("text", "fingerprint", "winnowing", "pipeline"),
)
def text_winnow_fingerprint(spark, sf_dir):
    """Winnowing fingerprints (r5): k=3 grams, w=4 windows — the
    position-robust rolling-hash fingerprint with the ~2/(w+1) density
    guarantee. fp_digest (md5 of the sorted set) is the exact-set
    dedup key. See operators/text.py:winnow_fingerprints."""
    from fuse_query_spark.operators.text import winnow_fingerprints

    return winnow_fingerprints(spread_table(spark, sf_dir, "documents", "doc_id"), k=3, w=4)


def _bigram_logprob_oracle(lam: float = 0.7) -> str:
    # repr() the interpolation constants: the Spark side computes
    # 1-lam in PYTHON (0.7 -> 0.30000000000000004) and a literal 0.3
    # in SQL would differ in the last ulp
    l1, l2 = repr(lam), repr(1.0 - lam)
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    pos AS (SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS w FROM t),
    bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
           FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
    dtf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY doc_id, w1, w2),
    bigrams AS (SELECT w1, w2, SUM(tf) AS c12 FROM dtf GROUP BY w1, w2),
    uni AS (SELECT w, COUNT(*) AS c1 FROM pos GROUP BY w),
    tot AS (SELECT SUM(c1) AS n FROM uni)
    SELECT dtf.doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_transitions,
           round(SUM(tf * -ln({l1} * (c12 / c_w1) + {l2} * (c_w2 / n))) / SUM(tf), 4)
               AS avg_bigram_nll
    FROM dtf
    JOIN bigrams USING (w1, w2)
    JOIN (SELECT w AS w1, c1 AS c_w1 FROM uni) u1 USING (w1)
    JOIN (SELECT w AS w2, c1 AS c_w2 FROM uni) u2 USING (w2)
    CROSS JOIN tot
    GROUP BY dtf.doc_id
    """


@register(
    "text_bigram_logprob",
    oracle=_bigram_logprob_oracle(),
    tags=("text", "quality", "language_model", "pipeline"),
)
def text_bigram_logprob(spark, sf_dir):
    """Word-order-aware LM quality score (r5): mean token NLL under an
    interpolated corpus bigram model — catches garbled transitions a
    unigram model scores as fluent. Compared at 1e-4 granularity. See
    operators/text.py:bigram_logprob."""
    from fuse_query_spark.operators.text import bigram_logprob

    return bigram_logprob(spread_table(spark, sf_dir, "documents", "doc_id"))


@register(
    "corpus_vocab_stats",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS w FROM documents),
    uni AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
               CAST(MAX(c) AS BIGINT) AS top_freq
        FROM uni
    ),
    top AS (
        SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn FROM uni
    ),
    topmass AS (
        SELECT CAST(SUM(c) AS BIGINT) AS top100_mass FROM top WHERE rn <= 100
    )
    SELECT vocab_size, n_tokens, n_hapax,
           CAST(n_hapax AS DOUBLE) / vocab_size AS hapax_frac,
           top_freq,
           CAST(top100_mass AS DOUBLE) / n_tokens AS top100_mass_frac
    FROM agg CROSS JOIN topmass
    """,
    tags=("text", "corpus", "vocabulary", "pipeline"),
)
def corpus_vocab_stats(spark, sf_dir):
    """Corpus vocabulary health report (r5): vocab size, token count,
    hapax-legomena fraction (high = OCR noise / boilerplate IDs),
    head-mass concentration (top-100 tokens' share — high = template
    spam). One explode + one vocab hash agg + a bounded top-100 pass;
    the per-run report a curation pipeline logs next to the funnel."""
    d = table(spark, sf_dir, "documents")
    from fuse_query_spark.operators.text import tokens

    uni = (
        d.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = uni.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("c").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.max("c").alias("top_freq"),
    )
    top100 = (
        uni.orderBy(F.desc("c"), F.asc("w"))
        .limit(100)
        .agg(F.sum("c").alias("top100_mass"))
    )
    return (
        agg.crossJoin(F.broadcast(top100))
        .select(
            "vocab_size",
            "n_tokens",
            "n_hapax",
            (F.col("n_hapax").cast("double") / F.col("vocab_size")).alias("hapax_frac"),
            "top_freq",
            (F.col("top100_mass").cast("double") / F.col("n_tokens")).alias(
                "top100_mass_frac"
            ),
        )
    )


@register(
    "text_boilerplate_scrub",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    pre AS (SELECT doc_id, toks,
                   unnest(range(0, CAST(ceil(len(toks) / 2.0) AS INT))) AS g
            FROM docs),
    chunks AS (SELECT doc_id, g AS chunk_id,
                      array_to_string(toks[g*2+1 : g*2+2], ' ') AS chunk_text
               FROM pre),
    freq AS (SELECT chunk_text, count(DISTINCT doc_id) AS n_docs
             FROM chunks GROUP BY 1),
    tot AS (SELECT count(DISTINCT doc_id) AS n FROM docs),
    tagged AS (SELECT c.doc_id, c.chunk_id, c.chunk_text,
                      f.n_docs / t.n > 0.04 AS boiler
               FROM chunks c JOIN freq f USING (chunk_text) CROSS JOIN tot t)
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN NOT boiler THEN chunk_text END,
                               ' ' ORDER BY chunk_id), '') AS clean_text,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped_chunks
    FROM tagged GROUP BY doc_id
    """,
    tags=("text", "pipeline", "boilerplate", "dedup"),
)
def text_boilerplate_scrub(spark, sf_dir):
    """Boilerplate removal (r5 late), the RefinedWeb/CCNet repeated-
    line scrub adapted to token chunks (this corpus is single-line;
    the aligned 2-token chunk is the line analog): drop every chunk
    occurring in > 4% of DISTINCT documents, reassemble each document
    from its surviving chunks in order. The whole transform — chunking,
    corpus frequency, threshold, re-joined clean text — is
    hash-verified against DuckDB. See
    operators/text.py:remove_boilerplate_chunks for the scale shape."""
    from fuse_query_spark.operators.text import remove_boilerplate_chunks

    d = spread_table(spark, sf_dir, "documents", "doc_id")
    return remove_boilerplate_chunks(d, chunk_tokens=2, max_doc_frac=0.04)


def _hashed_linear_oracle(n_buckets: int = 1024) -> str:
    nibbles = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(t), {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
        FROM documents
    ),
    w AS (SELECT doc_id, (({nibbles}) % {n_buckets}) % 201 - 100 AS wt FROM tok)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(wt) AS BIGINT) AS score_raw,
           round(SUM(wt) / count(*), 6) AS mean_weight_r6
    FROM w GROUP BY doc_id
    """


@register(
    "text_hashed_linear_score",
    oracle=_hashed_linear_oracle(),
    tags=("text", "pipeline", "classifier", "quality"),
)
def text_hashed_linear_score(spark, sf_dir):
    """fastText-shaped hashed-linear document scoring (r5 late):
    token → 32-bit md5 hash → 1024 feature buckets → per-bucket weight
    → per-doc reduce. The inference path real quality classifiers run
    (with trained weights broadcast in place of the deterministic
    stand-ins), hash-verified end-to-end including the exact integer
    score. See operators/text.py:hashed_linear_score."""
    from fuse_query_spark.operators.text import hashed_linear_score

    return hashed_linear_score(spread_table(spark, sf_dir, "documents", "doc_id"), n_buckets=1024)


def _bpe_oracle() -> str:
    from fuse_query_spark.operators.text import BPE_MERGES

    chain = "regexp_replace(regexp_replace(w, '[|]', '', 'g'), '(.)', '|\\1|', 'g')"
    for a, b in BPE_MERGES:
        chain = f"replace({chain}, '|{a}||{b}|', '|{a}{b}|')"
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, toks, list_transform(toks, w -> {chain}) AS segs FROM t),
    c AS (SELECT doc_id, toks, segs,
                 CAST(list_aggregate(list_transform(segs,
                     x -> (length(x) - length(replace(x, '|', ''))) / 2),
                     'sum') AS BIGINT) AS n_bpe
          FROM s)
    SELECT doc_id,
           len(toks) AS n_words,
           n_bpe AS n_bpe_tokens,
           round(CAST(length(array_to_string(toks, '')) AS DOUBLE)
                 / greatest(n_bpe, 1), 6) AS chars_per_bpe_token,
           md5(array_to_string(list_transform(segs,
               x -> regexp_replace(replace(x, '||', ' '), '^\\||\\|$', '', 'g')),
               ' / ')) AS seg_digest
    FROM c
    """


@register(
    "text_bpe_segment",
    oracle=_bpe_oracle(),
    tags=("text", "tokenize", "bpe", "pipeline"),
)
def text_bpe_segment(spark, sf_dir):
    """REAL BPE segmentation (r6): rank-ordered merge-table
    application per word via the delimiter-wrapped symbol encoding
    (operators/text.py:bpe_token_stats) — the apply path of a
    production tokenizer, as pure Column codegen on both engines. The
    digest covers every segmented word of every document, so a single
    mis-merged pair anywhere (wrong order, boundary bleed, overlap
    handling) moves the hash; the deliberately-dead rank-11 rule pins
    that rules fire in rank order, not best-fit. The earlier
    regex-pre-token estimator remains as text_bpe_token_count."""
    from fuse_query_spark.operators.text import bpe_token_stats

    return bpe_token_stats(spread_table(spark, sf_dir, "documents", "doc_id"))


@register(
    "text_perplexity_bands",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY doc_id, w),
    vocab AS (SELECT w, SUM(tf) AS c FROM tf GROUP BY w),
    tot AS (SELECT SUM(c) AS t FROM vocab),
    scored AS (
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               round(SUM(tf * -ln(c / t)) / SUM(tf), 4) AS avg_nll
        FROM tf JOIN vocab USING (w) CROSS JOIN tot GROUP BY doc_id)
    SELECT doc_id, n_tokens, avg_nll,
           CAST(ntile(3) OVER (ORDER BY avg_nll, doc_id) AS INT) AS band,
           CASE ntile(3) OVER (ORDER BY avg_nll, doc_id)
                WHEN 1 THEN 'head' WHEN 3 THEN 'tail' ELSE 'middle'
           END AS band_name
    FROM scored
    """,
    tags=("text", "quality", "language_model", "ccnet", "pipeline"),
)
def text_perplexity_bands(spark, sf_dir):
    """CCNet head/middle/tail perplexity banding (r6; Wenzek et al.
    2020): the corpus cut every CommonCrawl-derived dataset documents
    — equal-count bands over the unigram-LM quality score, tail
    dropped or down-sampled downstream. Banding on the rounded score
    with id tiebreak keeps the tercile boundary engine-portable. See
    operators/text.py:perplexity_bands for the approx-threshold
    variant at scale."""
    from fuse_query_spark.operators.text import perplexity_bands

    return perplexity_bands(table(spark, sf_dir, "documents"))
