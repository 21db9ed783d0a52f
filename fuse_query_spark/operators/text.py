"""Text analysis operators: tokenization, quality scoring, language
ID, fingerprinting. All pure Column expressions (JVM-side, codegen) —
no UDFs — so they run at scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal deterministic stopword sets for the language-ID heuristic.
# Word-lists are the operator's *parameters*; swap for real ones in prod.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una", "en", "por"],
}


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex variant is
    `regexp_tokens`).

    CONTRACT NOTE (code-review r8): split("") yields [""] — an empty
    or whitespace-only text therefore has token_count 1, not 0. This
    matches DuckDB's string_split_regex semantics EXACTLY, and every
    oracle pair in the registry relies on the two engines agreeing on
    it; a caller that needs blank-doc-aware counts should filter
    trim(text) != '' upstream rather than change this function."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


# BPE-ish pre-tokenization classes: letter runs, digit runs, single
# punctuation marks — the classic GPT-2-style pre-split, engine-portable
# (same semantics in Java regex and RE2/DuckDB for these simple classes)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regexp_tokens(text: str | Column, pattern: str = BPE_ISH_PATTERN) -> Column:
    """BPE-style pre-tokenization: letter/digit runs + punctuation
    singletons. A real BPE merges from here; the count of pre-tokens is
    the standard cheap token-budget estimator for pipeline planning."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(pattern), 0)


def uniq_token_count(text: str | Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_hits(text: str | Column, lang: str = "en", toks: Column | None = None) -> Column:
    """Count of tokens in the language's stopword set — a lambda filter
    over the token array, still JVM-side. Pass `toks` (a materialized
    token-array column) on hot paths: a tokens *expression* re-splits
    the text per array element inside the lambda (no CSE inside
    higher-order functions)."""
    wordlist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    t = toks if toks is not None else tokens(text)
    return F.size(F.filter(t, lambda x: F.array_contains(wordlist, F.lower(x))))


def language_id(text: str | Column, toks: Column | None = None) -> Column:
    """Stopword-vote language ID with deterministic tie-break (first
    language in STOPWORDS order wins ties). An n-gram character model
    would slot in the same shape; this is the dependency-free variant."""
    scores = [(lang, stopword_hits(text, lang, toks=toks)) for lang in STOPWORDS]
    # struct-max: (hits, -position) so ties resolve to the earlier language
    arr = F.array(
        *[
            F.struct(score.alias("s"), F.lit(-i).alias("prio"), F.lit(lang).alias("lang"))
            for i, (lang, score) in enumerate(scores)
        ]
    )
    return F.array_max(arr)["lang"]


def punct_ratio(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def alpha_ratio(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    return n_alpha / F.greatest(F.length(c), F.lit(1))


def quality_score(text: str | Column, toks: Column | None = None) -> Column:
    """Composite [0,1] quality heuristic: token count band + stopword
    presence + alphabetic density. Deterministic rational arithmetic
    (int counts / int lengths) so it is oracle-comparable."""
    ntok = F.size(toks) if toks is not None else token_count(text)
    sw = stopword_hits(text, "en", toks=toks)
    length_ok = F.when((ntok >= 10) & (ntok <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
    sw_ratio = sw / F.greatest(ntok, F.lit(1))
    return (length_ok + sw_ratio + alpha_ratio(text)) / F.lit(3.0)


def fingerprint_md5(text: str | Column) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.trim(c)))


def shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array column, built by
    zip_with over n-1 shifted slices rather than element_at inside an
    index lambda. This bounds evaluations of `t` to n+1 PER ROW by
    construction. The index-lambda formulation evaluates `t` once per
    element_at (~4 × #shingles per row): there is no CSE inside
    higher-order functions, and CollapseProject does not count lambda
    references, so Catalyst happily inlines a split() expression
    through any projection — even across a repartition — turning
    tokenization quadratic (measured 25s → 0.7s on the sf0.1 corpus
    shingle explode when this was the hot path).

    zip_with pads the shorter side with null and concat_ws skips
    nulls, so the tail entries are short (n-1)-grams — the final slice
    keeps only the size-n+1 full shingles.

    Exactly array_distinct over ngrams_from_tokens — delegated so the
    measured 25s→0.7s hot-path construction lives in ONE place
    (code-review r8: the two copies could drift)."""
    return F.array_distinct(ngrams_from_tokens(t, n))


def ngrams_from_tokens(t: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (unlike shingles_from_tokens,
    which is array_distinct for Jaccard) — repetition metrics need the
    multiset. Same zip_with-over-shifted-slices construction, so `t`
    is evaluated n+1 times per row, never per element."""
    big = 1 << 30
    acc = t
    for j in range(1, n):
        acc = F.zip_with(acc, F.slice(t, j + 1, big), lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(acc, 1, F.greatest(F.size(t) - (n - 1), F.lit(0)))


def repetition_metrics(df, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition quality metrics per document (Rae et
    al. 2021, §A1.1 repetition filters, adapted to the corpus's
    single-line texts): duplicate-token fraction and the fraction of
    token positions covered by the single most frequent bigram, plus
    a repetition flag at the paper's spirit thresholds. The reference
    has no text-quality surface; this extends the pipeline family.

    Exactness: counts are integers; the two fractions are one double
    division of exact integers — bit-identical on any engine. The top
    bigram tie-breaks lexicographically so the answer is unique.

    Scale: one explode + per-(doc, bigram) count, then the per-doc
    top-1 as TWO HASH AGGREGATES (max count per doc, then min bigram
    at that count) joined back — NOT a row_number window: the window
    formulation sorts every (doc, bigram) row inside each shuffle
    partition, and at 1.28M docs (tools/scaling_probe.py, 256x) that
    sort went 1.6x super-linear while hash aggregates with map-side
    combine stay flat. All keys are doc_id-uniform, no skew, nothing
    driver-side."""
    t = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        ngrams_from_tokens(t, 2).alias("_bgs"),
    ).filter(F.col("n_tokens") >= 2)
    counts = (
        base.select(id_col, F.explode("_bgs").alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("bg_n"))
    )
    # per-doc top-1 in ONE hash aggregate (r12 opt): min over the
    # orderable struct (-bg_n, bigram) IS "max count, lexicographic
    # min bigram on ties" — field-by-field struct ordering replaces
    # the previous max-count agg + join-back + re-agg (one shuffle
    # join fewer, same unique answer).
    top = (
        counts.groupBy(id_col)
        .agg(
            F.min(
                F.struct((-F.col("bg_n")).alias("_neg"), F.col("bigram").alias("bigram"))
            ).alias("_t")
        )
        .select(id_col, F.col("_t.bigram").alias("bigram"), (-F.col("_t._neg")).alias("bg_n"))
    )
    dup_frac = (F.col("n_tokens") - F.col("n_distinct")).cast("double") / F.col("n_tokens")
    top_frac = F.col("bg_n").cast("double") / (F.col("n_tokens") - 1)
    return (
        base.drop("_bgs")
        .join(top.select(id_col, "bigram", "bg_n"), id_col)
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            dup_frac.alias("dup_token_frac"),
            F.col("bigram").alias("top_bigram"),
            F.col("bg_n").cast("bigint").alias("top_bigram_n"),
            top_frac.alias("top_bigram_frac"),
            ((dup_frac > 0.8) | (top_frac > 0.18)).alias("repetition_flag"),
        )
    )


def shingles(text: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings, straight from a text column.
    Distinct set — shingle multiplicity is irrelevant for Jaccard.
    Delegates to shingles_from_tokens, so the tokenization expression
    is evaluated only n+1 times per row even when inlined."""
    return shingles_from_tokens(tokens(text), n)


def min_shingle_fingerprint(text: str | Column, n: int = 3) -> Column:
    """Rolling-window document fingerprint: lexicographic min of the
    md5s of all word n-gram shingles (winnowing with w = doc length).
    Two documents sharing their minimal shingle collide — a cheap
    near-dup prefilter that is plain SQL on both engines."""
    return F.array_min(F.transform(shingles(text, n), F.md5))


# --- PII redaction (r5) -------------------------------------------------
# Rule order matters: earlier rules redact first (an email is redacted
# before its digits could be re-matched). Patterns stick to the regex
# subset with identical semantics in Java regex (Spark) and RE2
# (DuckDB): explicit classes, bounded repetition, ASCII \b.
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(text: str | Column, rules=PII_RULES) -> Column:
    """PII scrubbing — the redaction stage every training-data pipeline
    runs before anything else. A chain of regexp_replace Columns: pure
    JVM codegen, scan-speed over 100 TB, no UDF, no shuffle. Rules are
    the operator's parameters; production swaps in its own pattern set
    (the shape — ordered regex chain — is what the operator provides)."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in rules:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(text: str | Column, rules=PII_RULES) -> list[Column]:
    """Per-category PII match counts on the ORIGINAL text (audit
    columns: what did redaction remove?). Counted before any rule
    rewrites the string, so categories are independent of rule order."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}") for name, pat, _ in rules
    ]


# --- Corpus-statistical quality & keywords (r5) -------------------------


def unigram_logprob(df, text_col: str = "text", id_col: str = "doc_id", ndigits: int = 4):
    """CCNet-style perplexity-proxy quality score: mean negative
    log-probability per token under the corpus's own unigram LM
    (Wenzek et al. 2020 use a KenLM 5-gram; the unigram variant is the
    engine-native analog — no model artifact, one extra aggregate).
    Low avg_nll = head-like repetitive text, high = rare-token tail;
    pipelines band on it to drop both extremes.

    Scale shape: tokens are pre-aggregated to (doc, word, tf) BEFORE
    the vocab join, so the join input is |distinct (doc,word)|, not
    |tokens|; vocab counts are one map-side-combinable hash agg; the
    grand total is a 1-row broadcast. The vocab join shuffles on the
    word key (Zipf-skewed — AQE skew-join handles the head, or cap the
    vocab to top-V with an OOV bucket at web scale, which also makes
    the vocab side broadcastable). Everything else is per-doc hash
    aggregation."""
    tf = (
        df.select(id_col, F.explode(tokens(text_col)).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = tf.groupBy("w").agg(F.sum("tf").alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    return (
        tf.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * -F.log(F.col("c") / F.col("t"))) / F.sum("tf"),
                ndigits,
            ).alias("avg_nll"),
        )
    )


def tfidf_topk(df, k: int = 3, text_col: str = "text", id_col: str = "doc_id", ndigits: int = 4):
    """Top-k tf-idf keyword extraction per document (tf x ln(N/df),
    the classic salience score) — corpus tagging / topic routing stage.
    Ranking is on the ROUNDED score with the term string as the tie
    break, so the result is deterministic and engine-portable (raw
    doubles differ in final ulps between libm implementations).

    Scale shape: (doc, word, tf) hash agg; document frequency is a
    second hash agg over the first's output (distinct (doc,word) rows,
    so COUNT(*) IS the df — no countDistinct); N is a 1-row broadcast;
    the ranking window partitions by doc_id (high cardinality → small
    per-partition sorts of ~|distinct words per doc|)."""
    from pyspark.sql import Window

    tf = (
        df.select(id_col, F.explode(tokens(text_col)).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    ndocs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), ndigits)
        )
    )
    win = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("w"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", F.col("w").alias("term"), "score")
    )


# --- Chunking & chunk-level dedup (r5) ----------------------------------


def chunk_windows(
    df,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Overlapping token-window chunking — the RAG / context-window
    prep stage: each document becomes ceil(n/stride) chunks of up to
    `chunk_tokens` tokens starting every `stride` tokens (overlap =
    chunk_tokens - stride). Pure Column + posexplode: tokenize once,
    generate starts with sequence(), slice per start — linear work,
    no shuffle, no UDF; chunk text never leaves the executor unless
    selected.

    Returns (id_col, chunk_id, start_token, n_chunk_tokens,
    chunk_text)."""
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    base = df.select(
        id_col,
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "start_token"),
    )
    chunk = F.slice(F.col("_toks"), F.col("start_token") + 1, chunk_tokens)
    return base.select(
        id_col,
        "chunk_id",
        "start_token",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def chunk_dup_fraction(
    df,
    chunk_tokens: int = 32,
    stride: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Chunk-level (paragraph-analog) corpus dedup metric, the Dolma /
    Lee et al. doc-scoring shape: split every document into fixed
    token windows, hash each window, count corpus-wide occurrences of
    each hash, then score each document by the fraction of its chunks
    that also occur elsewhere (in ANY doc, or again in the same one).
    Pipelines drop docs above a dup_chunk_frac threshold.

    Scale shape: chunking is linear scan-side work; the corpus chunk
    count is ONE map-side-combinable hash aggregate on the chunk md5
    (uniform 128-bit key, skew-free); the re-join is chunk-hash ->
    count (the count side is the aggregate's output, far smaller than
    the chunk stream); final per-doc rollup is a hash agg on doc id.
    Nothing is quadratic; no driver state.

    Returns (id_col, n_chunks, n_dup_chunks, dup_chunk_frac)."""
    chunks = chunk_windows(df, chunk_tokens, stride, text_col, id_col).select(
        id_col, "chunk_id", F.md5(F.col("chunk_text")).alias("h")
    )
    counts = chunks.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    return (
        chunks.join(counts, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
            (
                F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("dup_chunk_frac"),
        )
    )


def winnow_fingerprints(
    df,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    hash every k-gram, slide a w-window over the hash sequence, keep
    each window's minimum — the selected set is a position-robust
    fingerprint with guaranteed density ~2/(w+1) that two documents
    sharing any run of w+k-1 tokens MUST overlap on (the winnowing
    guarantee, unlike a global-min fingerprint which can miss local
    matches). md5 hex strings compare lexicographically the same in
    any engine.

    Scale shape: pure scan-side Column work (tokens -> grams -> hash
    -> window minima), O(n*w) per doc, no shuffle, no UDF. The gram
    hash array is materialized in a sub-select so the window lambda
    reads a column attribute, not a re-evaluated expression (see
    shingles_from_tokens for why that matters).

    Returns (id_col, n_grams, n_fingerprints, fp_density, fp_digest):
    the digest is md5 over the sorted fingerprint set — join on it for
    exact fingerprint-set dedup, or explode the set for partial-match
    search."""
    hashed = df.select(
        id_col,
        F.transform(ngrams_from_tokens(tokens(text_col), k), F.md5).alias("_h"),
    )
    h = F.col("_h")
    n_win = F.greatest(F.size(h) - w, F.lit(0))
    mins = F.transform(
        F.sequence(F.lit(0), n_win), lambda p: F.array_min(F.slice(h, p + 1, w))
    )
    fps = F.array_sort(F.array_distinct(F.filter(mins, lambda x: x.isNotNull())))
    return hashed.select(
        id_col,
        F.size(h).alias("n_grams"),
        F.size(fps).alias("n_fingerprints"),
        (F.size(fps) / F.greatest(F.size(h), F.lit(1))).alias("fp_density"),
        F.md5(F.array_join(fps, "")).alias("fp_digest"),
    )


def bigram_logprob(df, text_col: str = "text", id_col: str = "doc_id", lam: float = 0.7, ndigits: int = 4):
    """Word-order-aware quality score: mean NLL of each token under an
    interpolated bigram LM built from the corpus itself —
    p(w_i | w_{i-1}) = lam * c(w_{i-1} w_i)/c(w_{i-1}) + (1-lam) *
    c(w_i)/N. Catches shuffled/garbled text that a unigram model
    scores as fluent (same tokens, broken transitions); pipelines band
    on the bigram/unigram NLL GAP as the incoherence signal.

    Scale shape: bigram counts are one map-side-combinable hash agg on
    the (w1,w2) pair (pre-aggregated per doc first, same trick as
    unigram_logprob); the transition join shuffles on the pair key —
    higher cardinality than the vocab join so LESS skewed; unigram
    factors ride the same joins; grand total is a 1-row broadcast.

    Returns (id_col, n_transitions, avg_bigram_nll).

    Materializing dtf/uni via localCheckpoint was A/B-measured at
    1.43x SLOWER (r12): AQE's runtime exchange reuse already dedupes
    the shared subtrees, so the checkpoint only adds block I/O."""
    t = tokens(text_col)
    bg = df.select(
        id_col, F.explode(ngrams_from_tokens(t, 2)).alias("bg")
    ).withColumn("w1", F.split(F.col("bg"), " ")[0]).withColumn(
        "w2", F.split(F.col("bg"), " ")[1]
    )
    dtf = bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    bigrams = dtf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    tok = df.select(id_col, F.explode(t).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    total = uni.agg(F.sum("c1").alias("n"))
    p = (
        dtf.join(bigrams, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), F.col("c1").alias("c_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("c_w2")), "w2")
        .crossJoin(F.broadcast(total))
    )
    prob = F.lit(lam) * (F.col("c12") / F.col("c_w1")) + F.lit(1.0 - lam) * (
        F.col("c_w2") / F.col("n")
    )
    return (
        p.groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_transitions"),
            F.round(F.sum(F.col("tf") * -F.log(prob)) / F.sum("tf"), ndigits).alias(
                "avg_bigram_nll"
            ),
        )
    )


def remove_boilerplate_chunks(
    df,
    chunk_tokens: int = 8,
    max_doc_frac: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Boilerplate removal, the RefinedWeb/CCNet line-dedup shape
    adapted to token chunks (this corpus has no newlines; the
    fixed-size token chunk is the line/paragraph analog): split every
    document into NON-overlapping `chunk_tokens` windows, count in how
    many DISTINCT documents each chunk string occurs, and drop chunks
    occurring in more than `max_doc_frac` of the corpus (headers,
    footers, navigation, license blurbs — content repeated verbatim
    across many documents). The document is reassembled from its
    surviving chunks in order.

    Scale shape: chunking is scan-side; the chunk-frequency table is
    one map-side-combinable agg on md5(chunk) (COUNT(DISTINCT doc) per
    chunk stays bounded because a chunk's distinct-doc set is what the
    aggregate itself outputs — the heavy stream is chunk rows, the
    output is |distinct chunks|); corpus size is a 1-row broadcast; the
    rebuild is a hash agg on doc id with an in-group sort_array over
    that doc's own chunks only. Nothing quadratic, no driver state.

    Returns (id_col, clean_text, n_chunks, n_dropped_chunks)."""
    # the chunk table feeds BOTH the corpus-frequency agg and the
    # tagged join below; without materialization Catalyst re-runs the
    # tokenize+chunk explode per consumer (the recompute class
    # minhash_dedup_pairs fixed in r5 — r12 opt: this operator showed
    # 2.9–17.8 s run-to-run spread at sf0.1 from the duplicated
    # explode under GC pressure). localCheckpoint, not persist: blocks
    # are released by the ContextCleaner when the result is GC'd.
    chunks = chunk_windows(df, chunk_tokens, chunk_tokens, text_col, id_col).localCheckpoint(
        eager=True
    )
    freq = (
        chunks.groupBy(F.md5("chunk_text").alias("h"))
        .agg(F.countDistinct(id_col).alias("n_docs"))
    )
    n_total = df.agg(F.countDistinct(id_col).alias("_n_total"))
    tagged = (
        chunks.withColumn("h", F.md5("chunk_text"))
        .join(freq, "h")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "_is_boiler", F.col("n_docs") / F.col("_n_total") > F.lit(max_doc_frac)
        )
    )
    rebuilt = tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("_is_boiler").cast("int")).alias("n_dropped_chunks"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_is_boiler"),
                            F.struct("chunk_id", "chunk_text"),
                        )
                    )
                ),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return rebuilt.select(id_col, "clean_text", "n_chunks", "n_dropped_chunks")


def hashed_linear_score(
    df,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """fastText-shaped quality scoring: hash every token into one of
    `n_buckets` feature buckets (the hashing trick — no vocabulary
    table to build, broadcast, or version) and score the document as
    the sum of per-bucket weights. Real pipelines load trained weights
    (a broadcast of n_buckets floats — corpus-independent); here the
    weights are a deterministic function of the bucket so the ENTIRE
    inference path (tokenize → hash → bucket → weight → reduce) is
    engine-portable and hash-verified. Integer weights keep the reduce
    associative-exact (no float summation order to match across
    engines); `mean_weight_r6` is the thresholdable per-token score.

    One explode + one map-side-combinable hash agg on doc id; no
    joins, no driver state — linear at any scale.

    Returns (id_col, n_tokens, score_raw, mean_weight_r6)."""
    from fuse_query_spark.operators.dedup import md5_int32

    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
    bucket = md5_int32(F.col("_t")) % n_buckets
    weight = (bucket % 201) - 100  # deterministic stand-in weights
    return (
        tok.select(id_col, weight.alias("_w"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_w").alias("score_raw"),
            F.round(F.sum("_w") / F.count(F.lit(1)), 6).alias("mean_weight_r6"),
        )
    )


# Stand-in BPE merge table (r6). The table is the tokenizer's
# PARAMETER — production pipelines broadcast a learned one (tiktoken/
# sentencepiece export); this deterministic table over the corpus
# vocabulary keeps the APPLY path engine-portable and hash-verified.
# Rank order respects the BPE invariant: a rule's constituent symbols
# exist before the rule (single-character symbols or earlier merges),
# which is exactly what makes one left-to-right replace pass per rank
# equal to the reference merge loop (see bpe_token_stats).
BPE_MERGES = [
    ("t", "h"), ("th", "e"),             # the
    ("a", "n"), ("i", "n"),              # an/in prefixes
    ("e", "r"), ("o", "r"),              # -er/-or suffixes
    ("s", "t"), ("a", "r"),              # st/ar clusters
    ("o", "w"), ("r", "ow"),             # row
    ("a", "ta"), ("t", "a"),             # data (ta first in text order: see note)
    ("s", "c"), ("sc", "an"),            # scan (uses an from rank 3)
    ("j", "o"), ("jo", "in"),            # join (uses in from rank 4)
]
# note: ("a","ta") ranks BEFORE ("t","a") builds "ta", so it can never
# fire on a fresh corpus — kept deliberately as a dead rule to pin the
# rank-order semantics in the oracle (a wrong application order would
# produce different tokens and move the digest).


def bpe_token_stats(
    df,
    merges=None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """REAL BPE segmentation (apply path): every word is split to
    characters and the merge table is applied in rank order, exactly
    like the reference BPE loop (GPT-2 bpe(): repeatedly merge the
    lowest-rank adjacent pair). The trick that keeps this a pure
    Column expression on BOTH engines: encode the symbol sequence as
    |s1||s2||s3| — each symbol wrapped in its own delimiters — so a
    single left-to-right replace of '|a||b|' -> '|ab|' merges every
    occurrence of the pair at true symbol boundaries only (a bare
    'a b' -> 'ab' replace on space-separated symbols is WRONG twice
    over: it can match inside a longer symbol, and consecutive
    occurrences share the delimiter so 'a b a b' only merges once).
    One pass per rank equals the reference loop because BPE rank order
    guarantees a rule's constituents exist before the rule fires; '|'
    is pre-stripped from input so the delimiter cannot collide.

    Pure codegen — ~2+len(merges) string ops per word, no UDFs, no
    joins, no shuffle beyond the final per-doc projection; linear at
    any scale.

    Returns (id_col, n_words, n_bpe_tokens, chars_per_bpe_token,
    seg_digest)."""
    if merges is None:
        merges = BPE_MERGES

    def segment(w):
        # strip delimiter collisions, wrap every char: "the" -> "|t||h||e|"
        seq = F.regexp_replace(F.regexp_replace(w, r"[|]", ""), r"(.)", r"|$1|")
        for a, b in merges:
            seq = F.replace(seq, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
        return seq

    t = tokens(text_col)
    segs = F.transform(t, segment)
    # token count per word = (#'|' chars) / 2
    per_word = F.transform(
        segs, lambda s: (F.length(s) - F.length(F.replace(s, F.lit("|"), F.lit("")))) / 2
    )
    n_tokens = F.aggregate(
        per_word, F.lit(0.0), lambda acc, x: acc + x
    ).cast("long")
    readable = F.transform(
        segs,
        lambda s: F.regexp_replace(
            F.regexp_replace(s, r"\|\|", " "), r"^\||\|$", ""
        ),
    )
    return df.select(
        F.col(id_col),
        F.size(t).alias("n_words"),
        n_tokens.alias("n_bpe_tokens"),
        F.round(
            F.length(F.array_join(t, "")).cast("double")
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("chars_per_bpe_token"),
        F.md5(F.array_join(readable, " / ")).alias("seg_digest"),
    )


def perplexity_bands(
    df,
    n_bands: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    ndigits: int = 4,
    bands: str = "exact",
):
    """CCNet's head/middle/tail banding (Wenzek et al. 2020): rank
    every document by its LM perplexity proxy (unigram_logprob's
    avg_nll) and cut the corpus into equal-count bands — CCNet trains
    on head+middle and drops (or down-samples) the tail, and dataset
    cards report the band composition. ntile over the ROUNDED score
    with id tiebreak keeps the band boundary engine-portable, the same
    device as dsir_select's exact cut.

    Scale shape: everything up to the per-doc score is
    unigram_logprob's shape (pre-aggregated tf, one skew-aware vocab
    join, 1-row broadcast total). bands="exact" (the oracle row) ranks
    with a GLOBAL ntile window — a single-partition sort, fine at test
    scale, an executor OOM on billions of rows. bands="approx" is the
    100 TB path: n_bands-1 percentile_approx boundaries (one mergeable
    sketch agg, no global sort) + a CASE assignment — the dsir_select
    cut="approx" pattern. Band POPULATIONS then match the exact cut
    within sketch accuracy; documents whose rounded score ties a
    boundary may land one band over (ntile splits ties by id, a
    threshold cannot), which is the standard approximate-banding
    trade every production CCNet implementation makes.

    Returns (id_col, n_tokens, avg_nll, band, band_name)."""
    from pyspark.sql import Window

    if bands not in ("exact", "approx"):
        # loud, not silent (r7 ADVICE): a typo like 'aprox' must not
        # hand the caller who asked for the 100 TB-safe path the
        # executor-OOM global-sort window with no signal
        raise ValueError(f"bands must be 'exact' or 'approx', got {bands!r}")
    scored = unigram_logprob(df, text_col, id_col, ndigits)
    if n_bands < 2:
        out = scored.withColumn("band", F.lit(1))
    elif bands == "approx":
        qs = [i / n_bands for i in range(1, n_bands)]
        thr = scored.agg(
            F.percentile_approx("avg_nll", qs, 10000).alias("_thr")
        )
        band = F.lit(1)
        for i in range(n_bands - 1):
            band = F.when(F.col("avg_nll") > F.col("_thr")[i], i + 2).otherwise(band)
        out = scored.crossJoin(F.broadcast(thr)).withColumn("band", band).drop("_thr")
    else:
        w = Window.orderBy(F.col("avg_nll"), F.col(id_col))
        out = scored.withColumn("band", F.ntile(n_bands).over(w))
    names = F.when(F.col("band") == 1, "head").when(
        F.col("band") == n_bands, "tail"
    ).otherwise("middle")
    return out.withColumn("band_name", names)
