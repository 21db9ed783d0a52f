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
    `regexp_tokens`)."""
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
    """Word n-gram shingles from an ALREADY-MATERIALIZED token array
    column. Important at scale: referencing a tokens *expression* here
    would re-run split() for every element_at inside the lambda (no
    common-subexpression elimination inside higher-order functions —
    measured 2x slower at sf0.1); callers doing heavy shingling should
    project the token array first, ideally below an exchange so it is
    materialized (see dedup._shingle_table)."""
    ngrams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return F.when(F.size(t) >= n, F.array_distinct(ngrams)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings (0-based array indexing in
    Spark SQL). Distinct set — shingle multiplicity is irrelevant for
    Jaccard. Single-expression form for query contexts; hot paths use
    shingles_from_tokens on a materialized token column."""
    t = tokens(text)
    ngrams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]),
    )
    # guard: docs with fewer than n tokens have no shingles (also keeps
    # element_at in-bounds under ANSI mode)
    return F.when(F.size(t) >= n, F.array_distinct(ngrams)).otherwise(
        F.array().cast("array<string>")
    )


def min_shingle_fingerprint(text: str | Column, n: int = 3) -> Column:
    """Rolling-window document fingerprint: lexicographic min of the
    md5s of all word n-gram shingles (winnowing with w = doc length).
    Two documents sharing their minimal shingle collide — a cheap
    near-dup prefilter that is plain SQL on both engines."""
    return F.array_min(F.transform(shingles(text, n), F.md5))
