"""Property-based laws for the r5 pipeline operators, on generated
corpora (hypothesis): redaction idempotence, chunk partition/coverage,
winnowing density bound, split stability. Spark round-trips are slow,
so properties run on small drawn corpora with few examples — the laws,
not the volume, are the point."""

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

WORD = st.from_regex(r"[a-z]{1,8}", fullmatch=True)
TEXTS = st.lists(
    st.lists(WORD, min_size=1, max_size=30).map(" ".join), min_size=1, max_size=6
)

_EX = settings(max_examples=8, deadline=None)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


@given(TEXTS)
@_EX
def test_pii_redaction_idempotent_and_clean(spark, texts):
    """redact(redact(x)) == redact(x), and the audit counts on a
    redacted text are all zero (replacement tokens contain no
    redactable substrings)."""
    from fuse_query_spark.operators.text import pii_counts, redact_pii

    df = _df(spark, texts + ["mail a@b.io ip 10.0.0.1 ssn 078-05-1120"])
    once = df.select("doc_id", redact_pii("text").alias("text"))
    rows = once.select(
        "doc_id",
        (redact_pii("text") == F.col("text")).alias("fixed"),
        *pii_counts("text"),
    ).collect()
    for r in rows:
        assert r["fixed"]
        assert r["n_email"] == r["n_ssn"] == r["n_phone"] == r["n_ipv4"] == 0


@given(TEXTS, st.integers(min_value=1, max_value=9))
@_EX
def test_chunks_partition_tokens_when_stride_equals_chunk(spark, texts, size):
    """stride == chunk_tokens: chunks partition the token stream —
    re-concatenating chunk_text in order reproduces the document."""
    from fuse_query_spark.operators.text import chunk_windows

    df = _df(spark, texts)
    got = (
        chunk_windows(df, chunk_tokens=size, stride=size)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("rejoined")
        )
        .collect()
    )
    originals = {i: re.sub(r"\s+", " ", t.strip()) for i, t in enumerate(texts)}
    for r in got:
        assert r["rejoined"] == originals[r["doc_id"]]


@given(TEXTS)
@_EX
def test_winnow_density_upper_bound(spark, texts):
    """Winnowing selects at most one NEW fingerprint per window: the
    set size never exceeds the window count (n_grams - w + 1, floor 1),
    and never exceeds the distinct gram count."""
    from fuse_query_spark.operators.text import winnow_fingerprints

    df = _df(spark, texts)
    for r in winnow_fingerprints(df, k=2, w=3).collect():
        if r["n_grams"] == 0:
            assert r["n_fingerprints"] == 0
        else:
            assert 1 <= r["n_fingerprints"] <= max(r["n_grams"] - 3 + 1, 1)
            assert r["n_fingerprints"] <= r["n_grams"]


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True))
@_EX
def test_split_is_stable_under_corpus_growth(spark, ids):
    """A document's split never changes when other documents are added
    or removed — the md5-bucket law deterministic_split promises."""
    from fuse_query_spark.operators.sampling import deterministic_split

    full = spark.createDataFrame([(i,) for i in ids], "doc_id LONG")
    half = spark.createDataFrame([(i,) for i in ids[::2]], "doc_id LONG")
    s_full = {r["doc_id"]: r["split"] for r in deterministic_split(full).collect()}
    s_half = {r["doc_id"]: r["split"] for r in deterministic_split(half).collect()}
    assert all(s_full[i] == s_half[i] for i in ids[::2])
