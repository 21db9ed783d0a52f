"""Training-pipeline sampling / split / decontamination queries over
`documents` — deterministic (hash-based), so fully oracle-checkable."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuse_query_spark.operators.sampling import contaminated_ids, deterministic_split
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
