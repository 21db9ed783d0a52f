"""Structured Streaming form of the document-curation stages.

The per-row curation stages (PII redaction, quality scoring, token
budgeting, fingerprinting) are pure Column expressions, so the SAME
operator definitions from operators/text.py serve batch and streaming
— this module wires them to readStream and documents which stages are
streamable as-is:

- stateless per-row stages (redact/score/count/fingerprint): stream
  verbatim, no state, no watermark needed;
- exact dedup: needs keyed state — bounded via
  dropDuplicatesWithinWatermark when rows carry event time, unbounded
  dropDuplicates for availableNow backfill ingestion (both shown in
  streaming/events.py for the events schema);
- corpus-relative stages (MinHash/LSH, unigram LM, tf-idf, IDF-style
  statistics): NOT streamable row-at-a-time by definition — they need
  corpus aggregates; production runs them as periodic batch passes
  over the landed zone (the lambda split every curation pipeline
  makes).

The reference has no streaming at all (SURVEY §2.10 — pull-based batch
iterators, common/streams/src/stream.rs:9); capability extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuse_query_spark.operators.text import (
    fingerprint_md5,
    pii_counts,
    quality_score,
    redact_pii,
    token_count,
)

DOCUMENTS_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def read_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of document rows (one file per trigger keeps
    tests deterministic; production points this at the crawl drop)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def curate_documents(docs: DataFrame, min_quality: float = 0.0) -> DataFrame:
    """The stateless curation pass: redact PII, score quality, count
    tokens, fingerprint the CLEAN text. One select — identical plan
    fragment whether `docs` is a batch DataFrame or a stream, which is
    the point: write the stage once, run it in either mode.

    `min_quality` drops low-quality rows in-flight (0.0 keeps all)."""
    clean = redact_pii("text")
    out = docs.select(
        "doc_id",
        "source",
        clean.alias("clean_text"),
        quality_score("text").alias("quality"),
        token_count("text").alias("n_tokens"),
        fingerprint_md5(clean).alias("fingerprint"),
        *pii_counts("text"),
    )
    return out.filter(F.col("quality") >= min_quality)
