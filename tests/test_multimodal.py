"""Multimodal plumbing: binary columns through Arrow-batched
mapInPandas — real schema/batching, stubbed decode."""

import pytest

from fuse_query_spark.operators.multimodal import (
    decode_image_meta,
    decode_image_pixels,
    frame_sample,
    synthesize_blobs,
)
from fuse_query_spark.sources.tables import table


def test_blob_meta_pipeline(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    blobs = synthesize_blobs(docs)
    assert dict(blobs.dtypes)["content"] == "binary"
    meta = decode_image_meta(blobs)
    rows = meta.collect()
    assert len(rows) == 50
    by_id = {r["doc_id"]: r for r in rows}
    # deterministic: n_bytes equals utf-8 length of the text
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in src.items():
        assert by_id[doc_id]["n_bytes"] == len(text.encode())
        assert 1 <= by_id[doc_id]["width"] <= 640
        assert len(by_id[doc_id]["checksum"]) == 32


def test_blob_meta_is_deterministic(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(10)
    a = {r["doc_id"]: r["checksum"] for r in decode_image_meta(synthesize_blobs(docs)).collect()}
    b = {r["doc_id"]: r["checksum"] for r in decode_image_meta(synthesize_blobs(docs)).collect()}
    assert a == b


def test_real_decode_paths_are_marked_stubs(spark, sf_dir):
    blobs = synthesize_blobs(table(spark, sf_dir, "documents").limit(1))
    with pytest.raises(NotImplementedError):
        decode_image_pixels(blobs)
    with pytest.raises(NotImplementedError):
        frame_sample(blobs)
