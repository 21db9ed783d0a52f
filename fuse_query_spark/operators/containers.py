"""Container-level quarantine routing: the demux analog of
multimodal.image_pixel_stats_quarantine. A 100 TB crawl WILL contain
truncated downloads, mislabeled bytes, and exotic containers; a
partition must not die for one of them (the r7/r8 deterministic-
degradation principle, applied to the video path).

sniff → dispatch → demux, with every ValueError routed to a typed
quarantine row instead of failing the stage:

- ISO-BMFF sniff: a plausible 32-bit box size followed by 'ftyp'
  (or a bare 'moov'/'mdat' start for headerless fragments);
- EBML sniff: the 0x1A45DFA3 magic;
- anything else: quarantined as unknown-container.

Emits ONE summary row per blob — (doc_id, container, status, reason,
n_tracks, n_samples, n_keyframes, byte_sum) — so the quarantine table
is queryable (count by reason, reprocess queue) and the decoded side
carries enough aggregate signal to hash-verify the routing end-to-end
against a closed-form oracle. Per-sample rows come from the dedicated
demux operators once a blob has passed routing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from fuse_query_spark.operators.multimodal import _fuse_or_map, _tagged_map


def sniff_container(data: bytes) -> str | None:
    """'mp4' | 'mkv' | None (unknown)."""
    if len(data) >= 12 and data[4:8] in (b"ftyp", b"moov", b"mdat"):
        size = int.from_bytes(data[:4], "big")
        if size == 0 or size == 1 or 8 <= size <= len(data):
            return "mp4"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "mkv"
    return None


def demux_quarantine(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Route every blob: demux what parses, quarantine what doesn't.
    status='demuxed' rows carry per-file aggregates (track/sample/
    keyframe counts + payload byte_sum across all samples — one wrong
    sample boundary moves it); status='quarantined' rows carry a typed
    reason ('unknown-container', or the demuxer's own error text for
    truncated/corrupt files) and NULL aggregates. Arrow-batched
    mapInPandas, same scale posture as the demuxers themselves."""
    from fuse_query_spark.operators.mkv import parse_mkv
    from fuse_query_spark.operators.mp4 import parse_mp4

    def _rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "container", "status", "reason",
                    "n_tracks", "n_samples", "n_keyframes", "byte_sum",
                )
            }

            def emit(doc_id, container, status, reason, nt=None, ns=None, nk=None, bs=None):
                cols["doc_id"].append(doc_id)
                cols["container"].append(container)
                cols["status"].append(status)
                cols["reason"].append(reason)
                cols["n_tracks"].append(nt)
                cols["n_samples"].append(ns)
                cols["n_keyframes"].append(nk)
                cols["byte_sum"].append(bs)

            for doc_id, b in zip(pdf[id_col], pdf["content"]):
                data = bytes(b)
                kind = sniff_container(data)
                if kind is None:
                    emit(doc_id, None, "quarantined", "unknown-container")
                    continue
                try:
                    if kind == "mp4":
                        parsed = parse_mp4(data)
                        samples = [
                            (sm, data[sm["offset"] : sm["offset"] + sm["size"]])
                            for tr in parsed["tracks"]
                            for sm in tr["samples"]
                        ]
                        nt = len(parsed["tracks"])
                        nk = sum(1 for sm, _ in samples if sm["is_sync"])
                        bodies = [body for _, body in samples]
                    else:
                        parsed = parse_mkv(data)
                        nt = len(parsed["tracks"])
                        nk = sum(1 for f in parsed["frames"] if f["keyframe"])
                        bodies = [f["payload"] for f in parsed["frames"]]
                except ValueError as e:
                    emit(doc_id, kind, "quarantined", str(e)[:80])
                    continue
                emit(
                    doc_id, kind, "demuxed", None,
                    nt, len(bodies), nk,
                    sum(
                        int(np.frombuffer(body, np.uint8).sum(dtype=np.int64))
                        for body in bodies
                        if body
                    ),
                )
            yield pd.DataFrame(cols)

    return _fuse_or_map(
        blobs,
        _rows,
        "doc_id LONG, container STRING, status STRING, reason STRING, "
        "n_tracks INT, n_samples INT, n_keyframes INT, byte_sum LONG",
    )


def synthesize_mixed_container_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Crawl-shaped mixed corpus: doc_id%7==0 → MP4 truncated 25 bytes
    (corrupt), ==1 → non-container bytes (unknown), %2==0 of the rest
    → valid MP4, odd rest → valid Matroska (same content closed forms,
    so demuxed aggregates are IDENTICAL for both containers — the
    oracle needs no per-container arithmetic)."""
    from fuse_query_spark.operators.mkv import _mkv_bytes
    from fuse_query_spark.operators.mp4 import _mp4_bytes

    def one(d: int) -> bytes:
        m = d % 7
        if m == 0:
            return _mp4_bytes(d)[:-25]
        if m == 1:
            return b"plain text payload #%d, not a container" % d
        return _mp4_bytes(d) if d % 2 == 0 else _mkv_bytes(d)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "content": [one(int(i)) for i in pdf[id_col]],
                }
            )

    return _tagged_map(df.select(id_col), _gen, "doc_id LONG, content BINARY")
