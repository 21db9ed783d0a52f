"""Container sniff + quarantine routing (operators/containers.py):
truncated downloads and mislabeled bytes degrade per-row, never fail
the partition."""

from fuse_query_spark.operators.containers import (
    demux_quarantine,
    sniff_container,
    synthesize_mixed_container_blobs,
)
from fuse_query_spark.operators.mkv import _mkv_bytes
from fuse_query_spark.operators.mp4 import _mp4_bytes


class TestSniff:
    def test_known_containers(self):
        assert sniff_container(_mp4_bytes(5)) == "mp4"
        assert sniff_container(_mkv_bytes(5)) == "mkv"

    def test_unknown_bytes(self):
        assert sniff_container(b"") is None
        assert sniff_container(b"hello world, definitely text") is None
        assert sniff_container(b"\x89PNG\r\n\x1a\n" + bytes(20)) is None

    def test_truncated_mp4_still_sniffs_as_mp4(self):
        """Routing vs parsing: a cut-off download still LOOKS like mp4
        (ftyp intact) — it must route to the mp4 parser and quarantine
        there with the parser's reason, not fall into unknown."""
        assert sniff_container(_mp4_bytes(7)[:-25]) == "mp4"

    def test_headerless_fragment_sniffs(self):
        frag = (100).to_bytes(4, "big") + b"mdat" + bytes(92)
        assert sniff_container(frag) == "mp4"


class TestRouting:
    def test_mixed_corpus_routes_and_aggregates(self, spark):
        docs = spark.range(0, 28).withColumnRenamed("id", "doc_id")
        rows = {
            r.doc_id: r
            for r in demux_quarantine(synthesize_mixed_container_blobs(docs)).collect()
        }
        assert len(rows) == 28
        for d, r in rows.items():
            m = d % 7
            if m == 0:
                assert r.status == "quarantined" and r.container == "mp4"
                assert r.reason and r.n_samples is None
            elif m == 1:
                assert r.status == "quarantined" and r.container is None
                assert r.reason == "unknown-container"
            else:
                n_v, n_a = 3 + d % 5, 2 + d % 3
                assert r.status == "demuxed" and r.reason is None
                assert r.container == ("mp4" if d % 2 == 0 else "mkv")
                assert (r.n_tracks, r.n_samples) == (2, n_v + n_a)
                assert r.n_keyframes == (n_v + 2) // 3 + n_a
                want = sum(
                    sum((d * 31 + i * 17 + j) % 251 for j in range(16 + (d + i) % 7))
                    for i in range(n_v)
                ) + sum(
                    sum((d * 13 + i * 7 + j) % 199 for j in range(8 + (d + i) % 5))
                    for i in range(n_a)
                )
                assert r.byte_sum == want, d

    def test_containers_cross_check_each_other(self, spark):
        """The same doc_id demuxed from MP4 and from Matroska must give
        identical aggregates — one closed form, two container stacks."""
        docs = spark.range(2, 25, 2).withColumnRenamed("id", "doc_id")
        from fuse_query_spark.operators.mkv import synthesize_mkv_blobs
        from fuse_query_spark.operators.mp4 import synthesize_mp4_blobs

        a = {
            r.doc_id: (r.n_tracks, r.n_samples, r.n_keyframes, r.byte_sum)
            for r in demux_quarantine(synthesize_mp4_blobs(docs)).collect()
        }
        b = {
            r.doc_id: (r.n_tracks, r.n_samples, r.n_keyframes, r.byte_sum)
            for r in demux_quarantine(synthesize_mkv_blobs(docs)).collect()
        }
        assert a == b and len(a) == 12


class TestMalformedNeverKillsPartition:
    """code-review r8: the parsers raised struct.error / IndexError /
    KeyError on specific malformed shapes, which escaped the
    quarantine's `except ValueError` and failed the whole stage. All
    parser escapes are now normalized to ValueError; these corpus
    shapes must come back as quarantined ROWS."""

    def _quarantine(self, spark, payloads):
        import pandas as pd

        def _gen(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "content": [payloads[int(i)] for i in pdf["doc_id"]],
                    }
                )

        docs = spark.range(0, len(payloads)).withColumnRenamed("id", "doc_id")
        blobs = docs.select("doc_id").mapInPandas(_gen, "doc_id LONG, content BINARY")
        return {r.doc_id: r for r in demux_quarantine(blobs).collect()}

    def test_review_repro_corpus(self, spark):
        import struct

        from fuse_query_spark.operators.mkv import (
            CLUSTER,
            CLUSTER_TS,
            EBML_HEADER,
            SEGMENT,
            SIMPLE_BLOCK,
            TRACK_ENTRY,
            TRACK_TYPE,
            TRACKS,
            _elem,
            _vint_size,
        )

        # (1) mp4 with a corrupted stts entry count -> was struct.error
        mp4 = bytearray(_mp4_bytes(4))
        j = bytes(mp4).find(b"stts")
        mp4[j + 8 : j + 12] = struct.pack(">I", 100000)
        # (2) mkv whose Xiph lace-size run hits EOF -> was IndexError
        ebml = _elem(EBML_HEADER, _elem(0x4282, b"matroska"))
        lace_block = _elem(
            SIMPLE_BLOCK,
            _vint_size(1) + (0).to_bytes(2, "big", signed=True) + bytes([0x82, 3])
            + b"\xff\xff",  # runs past the block end
        )
        mkv_trk = _elem(
            TRACKS,
            _elem(TRACK_ENTRY, _elem(0xD7, bytes([1])) + _elem(TRACK_TYPE, bytes([1]))),
        )
        mkv2 = ebml + _elem(
            SEGMENT,
            mkv_trk
            + _elem(CLUSTER, _elem(CLUSTER_TS, b"\x00") + lace_block),
        )
        # (3) mkv SimpleBlock shorter than its header -> was IndexError
        short_block = _elem(SIMPLE_BLOCK, _vint_size(1) + b"\x00")
        mkv3 = ebml + _elem(
            SEGMENT,
            mkv_trk + _elem(CLUSTER, _elem(CLUSTER_TS, b"\x00") + short_block),
        )
        # (4) mkv TrackEntry missing TrackNumber -> was KeyError
        mkv4 = ebml + _elem(
            SEGMENT,
            _elem(TRACKS, _elem(TRACK_ENTRY, _elem(TRACK_TYPE, bytes([1])))),
        )
        rows = self._quarantine(spark, [bytes(mp4), mkv2, mkv3, mkv4])
        assert len(rows) == 4
        for d, r in rows.items():
            assert r.status == "quarantined", (d, r)
            assert r.reason, d


def test_stsd_codec_fourcc(spark):
    """code-review r8: the stsd fourcc was read 4 bytes deep into the
    sample-entry body; it must be the entry's format field."""
    from fuse_query_spark.operators.mp4 import parse_mp4

    p = parse_mp4(_mp4_bytes(6))
    assert [t["codec"] for t in p["tracks"]] == ["raw ", "raw "]
