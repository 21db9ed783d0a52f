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
