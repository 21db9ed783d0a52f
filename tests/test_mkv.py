"""Matroska/WebM demux (operators/mkv.py): EBML varint walk, block
header decode, all three lacing modes, BlockGroup keyframe semantics."""

import pytest

from fuse_query_spark.operators.mkv import (
    BLOCK,
    BLOCK_GROUP,
    CLUSTER,
    CLUSTER_TS,
    REFERENCE_BLOCK,
    SIMPLE_BLOCK,
    _block_frames,
    _elem,
    _mkv_bytes,
    _read_id,
    _read_size,
    _vint_size,
    mkv_demux,
    parse_mkv,
    synthesize_mkv_blobs,
)


class TestEbmlPrimitives:
    def test_vint_size_round_trips(self):
        for v in (0, 1, 126, 127, 128, 16382, 16383, 2**21 - 2, 2**28 - 2, 2**35):
            enc = _vint_size(v)
            got, end = _read_size(enc, 0)
            assert got == v and end == len(enc), v

    def test_unknown_size_is_none(self):
        assert _read_size(b"\xff", 0) == (None, 1)
        assert _read_size(b"\x7f\xff", 0) == (None, 2)

    def test_id_keeps_marker(self):
        assert _read_id(b"\x1a\x45\xdf\xa3", 0) == (0x1A45DFA3, 4)
        assert _read_id(b"\xae", 0) == (0xAE, 1)
        with pytest.raises(ValueError, match="invalid id"):
            _read_id(b"\x0f\x00\x00\x00\x00", 0)


class TestLacing:
    def _blk(self, frames, lacing):
        hdr = _vint_size(1) + (0).to_bytes(2, "big", signed=True)
        flags = 0x80 | (lacing << 1)
        body = bytearray(hdr + bytes([flags]))
        if lacing:
            body += bytes([len(frames) - 1])
        if lacing == 0b01:  # Xiph
            for f in frames[:-1]:
                sz = len(f)
                body += b"\xff" * (sz // 255) + bytes([sz % 255])
        elif lacing == 0b11:  # EBML
            body += _vint_size(len(frames[0]))
            for a, b in zip(frames, frames[1:-1]):
                body += ((len(b) - len(a)) + 63 | 0x80).to_bytes(1, "big")
        return bytes(body) + b"".join(frames)

    def test_no_lacing(self):
        tn, rel, flags, fr = _block_frames(self._blk([b"abc"], 0), 0, 9)
        assert (tn, rel, fr) == (1, 0, [b"abc"])

    def test_xiph_lacing_incl_255_run(self):
        frames = [b"x" * 300, b"y" * 5, b"z" * 7]
        raw = self._blk(frames, 0b01)
        _, _, _, fr = _block_frames(raw, 0, len(raw))
        assert fr == frames

    def test_fixed_lacing(self):
        frames = [b"aaaa", b"bbbb", b"cccc"]
        raw = self._blk(frames, 0b10)
        _, _, _, fr = _block_frames(raw, 0, len(raw))
        assert fr == frames
        bad = raw + b"!"  # total no longer divisible by 3
        with pytest.raises(ValueError, match="non-divisible"):
            _block_frames(bad, 0, len(bad))

    def test_ebml_lacing_signed_deltas(self):
        frames = [b"a" * 10, b"b" * 7, b"c" * 12, b"d" * 3]
        raw = self._blk(frames, 0b11)
        _, _, _, fr = _block_frames(raw, 0, len(raw))
        assert fr == frames


class TestParse:
    def test_synthesized_round_trip_all_doc_ids(self):
        for d in range(24):
            p = parse_mkv(_mkv_bytes(d))
            vf = [f for f in p["frames"] if f["track_id"] == 1]
            af = [f for f in p["frames"] if f["track_id"] == 2]
            assert len(vf) == 3 + d % 5 and len(af) == 2 + d % 3
            for i, f in enumerate(vf):
                assert f["ts"] == (i // 2) * 1000 + (i % 2) * 40
                assert f["keyframe"] == (i % 3 == 0)
                assert f["payload"] == bytes(
                    (d * 31 + i * 17 + j) % 251 for j in range(16 + (d + i) % 7)
                )
            for i, f in enumerate(af):
                assert f["ts"] == 5000 and f["keyframe"] and f["lace_idx"] == i
                assert f["payload"] == bytes(
                    (d * 13 + i * 7 + j) % 199 for j in range(8 + (d + i) % 5)
                )

    def test_blockgroup_keyframe_is_no_referenceblock(self):
        """§6.3: inside a BlockGroup, keyframe ⇔ ReferenceBlock absent
        (the Block header's 0x80 bit is only meaningful in
        SimpleBlock)."""
        base = _mkv_bytes(1)
        p0 = parse_mkv(base)
        seg_frames = len(p0["frames"])

        def block(payload):
            return _elem(
                BLOCK,
                _vint_size(1) + (0).to_bytes(2, "big", signed=True) + b"\x00" + payload,
            )

        bg_key = _elem(BLOCK_GROUP, block(b"KEY1"))
        bg_delta = _elem(
            BLOCK_GROUP, block(b"DEL1") + _elem(REFERENCE_BLOCK, b"\x7f")
        )
        extra = _elem(
            CLUSTER, _elem(CLUSTER_TS, (9000).to_bytes(2, "big")) + bg_key + bg_delta
        )
        # splice the extra cluster into the Segment (rebuild sizes)
        from fuse_query_spark.operators.mkv import SEGMENT, _elements

        segs = [(s, e) for i, s, e in _elements(base, 0, len(base)) if i == SEGMENT]
        s, e = segs[0]
        rebuilt = base[: s - len(_vint_size(e - s))]
        rebuilt = rebuilt[: rebuilt.rfind(b"\x18\x53\x80\x67") + 4]
        payload = base[s:e] + extra
        rebuilt += _vint_size(len(payload)) + payload
        p1 = parse_mkv(rebuilt)
        added = [f for f in p1["frames"] if f["ts"] == 9000]
        assert len(p1["frames"]) == seg_frames + 2 and len(added) == 2
        by_payload = {bytes(f["payload"]): f["keyframe"] for f in added}
        assert by_payload == {b"KEY1": True, b"DEL1": False}

    def test_corrupt_inputs_raise(self):
        with pytest.raises(ValueError, match="invalid id"):
            parse_mkv(b"\x00\x01\x02\x03")  # 0x00 can't start an EBML id
        with pytest.raises(ValueError, match="EBML header"):
            # valid elements, but the first is not the EBML header
            parse_mkv(_elem(CLUSTER, b""))
        b = _mkv_bytes(2)
        with pytest.raises(ValueError, match="overruns|truncated"):
            parse_mkv(b[:-5])
        # a block referencing an undeclared track
        bad_cluster = _elem(
            CLUSTER,
            _elem(CLUSTER_TS, b"\x00")
            + _elem(
                SIMPLE_BLOCK,
                _vint_size(9) + (0).to_bytes(2, "big", signed=True) + b"\x80" + b"xx",
            ),
        )
        from fuse_query_spark.operators.mkv import SEGMENT, _elements

        segs = [(s, e) for i, s, e in _elements(b, 0, len(b)) if i == SEGMENT]
        s, e = segs[0]
        head = b[: b.rfind(b"\x18\x53\x80\x67") + 4]
        payload = b[s:e] + bad_cluster
        with pytest.raises(ValueError, match="undeclared track"):
            parse_mkv(head + _vint_size(len(payload)) + payload)


class TestDistributed:
    def test_demux_rows(self, spark):
        docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        rows = mkv_demux(synthesize_mkv_blobs(docs)).collect()
        want = sum((3 + d % 5) + (2 + d % 3) for d in range(10))
        assert len(rows) == want
        for r in rows:
            d, i = r.doc_id, r.frame_idx
            if r.ttype == "video":
                assert r.codec == "V_RAW" and r.lace_idx == 0
                assert r.byte_sum == sum(
                    (d * 31 + i * 17 + j) % 251 for j in range(16 + (d + i) % 7)
                )
            else:
                assert r.codec == "A_RAW" and r.ts == 5000 and r.keyframe == 1
                assert r.byte_sum == sum(
                    (d * 13 + i * 7 + j) % 199 for j in range(8 + (d + i) % 5)
                )


def _svint(delta: int) -> bytes:
    """Encode an EBML-lacing SIGNED vint: value = delta + (2^(7*ln-1)-1)
    with the shortest length whose range covers it."""
    for ln in range(1, 5):
        bias = (1 << (7 * ln - 1)) - 1
        if -bias <= delta <= bias:
            val = delta + bias
            return (val | (0x80 >> (ln - 1)) << (8 * (ln - 1))).to_bytes(ln, "big")
    raise ValueError("delta out of range")


class TestPropertyFuzz:
    """Generator-independent hardening: random cluster/block/lacing
    geometry through a writer parameterized beyond the driver
    synthesizer, demuxer must recover the intent exactly."""

    def _build(self, blocks):
        """blocks = list of (cluster_ts, rel_ts, keyframe, lacing,
        frames). Fixed lacing requires equal frame sizes; caller
        guarantees it."""
        from fuse_query_spark.operators.mkv import (
            CLUSTER,
            CLUSTER_TS,
            EBML_HEADER,
            INFO,
            SEGMENT,
            SIMPLE_BLOCK,
            TIMESTAMP_SCALE,
            TRACK_ENTRY,
            TRACK_NUMBER,
            TRACK_TYPE,
            TRACKS,
            CODEC_ID,
            _elem,
            _vint_size,
        )

        ebml = _elem(EBML_HEADER, _elem(0x4282, b"matroska"))
        info = _elem(INFO, _elem(TIMESTAMP_SCALE, (1_000_000).to_bytes(3, "big")))
        tracks = _elem(
            TRACKS,
            _elem(
                TRACK_ENTRY,
                _elem(TRACK_NUMBER, bytes([1]))
                + _elem(TRACK_TYPE, bytes([1]))
                + _elem(CODEC_ID, b"V_RAW"),
            ),
        )
        clusters = b""
        for cts, rel, key, lacing, frames in blocks:
            hdr = _vint_size(1) + rel.to_bytes(2, "big", signed=True)
            flags = (0x80 if key else 0) | (lacing << 1)
            body = bytearray(hdr + bytes([flags]))
            if lacing:
                body += bytes([len(frames) - 1])
                if lacing == 0b01:
                    for f in frames[:-1]:
                        sz = len(f)
                        body += b"\xff" * (sz // 255) + bytes([sz % 255])
                elif lacing == 0b11:
                    body += _vint_size(len(frames[0]))
                    for a, b in zip(frames, frames[1:-1]):
                        body += _svint(len(b) - len(a))
            payload = bytes(body) + b"".join(frames)
            clusters += _elem(
                CLUSTER,
                _elem(CLUSTER_TS, cts.to_bytes(3, "big"))
                + _elem(SIMPLE_BLOCK, payload),
            )
        return ebml + _elem(SEGMENT, info + tracks + clusters)

    def test_random_blocks_round_trip(self):
        import random

        from fuse_query_spark.operators.mkv import parse_mkv

        rng = random.Random(99)
        for trial in range(60):
            blocks, want = [], []
            for _ in range(rng.randint(1, 8)):
                cts = rng.randint(0, 60000)
                rel = rng.randint(-5000, 5000)
                key = rng.random() < 0.5
                lacing = rng.choice((0, 0b01, 0b10, 0b11))
                if lacing == 0:
                    n_f = 1
                elif lacing == 0b11:
                    n_f = rng.randint(2, 5)  # EBML lacing needs >= 2
                else:
                    n_f = rng.randint(1, 5)
                if lacing == 0b10:  # fixed: equal sizes
                    sz = rng.randint(1, 50)
                    frames = [
                        bytes(rng.randrange(256) for _ in range(sz))
                        for _ in range(n_f)
                    ]
                else:
                    frames = [
                        bytes(rng.randrange(256) for _ in range(rng.randint(1, 300)))
                        for _ in range(n_f)
                    ]
                blocks.append((cts, rel, key, lacing, frames))
                for li, f in enumerate(frames):
                    want.append((cts + rel, key, li, f))
            data = self._build(blocks)
            got = [
                (f["ts"], f["keyframe"], f["lace_idx"], bytes(f["payload"]))
                for f in parse_mkv(data)["frames"]
            ]
            assert got == want, trial


def test_unknown_size_segment_and_final_cluster():
    """Live-muxed Matroska commonly ships an unknown-size Segment and
    an unknown-size final Cluster (the muxer can't seek back to patch
    lengths). Both must parse, scoped to the enclosing end."""
    from fuse_query_spark.operators.mkv import (
        CLUSTER_TS,
        EBML_HEADER,
        INFO,
        SIMPLE_BLOCK,
        TIMESTAMP_SCALE,
        TRACK_ENTRY,
        TRACK_NUMBER,
        TRACK_TYPE,
        TRACKS,
        CODEC_ID,
        _elem,
        _vint_size,
        parse_mkv,
    )

    ebml = _elem(EBML_HEADER, _elem(0x4282, b"matroska"))
    info = _elem(INFO, _elem(TIMESTAMP_SCALE, (1_000_000).to_bytes(3, "big")))
    tracks = _elem(
        TRACKS,
        _elem(
            TRACK_ENTRY,
            _elem(TRACK_NUMBER, bytes([1]))
            + _elem(TRACK_TYPE, bytes([1]))
            + _elem(CODEC_ID, b"V_RAW"),
        ),
    )
    block = _elem(
        SIMPLE_BLOCK,
        _vint_size(1) + (7).to_bytes(2, "big", signed=True) + b"\x80" + b"LIVE",
    )
    # unknown-size cluster: id + 0xFF size, children to EOF
    cluster = (0x1F43B675).to_bytes(4, "big") + b"\xff" + _elem(
        CLUSTER_TS, (400).to_bytes(2, "big")
    ) + block
    # unknown-size segment: id + 0xFF size, children to EOF
    segment = (0x18538067).to_bytes(4, "big") + b"\xff" + info + tracks + cluster
    p = parse_mkv(ebml + segment)
    assert len(p["frames"]) == 1
    f = p["frames"][0]
    assert f["ts"] == 407 and f["keyframe"] and bytes(f["payload"]) == b"LIVE"
