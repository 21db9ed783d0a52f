"""ISO-BMFF (MP4) demux (operators/mp4.py): box walk, sample-table
resolution, keyframe sampling — the container half of a video
pipeline; the codec payload is the documented library boundary."""

import struct

import pytest

from fuse_query_spark.operators.mp4 import (
    _box,
    _mp4_bytes,
    mp4_demux,
    mp4_keyframe_bytes,
    parse_mp4,
    synthesize_mp4_blobs,
)


class TestParse:
    def test_synthesized_file_round_trips(self):
        for d in (0, 1, 2, 3, 4, 7, 11, 42, 113):
            b = _mp4_bytes(d)
            p = parse_mp4(b)
            n_v, n_a = 3 + d % 5, 2 + d % 3
            vt = next(t for t in p["tracks"] if t["handler"] == "vide")
            at = next(t for t in p["tracks"] if t["handler"] == "soun")
            assert (p["brand"], vt["track_id"], at["track_id"]) == ("isom", 1, 2)
            assert (vt["timescale"], at["timescale"]) == (12800, 48000)
            assert len(vt["samples"]) == n_v and len(at["samples"]) == n_a
            for i, sm in enumerate(vt["samples"]):
                want_dts = i * 512 if i < 2 else 1024 + (i - 2) * 768
                assert sm["dts"] == want_dts
                assert sm["pts"] == want_dts + 256 * (i % 3)
                assert sm["is_sync"] == (i % 3 == 0)
                body = b[sm["offset"] : sm["offset"] + sm["size"]]
                assert body == bytes(
                    (d * 31 + i * 17 + j) % 251 for j in range(sm["size"])
                )
            for i, sm in enumerate(at["samples"]):
                # no stss box => EVERY sample is sync (§8.6.2)
                assert sm["is_sync"] and sm["dts"] == sm["pts"] == i * 1024
                body = b[sm["offset"] : sm["offset"] + sm["size"]]
                assert body == bytes(
                    (d * 13 + i * 7 + j) % 199 for j in range(sm["size"])
                )

    def test_largesize_and_co64(self):
        """64-bit box sizes and 64-bit chunk offsets parse identically:
        rewrite doc 3's mdat header as a largesize box (shifting every
        chunk offset by 8) and its video stco as co64."""
        d = 3
        b = _mp4_bytes(d)
        base = parse_mp4(b)
        ftyp_len = int.from_bytes(b[:4], "big")
        mdat_size = int.from_bytes(b[ftyp_len : ftyp_len + 4], "big")
        mdat_body = b[ftyp_len + 8 : ftyp_len + mdat_size]
        large_mdat = (
            struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(mdat_body)) + mdat_body
        )
        moov = b[ftyp_len + mdat_size :]
        # every stco offset moves +8 (largesize header is 16 bytes, was 8)
        out = bytearray(b[:ftyp_len] + large_mdat + moov)
        moov_at = ftyp_len + len(large_mdat)
        i = moov_at
        while True:
            j = out.find(b"stco", i)
            if j < 0:
                break
            n = int.from_bytes(out[j + 8 : j + 12], "big")
            for k in range(n):
                o = j + 12 + 4 * k
                out[o : o + 4] = struct.pack(
                    ">I", int.from_bytes(out[o : o + 4], "big") + 8
                )
            i = j + 4
        shifted = parse_mp4(bytes(out))
        for t0, t1 in zip(base["tracks"], shifted["tracks"]):
            for s0, s1 in zip(t0["samples"], t1["samples"]):
                assert s1["offset"] == s0["offset"] + 8
                assert (s1["size"], s1["dts"], s1["pts"], s1["is_sync"]) == (
                    s0["size"], s0["dts"], s0["pts"], s0["is_sync"],
                )
        # now co64: replace the VIDEO stco payload with 64-bit offsets
        j = bytes(out).find(b"stco", moov_at)
        size0 = int.from_bytes(out[j - 4 : j], "big")
        n = int.from_bytes(out[j + 8 : j + 12], "big")
        offs = [
            int.from_bytes(out[j + 12 + 4 * k : j + 16 + 4 * k], "big")
            for k in range(n)
        ]
        co64 = _box(
            b"co64",
            bytes(4) + struct.pack(">I", n) + b"".join(struct.pack(">Q", o) for o in offs),
        )
        out2 = bytes(out[: j - 4]) + co64 + bytes(out[j - 4 + size0 :])
        # fix enclosing box sizes (stbl/minf/mdia/trak/moov grew by 4*n-... )
        # simpler: co64 is 4 bytes/entry larger; patch ancestors
        delta = len(co64) - size0
        out2 = bytearray(out2)
        for anc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            k = out2.find(anc, moov_at - 8)
            while k >= 0 and k < j:
                end_guess = k - 4 + int.from_bytes(out2[k - 4 : k], "big")
                if end_guess >= j:  # this ancestor encloses the table
                    out2[k - 4 : k] = struct.pack(
                        ">I", int.from_bytes(out2[k - 4 : k], "big") + delta
                    )
                k = out2.find(anc, k + 4)
        again = parse_mp4(bytes(out2))
        vt = next(t for t in again["tracks"] if t["handler"] == "vide")
        vs = next(t for t in shifted["tracks"] if t["handler"] == "vide")
        assert [s["offset"] for s in vt["samples"]] == [
            s["offset"] for s in vs["samples"]
        ]

    def test_corrupt_tables_raise(self):
        b = bytearray(_mp4_bytes(2))
        with pytest.raises(ValueError, match="no moov"):
            parse_mp4(b[: int.from_bytes(b[:4], "big")])  # ftyp only
        # truncate the file mid-mdat: box walk must reject, not wrap
        with pytest.raises(ValueError, match="bad box size|trailing"):
            parse_mp4(bytes(b[:-40]))
        # stsz claiming one extra sample: stts/stsc coverage must fail
        j = bytes(b).find(b"stsz")
        n = int.from_bytes(b[j + 12 : j + 16], "big")
        b2 = bytearray(b)
        b2[j + 12 : j + 16] = struct.pack(">I", n + 1)
        with pytest.raises(ValueError):
            parse_mp4(bytes(b2))


class TestDistributed:
    def test_demux_rows_and_keyframe_extraction(self, spark):
        docs = spark.range(0, 12).withColumnRenamed("id", "doc_id")
        blobs = synthesize_mp4_blobs(docs)
        rows = mp4_demux(blobs).collect()
        want = sum((3 + d % 5) + (2 + d % 3) for d in range(12))
        assert len(rows) == want
        for r in rows:
            d, i = r.doc_id, r.sample_idx
            if r.handler == "vide":
                assert r.size == 16 + (d + i) % 7
                assert r.is_sync == (1 if i % 3 == 0 else 0)
                assert r.byte_sum == sum(
                    (d * 31 + i * 17 + j) % 251 for j in range(r.size)
                )
            else:
                assert r.is_sync == 1 and r.dts == r.pts == i * 1024
        # keyframe extraction: every 2nd sync sample of the video track,
        # payload bytes sliced straight from mdat
        frames = mp4_keyframe_bytes(blobs, every_n_sync=2).collect()
        for f in frames:
            d, i = f.doc_id, f.sample_idx
            assert i % 3 == 0 and (i // 3) % 2 == 0
            assert bytes(f.frame) == bytes(
                (d * 31 + i * 17 + j) % 251 for j in range(16 + (d + i) % 7)
            )
        want_frames = sum(
            len([i for i in range(3 + d % 5) if i % 3 == 0 and (i // 3) % 2 == 0])
            for d in range(12)
        )
        assert len(frames) == want_frames


class TestPropertyFuzz:
    """Generator-independent hardening: build files with RANDOM track
    geometry through an mp4 writer parameterized beyond the driver
    synthesizer's closed forms, and assert the demuxer recovers the
    generator's intent exactly."""

    def _build(self, chunks, deltas, ctts_offs, sync, version1_ctts=False):
        """One video track from explicit per-sample structure:
        chunks = list of lists of frame bytes; deltas = per-sample
        stts deltas; ctts_offs = per-sample pts offsets (may be
        negative => version 1); sync = set of 0-based keyframes."""
        import struct as s

        from fuse_query_spark.operators.mp4 import _box

        frames = [f for c in chunks for f in c]
        n = len(frames)

        def full(typ, body, version=0):
            return _box(typ, bytes([version, 0, 0, 0]) + body)

        ftyp = _box(b"ftyp", b"isom" + s.pack(">I", 512) + b"isomiso2")
        mdat_payload = b"".join(frames)
        mdat_off = len(ftyp) + 8
        offs, run = [], mdat_off
        for c in chunks:
            offs.append(run)
            run += sum(len(f) for f in c)
        # stts: run-length compress the deltas
        runs = []
        for d in deltas:
            if runs and runs[-1][1] == d:
                runs[-1][0] += 1
            else:
                runs.append([1, d])
        stts = full(b"stts", s.pack(">I", len(runs)) + b"".join(s.pack(">II", c, d) for c, d in runs))
        ver = 1 if version1_ctts else 0
        ctts = full(
            b"ctts",
            s.pack(">I", n)
            + b"".join(
                s.pack(">I", 1) + s.pack(">i" if ver else ">I", o) for o in ctts_offs
            ),
            version=ver,
        )
        stss = full(
            b"stss",
            s.pack(">I", len(sync)) + b"".join(s.pack(">I", i + 1) for i in sorted(sync)),
        )
        stsz = full(b"stsz", s.pack(">II", 0, n) + b"".join(s.pack(">I", len(f)) for f in frames))
        # stsc: run-length by samples-per-chunk
        sruns = []
        for ci, c in enumerate(chunks):
            if sruns and sruns[-1][1] == len(c):
                continue
            sruns.append([ci + 1, len(c)])
        stsc = full(b"stsc", s.pack(">I", len(sruns)) + b"".join(s.pack(">III", f, spc, 1) for f, spc in sruns))
        stco = full(b"stco", s.pack(">I", len(offs)) + b"".join(s.pack(">I", o) for o in offs))
        stsd = full(b"stsd", s.pack(">I", 1) + _box(b"raw ", bytes(6) + s.pack(">H", 1) + bytes(70)))
        stbl = _box(b"stbl", stsd + stts + ctts + stss + stsz + stsc + stco)
        tkhd = full(b"tkhd", s.pack(">IIII", 0, 0, 1, 0) + bytes(64))
        mdhd = full(b"mdhd", s.pack(">IIII", 0, 0, 1000, 0) + bytes(4))
        hdlr = full(b"hdlr", s.pack(">I", 0) + b"vide" + bytes(13))
        trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl)))
        moov = _box(b"moov", full(b"mvhd", s.pack(">IIII", 0, 0, 1000, 0) + bytes(80)) + trak)
        return ftyp + _box(b"mdat", mdat_payload) + moov

    def test_random_geometry_round_trips(self):
        import random

        from fuse_query_spark.operators.mp4 import parse_mp4

        rng = random.Random(1234)
        for trial in range(60):
            n = rng.randint(1, 24)
            sizes = [rng.randint(1, 40) for _ in range(n)]
            frames = [bytes(rng.randrange(256) for _ in range(sz)) for sz in sizes]
            chunks, i = [], 0
            while i < n:
                take = rng.randint(1, min(4, n - i))
                chunks.append(frames[i : i + take])
                i += take
            deltas = [rng.choice((256, 512, 512, 1024)) for _ in range(n)]
            use_v1 = rng.random() < 0.5
            ctts_offs = [
                rng.randint(-512, 512) if use_v1 else rng.randint(0, 512)
                for _ in range(n)
            ]
            sync = {i for i in range(n) if rng.random() < 0.4} | {0}
            data = self._build(chunks, deltas, ctts_offs, sync, version1_ctts=use_v1)
            tr = parse_mp4(data)["tracks"][0]
            assert len(tr["samples"]) == n, trial
            clock = 0
            for i, sm in enumerate(tr["samples"]):
                assert sm["dts"] == clock, (trial, i)
                assert sm["pts"] == clock + ctts_offs[i], (trial, i, "ctts")
                assert sm["is_sync"] == (i in sync), (trial, i)
                assert data[sm["offset"] : sm["offset"] + sm["size"]] == frames[i], (
                    trial, i, "bytes",
                )
                clock += deltas[i]


def test_container_plus_codec_composition(spark):
    """End-to-end video curation shape: the mdat samples ARE valid P6
    images (the codec-free format), so demux → keyframe selection →
    frame extraction → image decode compose into the full pipeline a
    crawl pass runs — container logic and codec logic verified
    TOGETHER, not just separately."""
    import pandas as pd

    from fuse_query_spark.operators.mp4 import mp4_keyframe_bytes
    from fuse_query_spark.operators.multimodal import _ppm_bytes, _ppm_frame

    # build MP4s whose video samples are PPM frames of doc d:
    # frame i = _ppm_bytes(d*1000 + i), 4 frames, all keyframes
    def build(d: int) -> bytes:
        import struct as s

        from fuse_query_spark.operators.mp4 import _box

        frames = [_ppm_bytes(d * 1000 + i) for i in range(4)]

        def full(typ, body):
            return _box(typ, bytes(4) + body)

        ftyp = _box(b"ftyp", b"isom" + s.pack(">I", 512) + b"isomiso2")
        mdat = _box(b"mdat", b"".join(frames))
        off = len(ftyp) + 8
        offs = []
        for f in frames:
            offs.append(off)
            off += len(f)
        stbl = _box(
            b"stbl",
            full(b"stsd", s.pack(">I", 1) + _box(b"ppm ", bytes(6) + s.pack(">H", 1)))
            + full(b"stts", s.pack(">III", 1, 4, 512))
            + full(b"stsz", s.pack(">II", 0, 4) + b"".join(s.pack(">I", len(f)) for f in frames))
            + full(b"stsc", s.pack(">IIII", 1, 1, 1, 1))
            + full(b"stco", s.pack(">I", 4) + b"".join(s.pack(">I", o) for o in offs)),
        )
        trak = _box(
            b"trak",
            full(b"tkhd", s.pack(">IIII", 0, 0, 1, 0) + bytes(64))
            + _box(
                b"mdia",
                full(b"mdhd", s.pack(">IIII", 0, 0, 12800, 0) + bytes(4))
                + full(b"hdlr", s.pack(">I", 0) + b"vide" + bytes(13))
                + _box(b"minf", stbl),
            ),
        )
        return ftyp + mdat + _box(b"moov", full(b"mvhd", s.pack(">IIII", 0, 0, 1000, 0) + bytes(80)) + trak)

    def _gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "content": [build(int(i)) for i in pdf["doc_id"]]}
            )

    docs = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    blobs = docs.select("doc_id").mapInPandas(_gen, "doc_id LONG, content BINARY")
    # no stss => ALL samples sync; every 2nd keyframe => samples 0, 2
    frames = mp4_keyframe_bytes(blobs, every_n_sync=2).collect()
    assert len(frames) == 16  # 8 docs x 2 kept frames
    for f in frames:
        assert f.sample_idx in (0, 2)
        # the extracted frame is a VALID PPM whose dims follow
        # _ppm_bytes' closed form for id = doc_id*1000 + sample_idx
        pid = f.doc_id * 1000 + f.sample_idx
        w, h, bps, start, end = _ppm_frame(bytes(f.frame), 0)
        assert (w, h) == (4 + pid % 13, 4 + pid % 11)
        assert end == len(bytes(f.frame))
