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
