"""MP4 / ISO-BMFF codec goldens (functions/mp4.py): container parse,
sample-table offset expansion, jpeg-sample-entry frame decode, and the
multimodal wiring.

The entropy layer of the repo's baseline JPEG encoder is lossless, so
``mp4_frames(encode_mp4(frames))`` must match ``jpeg.expected_decode``
bit-for-bit (tests/test_jpeg.py establishes the underlying codec)."""

import hashlib
import struct

import numpy as np
import pytest

from news_crawler_ray.functions import mp4 as m4
from news_crawler_ray.functions import multimodal as mm
from news_crawler_ray.functions.jpeg import expected_decode


def _rgb_frames(n, h, w, seed=0):
    rng = np.random.RandomState(41 + seed)
    return [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n)]


class TestContainer:
    def test_decode_meta(self):
        frames = _rgb_frames(6, 16, 24)
        payload = m4.encode_mp4(frames, fps=(30, 1))
        meta = m4.decode_mp4(payload)
        assert (meta["width"], meta["height"]) == (24, 16)
        assert meta["n_frames"] == 6 == meta["n_samples_sized"]
        assert meta["codec"] == "jpeg" and meta["brand"] == "isom"
        assert meta["fps_num"] // meta["fps_den"] == 30

    def test_fractional_fps(self):
        payload = m4.encode_mp4(_rgb_frames(2, 8, 8), fps=(30000, 1001))
        meta = m4.decode_mp4(payload)
        assert meta["fps_num"] / meta["fps_den"] == pytest.approx(
            30000 / 1001)

    def test_not_mp4_raises(self):
        with pytest.raises(ValueError):
            m4.decode_mp4(b"RIFF\x04\x00\x00\x00AVI ")
        with pytest.raises(ValueError):
            m4.decode_mp4(b"\x00" * 20)

    def test_sample_offset_expansion_multi_chunk(self):
        # two stsc runs: chunks 1-2 carry 2 samples each, chunk 3 one
        stbl = {"sizes": [10, 20, 30, 40, 50],
                "chunk_offsets": [100, 200, 300],
                "stsc": [(1, 2), (3, 1)]}
        assert m4._sample_offsets(stbl) == [
            (100, 10), (110, 20), (200, 30), (230, 40), (300, 50)]

    def test_64bit_largesize_box_walk(self):
        body = b"x" * 5
        big = struct.pack(">I", 1) + b"blob" + struct.pack(">Q", 16 + 5) \
            + body
        got = list(m4._walk(big, 0, len(big)))
        assert got == [(b"blob", 16, 21)]


class TestFrameDecode:
    @pytest.mark.parametrize("subsample", [False, True])
    def test_matches_expected_decode(self, subsample):
        frames = _rgb_frames(4, 16, 16, seed=5)
        payload = m4.encode_mp4(frames, subsample=subsample)
        got = list(m4.mp4_frames(payload))
        assert [g["frame_idx"] for g in got] == [0, 1, 2, 3]
        for fr, px in zip(got, frames):
            assert np.array_equal(
                fr["rgb"], expected_decode(px, subsample=subsample))

    def test_bitstream_codec_raises_not_implemented(self):
        payload = bytearray(m4.encode_mp4(_rgb_frames(1, 8, 8)))
        # rewrite the stsd sample-entry fourcc jpeg -> avc1: metadata
        # stays parseable, frame decode must refuse
        idx = payload.index(b"jpeg")
        payload[idx:idx + 4] = b"avc1"
        meta = m4.decode_mp4(bytes(payload))
        assert meta["codec"] == "avc1" and meta["n_frames"] == 1
        with pytest.raises(NotImplementedError):
            list(m4.mp4_frames(bytes(payload)))


class TestMultimodalWiring:
    def test_sniff(self):
        payload = m4.encode_mp4(_rgb_frames(1, 8, 8))
        assert mm.sniff_format(payload) == "mp4"

    def test_real_decode_meta(self):
        frames = _rgb_frames(3, 8, 8, seed=9)
        payload = m4.encode_mp4(frames, fps=(24, 1))
        m = mm.real_decode_meta(payload)
        assert (m["width"], m["height"], m["n_frames"]) == (8, 8, 3)
        assert m["sample_rate"] == 24
        first = expected_decode(frames[0], subsample=False)
        assert m["pixel_sha1"] == hashlib.sha1(
            first.tobytes()).hexdigest()[:16]

    def test_frame_sample_stage_real(self):
        frames = _rgb_frames(5, 8, 8, seed=13)
        payload = m4.encode_mp4(frames)
        rows = list(mm.FrameSampleStage(
            every_k=2, real_decode=True)._rows(payload))
        assert [f for f, _ in rows] == [0, 2, 4]
        for f, hh in rows:
            exp = expected_decode(frames[f], subsample=False)
            assert hh == hashlib.sha1(exp.tobytes()).hexdigest()[:16]


class TestStz2:
    """Compact sample-size box (14496-12 §8.7.3.3): rewrite a valid
    file's stsz as an equivalent stz2 and require decode parity."""

    def test_16bit_stz2_parity(self):
        frames = _rgb_frames(3, 8, 8, seed=21)
        p = m4.encode_mp4(frames)
        ref = [f["rgb"] for f in m4.mp4_frames(p)]
        i = p.index(b"stsz") - 4
        size = struct.unpack_from(">I", p, i)[0]
        _, count = struct.unpack_from(">II", p, i + 12)
        sizes = struct.unpack_from(f">{count}I", p, i + 20)
        body = (b"\x00" * 4 + b"\x00\x00\x00" + bytes([16])
                + struct.pack(">I", count)
                + struct.pack(f">{count}H", *sizes))
        stz2 = struct.pack(">I", 8 + len(body)) + b"stz2" + body
        p2 = bytearray(p[:i] + stz2 + p[i + size:])
        delta = len(stz2) - size
        for four in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
            j = p2.index(four) - 4
            struct.pack_into(">I", p2, j,
                             struct.unpack_from(">I", p2, j)[0] + delta)
        assert m4.decode_mp4(bytes(p2))["n_samples_sized"] == count
        got = [f["rgb"] for f in m4.mp4_frames(bytes(p2))]
        assert all(np.array_equal(a, b) for a, b in zip(got, ref))

    def test_4bit_nibble_unpack(self):
        body = (b"\x00" * 4 + b"\x00\x00\x00" + bytes([4])
                + struct.pack(">I", 3) + bytes([0x5A, 0x70]))
        box = struct.pack(">I", 8 + len(body)) + b"stz2" + body
        assert m4._parse_stbl(box, 0, len(box))["sizes"] == [5, 10, 7]

    def test_bad_field_size_raises(self):
        body = (b"\x00" * 4 + b"\x00\x00\x00" + bytes([7])
                + struct.pack(">I", 1) + b"\x09")
        box = struct.pack(">I", 8 + len(body)) + b"stz2" + body
        with pytest.raises(ValueError):
            m4._parse_stbl(box, 0, len(box))
