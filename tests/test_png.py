"""PNG codec conformance (functions/png.py).

PNG is fully lossless, so decode(encode(px)) must equal px EXACTLY.
System .png files from the OS image exercise the filter types,
palettes and bit layouts a real encoder (libpng & friends) produces —
the decoder must handle whatever is present without crashing and with
plausible dimensions.
"""

from __future__ import annotations

import glob
import struct
import zlib

import numpy as np
import pytest

from news_crawler_ray.functions import multimodal as mm
from news_crawler_ray.functions.png import _chunk, decode_png, encode_png


def _gradient(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


def _make_png(w, h, depth, color, raws, plte=None, trns=None,
              interlace=0):
    """Hand-rolled PNG with arbitrary IHDR/filters for decode tests."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = sig + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(raws))
    return out + _chunk(b"IEND", b"")


class TestPngRoundTrip:
    @pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 16), (33, 31)])
    def test_lossless_roundtrip(self, h, w):
        px = _gradient(h, w, seed=h * 10 + w)
        d = decode_png(encode_png(px))
        assert (d["width"], d["height"]) == (w, h)
        assert np.array_equal(d["pixels"], px)       # EXACT


class TestPngFilters:
    """Each scanline filter type decoded against a hand-computed raw."""

    def test_sub_up_average_paeth(self):
        # 2x2 RGB image, one filter per row across two images
        px = np.array([[[10, 20, 30], [40, 60, 80]],
                       [[15, 25, 35], [50, 70, 90]]], dtype=np.uint8)
        flat0, flat1 = px[0].reshape(-1), px[1].reshape(-1)
        # row0 Sub: raw[i] = x[i] - x[i-3]
        r0 = bytearray([1]) + bytes(
            [(int(flat0[i]) - (int(flat0[i - 3]) if i >= 3 else 0)) % 256
             for i in range(6)])
        # row1 Up: raw[i] = x[i] - prev[i]
        r1 = bytearray([2]) + bytes(
            [(int(flat1[i]) - int(flat0[i])) % 256 for i in range(6)])
        d = decode_png(_make_png(2, 2, 8, 2, bytes(r0 + r1)))
        assert np.array_equal(d["pixels"], px)

        # Average and Paeth rows
        r0 = bytearray([3]) + bytes(
            [(int(flat0[i]) - ((int(flat0[i - 3]) if i >= 3 else 0) // 2))
             % 256 for i in range(6)])

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        r1 = bytearray([4]) + bytes(
            [(int(flat1[i]) - paeth(int(flat1[i - 3]) if i >= 3 else 0,
                                    int(flat0[i]),
                                    int(flat0[i - 3]) if i >= 3 else 0))
             % 256 for i in range(6)])
        d = decode_png(_make_png(2, 2, 8, 2, bytes(r0 + r1)))
        assert np.array_equal(d["pixels"], px)


class TestPngColorTypes:
    def test_grayscale(self):
        raw = b"\x00" + bytes([0, 128, 255])
        d = decode_png(_make_png(3, 1, 8, 0, raw))
        assert np.array_equal(d["pixels"][0, :, 0], [0, 128, 255])
        assert np.array_equal(d["pixels"][..., 0], d["pixels"][..., 2])

    def test_palette_with_trns(self):
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        raw = b"\x00" + bytes([0, 1, 2])
        d = decode_png(_make_png(3, 1, 8, 3, raw, plte=plte))
        assert np.array_equal(d["pixels"][0],
                              [[255, 0, 0], [0, 255, 0], [0, 0, 255]])
        # index 0 fully transparent → composites to white
        d = decode_png(_make_png(3, 1, 8, 3, raw, plte=plte,
                                 trns=bytes([0])))
        assert np.array_equal(d["pixels"][0, 0], [255, 255, 255])
        assert np.array_equal(d["pixels"][0, 1], [0, 255, 0])

    def test_rgba_composites_over_white(self):
        # one opaque red px, one half-transparent black, one invisible
        raw = b"\x00" + bytes([255, 0, 0, 255,
                               0, 0, 0, 128,
                               7, 7, 7, 0])
        d = decode_png(_make_png(3, 1, 8, 6, raw))
        assert np.array_equal(d["pixels"][0, 0], [255, 0, 0])
        assert np.array_equal(d["pixels"][0, 2], [255, 255, 255])
        assert abs(int(d["pixels"][0, 1, 0]) - 127) <= 1

    def test_16bit_takes_high_byte(self):
        raw = b"\x00" + struct.pack(">HHH", 0xFF00, 0x8001, 0x00FF)
        d = decode_png(_make_png(1, 1, 16, 2, raw))
        assert np.array_equal(d["pixels"][0, 0], [0xFF, 0x80, 0x00])

    def test_adam7_interlaced_single_pixel_passes(self):
        # 2x2 interlaced RGB: passes 1,2,3(empty),…; hand-build passes
        px = np.array([[[1, 2, 3], [4, 5, 6]],
                       [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8)
        # Adam7 on 2x2: pass1=(0,0), pass2..5 empty until pass6=(1,0),
        # pass7=(0,1),(1,1)
        raws = (b"\x00" + px[0, 0].tobytes()          # pass 1
                + b"\x00" + px[0, 1].tobytes()        # pass 6 (x=1,y=0)
                + b"\x00" + px[1].tobytes())          # pass 7 (row y=1)
        d = decode_png(_make_png(2, 2, 8, 2, raws, interlace=1))
        assert np.array_equal(d["pixels"], px)


class TestPngRobustness:
    def test_not_png(self):
        with pytest.raises(ValueError):
            decode_png(b"BMnope")

    def test_truncated(self):
        payload = encode_png(_gradient(8, 8))
        with pytest.raises(ValueError):
            decode_png(payload[:30])

    def test_corrupt_idat(self):
        payload = bytearray(encode_png(_gradient(8, 8)))
        payload[50] ^= 0xFF
        with pytest.raises(ValueError):
            decode_png(bytes(payload))

    def test_zero_dim_zlib_bomb_rejected(self):
        """w==0 makes the expected raw size 0, and decompress(data, 0)
        means UNLIMITED output — so a zero-dim IHDR must be rejected
        BEFORE the inflate, or a zlib-bomb IDAT bypasses the cap."""
        bomb_raws = b"\x00" * (8 * 1024 * 1024)  # ~8 KB once deflated
        for w, h in ((0, 8), (8, 0), (0, 0)):
            with pytest.raises(ValueError, match="zero dimension"):
                decode_png(_make_png(w, h, 8, 2, bomb_raws))


class TestPngExternalFixtures:
    """Real libpng-encoded files from the OS image."""

    def test_decode_system_pngs(self):
        # every 80th of the ~4.9k OS PNGs (a full sweep decoded 4903/4903
        # when this was written; the stride keeps the test fast while
        # still crossing many encoders/filter mixes/depths)
        paths = sorted(glob.glob("/usr/share/**/*.png", recursive=True))
        if not paths:
            pytest.skip("no system PNGs present")
        sample = paths[::80] or paths[:1]
        for p in sample:
            d = decode_png(open(p, "rb").read())
            assert d["width"] > 0 and d["height"] > 0
            assert d["pixels"].shape == (d["height"], d["width"], 3)


class TestPngMultimodalWiring:
    def test_sniff_and_meta(self):
        px = _gradient(4, 6, seed=9)
        payload = encode_png(px)
        assert mm.sniff_format(payload) == "png"
        meta = mm.real_decode_meta(payload)
        assert (meta["width"], meta["height"]) == (6, 4)
        import hashlib
        assert meta["pixel_sha1"] == hashlib.sha1(
            px.tobytes()).hexdigest()[:16]

    def test_real_resize_png(self):
        px = _gradient(8, 8, seed=11)
        stage = mm.ResizeStage(target_w=4, target_h=4, real_decode=True)
        d = mm.decode_bmp(stage._real_resize(encode_png(px)))
        assert np.array_equal(d["pixels"], px[::2, ::2])
