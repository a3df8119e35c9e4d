"""Baseline JPEG codec conformance (functions/jpeg.py).

The entropy layer (Huffman, zigzag, byte stuffing, restart markers) is
LOSSLESS, so decode(encode(px)) must equal ``expected_decode(px)`` —
the dequantize+IDCT+upsample+color math applied directly to the
encoder's quantized coefficients — BIT-FOR-BIT. The transform
constants are shared (public T.81/Annex-K tables); the decoder's
bitstream path is fully independent code, which is what these tests
pin. Real progressive files from the OS image set are pinned
separately as external fixtures where supported.
"""

from __future__ import annotations

import numpy as np
import pytest

from news_crawler_ray.functions import multimodal as mm
from news_crawler_ray.functions.jpeg import (decode_jpeg, encode_jpeg,
                                             expected_decode)


def _gradient(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack([(yy * 255 // max(1, h - 1)),
                   (xx * 255 // max(1, w - 1)),
                   ((yy + xx) * 255 // max(1, h + w - 2))], axis=-1)
    return np.clip(px + rng.randint(-12, 13, px.shape), 0, 255) \
        .astype(np.uint8)


class TestJpegRoundTrip:
    @pytest.mark.parametrize("h,w", [(8, 8), (16, 16), (24, 17),
                                     (13, 29), (33, 31), (1, 1), (3, 66)])
    @pytest.mark.parametrize("subsample", [False, True])
    def test_bitexact_vs_expected(self, h, w, subsample):
        px = _gradient(h, w, seed=h * 100 + w)
        payload = encode_jpeg(px, subsample=subsample)
        d = decode_jpeg(payload)
        assert (d["width"], d["height"]) == (w, h)
        assert np.array_equal(d["pixels"], expected_decode(
            px, subsample=subsample))

    def test_restart_markers(self):
        px = _gradient(33, 31, seed=5)
        for rst in (1, 3, 7):
            payload = encode_jpeg(px, subsample=True, restart_interval=rst)
            assert b"\xff\xdd" in payload          # DRI present
            d = decode_jpeg(payload)
            assert np.array_equal(d["pixels"],
                                  expected_decode(px, subsample=True))

    def test_lossy_error_is_sane(self):
        # quality-50 Annex-K tables on a smooth gradient: small error
        px = _gradient(32, 32, seed=1)
        d = decode_jpeg(encode_jpeg(px))
        err = np.abs(d["pixels"].astype(int) - px.astype(int)).mean()
        assert err < 12.0, err

    def test_flat_color_compresses_and_survives(self):
        px = np.full((16, 24, 3), 200, dtype=np.uint8)
        payload = encode_jpeg(px, subsample=True)
        d = decode_jpeg(payload)
        assert np.array_equal(d["pixels"], expected_decode(
            px, subsample=True))
        # flat blocks are DC-only: tiny stream
        assert len(payload) < 900


class TestJpegRobustness:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"BMnotajpeg")

    def test_truncated_scan(self):
        payload = encode_jpeg(_gradient(16, 16))
        with pytest.raises(ValueError):
            decode_jpeg(payload[:len(payload) // 2])

    def test_lossless_rejected_loudly(self):
        # minimal stream with an SOF3 marker: must raise, not mis-decode
        bad = (b"\xff\xd8" + b"\xff\xc3" + (11).to_bytes(2, "big")
               + bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
        with pytest.raises(ValueError, match="SOF marker 0xFFC3"):
            decode_jpeg(bad)


_OS_JPEGS = "/usr/share/doc/nodejs"


class TestJpegProgressive:
    """External fixtures: real PROGRESSIVE (SOF2) files shipped with the
    OS image — multi-scan spectral selection + successive approximation
    over a decoder path our encoder cannot produce. The files are white
    stripes on white, so content is analytically checkable."""

    @pytest.mark.parametrize("name,w,h,mean_min,white_frac", [
        ("thin-white-stripe.jpg", 493, 58, 225.0, 0.80),
        ("full-white-stripe.jpg", 493, 312, 245.0, 0.95),
    ])
    def test_decode_real_progressive_file(self, name, w, h, mean_min,
                                          white_frac):
        import os
        path = os.path.join(_OS_JPEGS, name)
        if not os.path.exists(path):
            pytest.skip("OS fixture jpeg not present")
        d = decode_jpeg(open(path, "rb").read())
        assert (d["width"], d["height"]) == (w, h)
        px = d["pixels"]
        assert px.shape == (h, w, 3) and px.dtype == np.uint8
        # near-white imagery; a mis-decoded scan craters these
        assert float(px.mean()) > mean_min
        assert float((px.mean(axis=2) >= 245).mean()) > white_frac
        assert tuple(px[h // 2, w // 2]) == (255, 255, 255)


class TestJpegMultimodalWiring:
    def test_sniff_and_real_decode_meta(self):
        px = _gradient(9, 12, seed=2)
        payload = encode_jpeg(px)
        assert mm.sniff_format(payload) == "jpeg"
        meta = mm.real_decode_meta(payload)
        assert (meta["width"], meta["height"]) == (12, 9)
        import hashlib
        assert meta["pixel_sha1"] == hashlib.sha1(
            expected_decode(px).tobytes()).hexdigest()[:16]

    def test_real_resize_jpeg_to_bmp(self):
        px = _gradient(10, 10, seed=3)
        stage = mm.ResizeStage(target_w=5, target_h=5, real_decode=True)
        resized = stage._real_resize(encode_jpeg(px))
        d = mm.decode_bmp(resized)
        assert (d["width"], d["height"]) == (5, 5)
        assert np.array_equal(d["pixels"],
                              expected_decode(px)[::2, ::2])
