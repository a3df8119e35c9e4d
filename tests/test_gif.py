"""GIF decoder conformance (functions/gif.py).

GIF's LZW layer is lossless over palette indices, so
decode(encode(indices, palette)) recovers the exact index array.
System .gif files (if any ship with the OS image) are decoded as
external fixtures.
"""

from __future__ import annotations

import glob

import numpy as np
import pytest

from news_crawler_ray.functions import multimodal as mm
from news_crawler_ray.functions.gif import decode_gif, encode_gif, frames


def _indices(h, w, n_colors, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, n_colors, (h, w)).astype(np.uint8)


def _palette(n):
    return np.stack([np.arange(n) * 7 % 256,
                     np.arange(n) * 31 % 256,
                     np.arange(n) * 13 % 256], axis=-1).astype(np.uint8)


class TestGifRoundTrip:
    @pytest.mark.parametrize("h,w,nc", [(1, 1, 2), (5, 7, 4), (16, 16, 16),
                                        (23, 31, 120), (40, 40, 256)])
    def test_lossless_index_roundtrip(self, h, w, nc):
        idx = _indices(h, w, nc, seed=h * w)
        pal = _palette(nc)
        d = decode_gif(encode_gif([idx], pal))
        assert (d["width"], d["height"]) == (w, h)
        assert d["n_frames"] == 1
        assert np.array_equal(d["pixels"], pal[idx])   # exact

    def test_animated_frame_count_and_frames(self):
        pal = _palette(8)
        frs = [_indices(6, 9, 8, seed=i) for i in range(5)]
        payload = encode_gif(frs, pal)
        d = decode_gif(payload)
        assert d["n_frames"] == 5
        assert np.array_equal(d["pixels"], pal[frs[0]])
        got = [fr["indices"] for fr in frames(payload)]
        assert len(got) == 5
        for a, b in zip(got, frs):
            assert np.array_equal(a, b)


class TestGifRobustness:
    def test_not_gif(self):
        with pytest.raises(ValueError):
            decode_gif(b"PNGnope")

    def test_truncated(self):
        payload = encode_gif([_indices(8, 8, 4)], _palette(4))
        with pytest.raises(ValueError):
            decode_gif(payload[:20])


class TestGifExternalFixtures:
    def test_decode_system_gifs(self):
        paths = sorted(glob.glob("/usr/share/**/*.gif", recursive=True))[:20]
        if not paths:
            pytest.skip("no system GIFs present")
        for p in paths:
            d = decode_gif(open(p, "rb").read())
            assert d["width"] > 0 and d["height"] > 0
            assert d["pixels"].shape == (d["height"], d["width"], 3)
            assert d["n_frames"] >= 1


class TestGifMultimodalWiring:
    def test_sniff_meta_real_frame_count(self):
        pal = _palette(4)
        frs = [_indices(4, 6, 4, seed=i) for i in range(3)]
        payload = encode_gif(frs, pal)
        assert mm.sniff_format(payload) == "gif"
        meta = mm.real_decode_meta(payload)
        assert (meta["width"], meta["height"]) == (6, 4)
        assert meta["n_frames"] == 3        # REAL animation frame count

    def test_real_frame_sampling(self):
        import hashlib
        pal = _palette(4)
        frs = [_indices(4, 4, 4, seed=i) for i in range(7)]
        stage = mm.FrameSampleStage(every_k=3, real_decode=True)
        rows = list(stage._rows(encode_gif(frs, pal)))
        assert [f for f, _ in rows] == [0, 3, 6]
        assert rows[1][1] == hashlib.sha1(
            frs[3].tobytes()).hexdigest()[:16]
        # mp4 is a real format now (functions/mp4.py): a bogus ftyp
        # payload fails the container parse loudly; a format with no
        # codec at all still raises NotImplementedError
        with pytest.raises(ValueError):
            list(stage._rows(b"\x00\x00\x00\x18ftypmp42xx"))
        with pytest.raises(NotImplementedError):
            list(stage._rows(b"OggS" + b"\x00" * 24))
