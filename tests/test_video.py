"""Video codec goldens (functions/video.py): Y4M and AVI round-trips,
BT.601 color math, and the multimodal wiring (real_decode_meta /
FrameSampleStage over video payloads).

Raw containers (Y4M, DIB-AVI) must round-trip bit-exactly; MJPEG-AVI
frames must match jpeg.expected_decode bit-for-bit (the entropy layer
is lossless, see tests/test_jpeg.py)."""

import hashlib

import numpy as np
import pytest

from news_crawler_ray.functions import multimodal as mm
from news_crawler_ray.functions import video as vd
from news_crawler_ray.functions.jpeg import expected_decode


def _rgb_frames(n, h, w, seed=0):
    rng = np.random.RandomState(17 + seed)
    return [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).astype(
        np.uint8) for _ in range(n)]


def _yuv_frames(n, h, w, cs):
    rng = np.random.RandomState(29)
    out = []
    for _ in range(n):
        y = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        if cs == "Cmono":
            out.append((y, None, None))
            continue
        sx, sy = vd._Y4M_CS[cs]
        u = rng.randint(0, 256, size=(h >> sy, w >> sx)).astype(np.uint8)
        v = rng.randint(0, 256, size=(h >> sy, w >> sx)).astype(np.uint8)
        out.append((y, u, v))
    return out


class TestColorMath:
    def test_bt601_anchors(self):
        # limited-range anchors: Y=16 black, Y=235 white, neutral chroma
        y = np.array([[16, 235]], np.uint8)
        u = v = np.full((1, 2), 128, np.uint8)
        rgb = vd.yuv_to_rgb(y, u, v)
        assert rgb[0, 0].tolist() == [0, 0, 0]
        assert rgb[0, 1].tolist() == [255, 255, 255]

    def test_rgb_yuv_rgb_close(self):
        # 4:2:0 is lossy (chroma box filter + rounding) but flat-color
        # regions must come back within quantization distance
        px = np.zeros((4, 4, 3), np.uint8)
        px[:, :] = (200, 40, 90)
        y, u, v = vd.rgb_to_yuv420(px)
        back = vd.yuv_to_rgb(y, u, v)
        assert np.abs(back.astype(int) - px.astype(int)).max() <= 3

    def test_yuv420_plane_shapes(self):
        y, u, v = vd.rgb_to_yuv420(np.zeros((6, 8, 3), np.uint8))
        assert y.shape == (6, 8) and u.shape == (3, 4) and v.shape == (3, 4)


class TestY4M:
    @pytest.mark.parametrize("cs", ["C420", "C420jpeg", "C422", "C444",
                                    "Cmono"])
    def test_roundtrip_bit_exact(self, cs):
        frames = _yuv_frames(3, 8, 12, cs)
        payload = vd.encode_y4m(frames, 12, 8, fps=(30000, 1001),
                                colorspace=cs)
        meta = vd.decode_y4m(payload)
        assert (meta["width"], meta["height"]) == (12, 8)
        assert (meta["fps_num"], meta["fps_den"]) == (30000, 1001)
        assert meta["n_frames"] == 3 and meta["colorspace"] == cs
        got = list(vd.y4m_frames(payload))
        assert len(got) == 3
        for fr, (y, u, v) in zip(got, frames):
            assert np.array_equal(fr["y"], y)
            if cs == "Cmono":
                assert fr["u"] is None and np.array_equal(
                    fr["rgb"][..., 0], y)
            else:
                assert np.array_equal(fr["u"], u)
                assert np.array_equal(fr["v"], v)
                assert np.array_equal(fr["rgb"], vd.yuv_to_rgb(y, u, v))

    def test_truncated_raises(self):
        payload = vd.encode_y4m(_yuv_frames(2, 4, 4, "C420"), 4, 4)
        with pytest.raises(ValueError):
            vd.decode_y4m(payload[:-5])
        with pytest.raises(ValueError):
            vd.decode_y4m(b"NOT A STREAM\n")


class TestAVI:
    def test_dib_roundtrip_bit_exact(self):
        frames = _rgb_frames(4, 6, 10)
        payload = vd.encode_avi(frames, codec="DIB ", fps=(15, 1))
        meta = vd.decode_avi(payload)
        assert (meta["width"], meta["height"]) == (10, 6)
        assert meta["n_frames"] == 4 and meta["n_frames_movi"] == 4
        assert (meta["fps_num"], meta["fps_den"]) == (15, 1)
        assert meta["has_index"]
        got = list(vd.avi_frames(payload))
        assert len(got) == 4
        for fr, px in zip(got, frames):
            assert np.array_equal(fr["rgb"], px)

    @pytest.mark.parametrize("subsample", [False, True])
    def test_mjpg_matches_expected_decode(self, subsample):
        frames = _rgb_frames(3, 16, 16, seed=3)
        payload = vd.encode_avi(frames, codec="MJPG", subsample=subsample)
        meta = vd.decode_avi(payload)
        assert meta["codec"].startswith("MJPG")
        got = list(vd.avi_frames(payload))
        assert len(got) == 3
        for fr, px in zip(got, frames):
            # entropy layer lossless → decoder must reproduce the
            # mathematical expectation bit-for-bit (tests/test_jpeg.py)
            assert np.array_equal(
                fr["rgb"], expected_decode(px, subsample=subsample))

    def test_odd_width_dib_row_padding(self):
        frames = _rgb_frames(2, 3, 5)   # 15-byte rows pad to 16
        payload = vd.encode_avi(frames, codec="DIB ")
        for fr, px in zip(vd.avi_frames(payload), frames):
            assert np.array_equal(fr["rgb"], px)

    def test_not_avi_raises(self):
        with pytest.raises(ValueError):
            vd.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")


class TestMultimodalWiring:
    def test_sniff(self):
        avi = vd.encode_avi(_rgb_frames(1, 4, 4), codec="DIB ")
        y4m = vd.encode_y4m(_yuv_frames(1, 4, 4, "C420"), 4, 4)
        assert mm.sniff_format(avi) == "avi"
        assert mm.sniff_format(y4m) == "y4m"

    def test_real_decode_meta_video(self):
        frames = _rgb_frames(5, 8, 8, seed=7)
        avi = vd.encode_avi(frames, codec="DIB ", fps=(24, 1))
        m = mm.real_decode_meta(avi)
        assert (m["width"], m["height"], m["n_frames"]) == (8, 8, 5)
        assert m["sample_rate"] == 24
        assert m["pixel_sha1"] == hashlib.sha1(
            frames[0].tobytes()).hexdigest()[:16]

        yuv = _yuv_frames(4, 8, 8, "C444")
        y4m = vd.encode_y4m(yuv, 8, 8, fps=(50, 2), colorspace="C444")
        m = mm.real_decode_meta(y4m)
        assert (m["width"], m["height"], m["n_frames"]) == (8, 8, 4)
        assert m["sample_rate"] == 25
        first_rgb = vd.yuv_to_rgb(*yuv[0])
        assert m["pixel_sha1"] == hashlib.sha1(
            first_rgb.tobytes()).hexdigest()[:16]

    def test_frame_sample_stage_real_video(self):
        frames = _rgb_frames(7, 4, 6, seed=11)
        avi = vd.encode_avi(frames, codec="DIB ")
        stage = mm.FrameSampleStage(every_k=3, real_decode=True)
        rows = list(stage._rows(avi))
        assert [f for f, _ in rows] == [0, 3, 6]
        for f, hh in rows:
            assert hh == hashlib.sha1(
                frames[f].tobytes()).hexdigest()[:16]

        y4m = vd.encode_y4m(_yuv_frames(5, 4, 4, "C420"), 4, 4)
        rows = list(mm.FrameSampleStage(
            every_k=2, real_decode=True)._rows(y4m))
        assert [f for f, _ in rows] == [0, 2, 4]
