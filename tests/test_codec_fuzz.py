"""Codec corruption fuzz (functions/codecguard.py contract): every
pure-python media decoder, fed a truncated or byte-flipped mutation of
a valid payload — or arbitrary junk — must either return a result or
raise ValueError / NotImplementedError. Nothing else: no struct.error,
IndexError, KeyError, zlib.error leaking to the pipeline stage, and no
hang. At crawl scale every payload is untrusted bytes."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from news_crawler_ray.functions import audio as aud
from news_crawler_ray.functions import multimodal as mm
from news_crawler_ray.functions import video as vd
from news_crawler_ray.functions.gif import decode_gif
from news_crawler_ray.functions.gif import frames as gif_frames
from news_crawler_ray.functions.jpeg import decode_jpeg
from news_crawler_ray.functions.mp4 import decode_mp4, encode_mp4, mp4_frames
from news_crawler_ray.functions.png import decode_png, encode_png

OK_ERRORS = (ValueError, NotImplementedError)


def _px(h=8, w=8):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 7) % 256, (xx * 13) % 256, (yy + xx) % 256],
                    axis=-1).astype(np.uint8)


def _gif_payload():
    from news_crawler_ray.functions.gif import encode_gif
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx = (np.arange(64, dtype=np.uint8) % 4).reshape(8, 8)
    return encode_gif([idx, idx.T.copy()], pal)


# (name, valid payload, decode callables) — frame generators are fully
# drained so mid-iteration corruption is exercised too
def _consume(fn):
    return lambda p: list(fn(p))


CODECS = [
    ("bmp", lambda: mm.encode_bmp(_px()), [mm.decode_bmp]),
    ("ppm", lambda: b"P6\n8 8\n255\n" + _px().tobytes(), [mm.decode_ppm]),
    ("wav", lambda: mm.encode_wav(
        np.arange(-500, 500, dtype=np.int16)[:, None]), [mm.decode_wav]),
    ("au", lambda: aud.encode_au(
        np.arange(-500, 500, dtype=np.int16), encoding="ulaw"),
     [aud.decode_au]),
    ("aiff", lambda: aud.encode_aiff(
        np.arange(-500, 500, dtype=np.int16)), [aud.decode_aiff]),
    ("jpeg", lambda: __import__(
        "news_crawler_ray.functions.jpeg", fromlist=["encode_jpeg"]
    ).encode_jpeg(_px(16, 16)), [decode_jpeg]),
    ("png", lambda: encode_png(_px()), [decode_png]),
    ("gif", _gif_payload, [decode_gif, _consume(gif_frames)]),
    ("avi", lambda: vd.encode_avi([_px(), _px()], codec="DIB "),
     [vd.decode_avi, _consume(vd.avi_frames)]),
    ("y4m", lambda: vd.encode_y4m(
        [vd.rgb_to_yuv420(_px())], 8, 8), [vd.decode_y4m,
                                           _consume(vd.y4m_frames)]),
    ("mp4", lambda: encode_mp4([_px(16, 16)]), [decode_mp4,
                                                _consume(mp4_frames)]),
]
_BY_NAME = {name: (build, fns) for name, build, fns in CODECS}


@pytest.mark.parametrize("name", [c[0] for c in CODECS])
class TestCodecFuzz:
    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def test_truncation_typed(self, name, data):
        build, fns = _BY_NAME[name]
        payload = build()
        cut = data.draw(st.integers(0, len(payload) - 1))
        for fn in fns:
            try:
                fn(payload[:cut])
            except OK_ERRORS:
                pass

    @settings(max_examples=60, deadline=None)
    @given(data=st.data())
    def test_byteflip_typed(self, name, data):
        build, fns = _BY_NAME[name]
        payload = bytearray(build())
        for _ in range(data.draw(st.integers(1, 4))):
            i = data.draw(st.integers(0, len(payload) - 1))
            payload[i] = data.draw(st.integers(0, 255))
        for fn in fns:
            try:
                fn(bytes(payload))
            except OK_ERRORS:
                pass

    @settings(max_examples=30, deadline=None)
    @given(junk=st.binary(max_size=200))
    def test_junk_typed(self, name, junk):
        _, fns = _BY_NAME[name]
        for fn in fns:
            try:
                fn(junk)
            except OK_ERRORS:
                pass


class TestDecompressionBombs:
    """Crafted payloads where a header field demands allocation (or a
    decode loop) wildly beyond the payload size. Each must fail TYPED
    and fast — found live when a hypothesis byteflip drove the GIF LZW
    table to 2^60 entries (67 GB RSS before the suite was killed).
    Deterministic here so the guard never again depends on fuzz luck."""

    def test_gif_lzw_min_code_size(self):
        p = bytearray(_gif_payload())
        mcs_at = p.index(0x2C) + 10        # descriptor + 9-byte header
        assert p[mcs_at] == 2
        p[mcs_at] = 60                     # table would be 2^60 entries
        with pytest.raises(ValueError, match="min code size"):
            decode_gif(bytes(p))

    def test_gif_giant_frame_dims(self):
        p = bytearray(_gif_payload())
        desc = p.index(0x2C)
        p[desc + 5: desc + 9] = b"\xff\xff\xff\xff"   # w = h = 65535
        with pytest.raises(ValueError, match="decode cap"):
            decode_gif(bytes(p))

    def test_png_giant_dims(self):
        p = bytearray(encode_png(_px()))
        ihdr = p.index(b"IHDR") + 4
        p[ihdr: ihdr + 8] = (65535).to_bytes(4, "big") * 2
        with pytest.raises(ValueError, match="decode cap"):
            decode_png(bytes(p))

    def test_png_overlong_idat_bounded(self):
        # a zlib stream inflating far beyond what the dims require must
        # not be inflated past the expected raw size (bomb containment);
        # the in-bounds prefix still decodes
        import struct as st
        import zlib
        w = h = 8
        raw = b"".join(b"\x00" + bytes(w * 3) for _ in range(h))
        idat = zlib.compress(raw + b"\x00" * 50_000_000)

        def chunk(t, d):
            return (st.pack(">I", len(d)) + t + d
                    + st.pack(">I", zlib.crc32(t + d)))

        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
        out = decode_png(png)
        assert out["width"] == w and out["height"] == h

    def test_jpeg_giant_dims(self):
        build, _ = _BY_NAME["jpeg"]
        p = bytearray(build())
        sof = p.index(b"\xff\xc0") + 5     # marker + length + precision
        p[sof: sof + 4] = b"\xff\xff\xff\xff"
        with pytest.raises(ValueError, match="decode cap"):
            decode_jpeg(bytes(p))

    def test_mp4_stsz_fixed_count(self):
        p = bytearray(encode_mp4([_px(16, 16)]))
        stsz = p.index(b"stsz") + 8        # type + version/flags
        # fixed=1, count=2^32-1 → a 34 GB [1]*count list without guard
        p[stsz: stsz + 8] = (1).to_bytes(4, "big") + b"\xff\xff\xff\xff"
        with pytest.raises(ValueError, match="sample count"):
            decode_mp4(bytes(p))


def test_valid_payloads_still_decode():
    # the guard must not swallow the happy path
    for name, build, fns in CODECS:
        payload = build()
        for fn in fns:
            assert fn(payload) is not None, name
