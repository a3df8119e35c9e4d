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


def test_valid_payloads_still_decode():
    # the guard must not swallow the happy path
    for name, build, fns in CODECS:
        payload = build()
        for fn in fns:
            assert fn(payload) is not None, name
