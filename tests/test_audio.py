"""WAV encoder round-trip and AudioStatsStage goldens
(functions/multimodal.py): encode_wav is a raw container, so
decode(encode(x)) must be bit-exact; the stats stage must compute
peak/RMS/duration from the actual decoded samples."""

import hashlib
import math

import numpy as np
import pyarrow as pa

from news_crawler_ray.functions import multimodal as mm


def _sine(n=1600, sr=8000, freq=440.0, amp=0.5, channels=1):
    t = np.arange(n) / sr
    mono = np.clip(np.round(amp * np.sin(2 * np.pi * freq * t) * 32767),
                   -32768, 32767).astype(np.int16)
    return np.stack([mono] * channels, axis=1)


class TestEncodeWav:
    def test_roundtrip_bit_exact(self):
        for ch in (1, 2):
            s = _sine(channels=ch)
            d = mm.decode_wav(mm.encode_wav(s, 8000))
            assert d["sample_rate"] == 8000
            assert d["n_channels"] == ch
            assert d["bits_per_sample"] == 16
            assert np.array_equal(d["samples"], s)

    def test_mono_1d_input(self):
        s = _sine()[:, 0]
        d = mm.decode_wav(mm.encode_wav(s, 16000))
        assert d["n_channels"] == 1 and np.array_equal(
            d["samples"][:, 0], s)

    def test_sniffs_as_wav(self):
        assert mm.sniff_format(mm.encode_wav(_sine())) == "wav"


class TestAudioStatsStage:
    def test_real_stats(self):
        s = _sine(n=8000, amp=0.5)   # full second of 0.5-amp sine
        payload = mm.encode_wav(s, 8000)
        batch = pa.table({
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([payload], pa.binary()),
            "media_type": pa.array(["audio"], pa.string()),
            "mime": pa.array(["audio/wav"], pa.string())})
        out = mm.AudioStatsStage()(batch).to_pydict()
        assert out["media_id"] == [7]
        assert out["sample_rate"] == [8000]
        assert out["duration_ms"] == [1000]
        # sine RMS = amp/sqrt(2): 0.5/1.414 ≈ 0.354 → 354 ± rounding
        assert abs(out["rms_milli"][0] - round(0.5 / math.sqrt(2) * 1000)) <= 2
        assert abs(out["peak"][0] - round(0.5 * 32767)) <= 1
        assert out["sample_sha1"] == [
            hashlib.sha1(s.tobytes()).hexdigest()[:16]]

    def test_silence(self):
        payload = mm.encode_wav(np.zeros(100, np.int16), 8000)
        out = mm.AudioStatsStage()(pa.table({
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([payload], pa.binary()),
            "media_type": pa.array(["audio"], pa.string()),
            "mime": pa.array(["audio/wav"], pa.string())})).to_pydict()
        assert out["peak"] == [0] and out["rms_milli"] == [0]
        assert out["duration_ms"] == [12]   # 100/8000 s → 12 ms floor


class TestAuAiff:
    """functions/audio.py: Sun AU (G.711 µ-law/A-law + PCM) and AIFF.

    The G.711 tables are pinned bidirectionally against stdlib
    audioop (the CPython port of the public-domain Sun g711.c) over
    the FULL domain — all 256 codes expand and all 65536 int16 values
    compress identically."""

    def test_g711_matches_audioop_full_domain(self):
        import audioop

        from news_crawler_ray.functions import audio as aud
        s = np.arange(-32768, 32768, dtype=np.int16)
        raw = s.astype("<i2").tobytes()
        assert np.array_equal(
            aud.linear_to_ulaw(s),
            np.frombuffer(audioop.lin2ulaw(raw, 2), np.uint8))
        assert np.array_equal(
            aud.linear_to_alaw(s),
            np.frombuffer(audioop.lin2alaw(raw, 2), np.uint8))
        codes = bytes(range(256))
        assert np.array_equal(
            aud.ulaw_expand_table(),
            np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2"))
        assert np.array_equal(
            aud.alaw_expand_table(),
            np.frombuffer(audioop.alaw2lin(codes, 2), "<i2"))

    def test_g711_code_domain_identity(self):
        # compress(expand(code)) == code for every byte — except the
        # canonical µ-law two-codes-for-zero collapse 0x7F -> 0xFF
        from news_crawler_ray.functions import audio as aud
        codes = np.arange(256, dtype=np.uint8)
        back_u = aud.linear_to_ulaw(aud.ulaw_expand_table()[codes])
        assert (back_u == codes).sum() == 255
        assert back_u[0x7F] == 0xFF and aud.ulaw_expand_table()[0x7F] == 0
        back_a = aud.linear_to_alaw(aud.alaw_expand_table()[codes])
        assert np.array_equal(back_a, codes)

    def test_au_pcm16_roundtrip_bit_exact(self):
        from news_crawler_ray.functions import audio as aud
        for ch in (1, 2):
            s = _sine(channels=ch)
            d = aud.decode_au(aud.encode_au(s, 11025, encoding="pcm16"))
            assert d["sample_rate"] == 11025 and d["n_channels"] == ch
            assert d["encoding"] == "pcm16"
            assert np.array_equal(d["samples"], s)

    def test_au_companded_matches_audioop_pipeline(self):
        import audioop

        from news_crawler_ray.functions import audio as aud
        s = _sine(amp=0.9)
        for enc, comp, exp in (("ulaw", audioop.lin2ulaw,
                                audioop.ulaw2lin),
                               ("alaw", audioop.lin2alaw,
                                audioop.alaw2lin)):
            d = aud.decode_au(aud.encode_au(s, 8000, encoding=enc))
            ref = np.frombuffer(
                exp(comp(s[:, 0].astype("<i2").tobytes(), 2), 2), "<i2")
            assert np.array_equal(d["samples"][:, 0], ref)

    def test_aiff_roundtrip_bit_exact(self):
        from news_crawler_ray.functions import audio as aud
        s = _sine(channels=2)
        d = aud.decode_aiff(aud.encode_aiff(s, 44100))
        assert d["sample_rate"] == 44100 and d["n_channels"] == 2
        assert np.array_equal(d["samples"], s)

    def test_garbage_raises(self):
        import pytest

        from news_crawler_ray.functions import audio as aud
        for bad in (b"", b".sndXX", b"FORM\x00\x00\x00\x04WAVE"):
            with pytest.raises(ValueError):
                aud.decode_au(bad)
            with pytest.raises(ValueError):
                aud.decode_aiff(bad)

    def test_sniff_and_stage_dispatch(self):
        from news_crawler_ray.functions import audio as aud
        s = _sine()
        au_p = aud.encode_au(s, 8000, encoding="ulaw")
        aiff_p = aud.encode_aiff(s, 8000)
        assert mm.sniff_format(au_p) == "au"
        assert mm.sniff_format(aiff_p) == "aiff"
        batch = pa.table({
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([mm.encode_wav(s), au_p, aiff_p],
                                pa.binary())})
        out = mm.AudioStatsStage()(batch)
        assert out["sample_rate"].to_pylist() == [8000] * 3
        # wav and aiff decode identical PCM; the µ-law row differs by
        # companding loss but keeps the same duration
        assert out["duration_ms"].to_pylist() == [200] * 3
        assert out["sample_sha1"][0] == out["sample_sha1"][2]
        assert out["sample_sha1"][1] != out["sample_sha1"][0]
        # real_decode_meta routes audio kinds through the same decoders
        m = mm.real_decode_meta(au_p)
        assert m["sample_rate"] == 8000 and m["n_frames"] == 1600
