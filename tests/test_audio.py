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
