"""Audio multimodal branch: WAV codec roundtrip + analytic feature ground
truth (a sine's RMS is A/√2, its ZCR is 2f/sr) + the actor-pool pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from legislation_scraper_ray.sources.wav import decode_wav, encode_wav
from legislation_scraper_ray.stages.audio import AudioFeatureActor, AudioResampleActor


def _sine(freq: float, sr: int = 16_000, dur_ms: int = 100, amp: float = 0.5):
    t = np.arange(sr * dur_ms // 1000, dtype=np.float64) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def test_wav_roundtrip_mono_and_stereo():
    x = _sine(440.0)
    blob = encode_wav(x, 16_000)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    samples, sr = decode_wav(blob)
    assert sr == 16_000 and samples.shape == (len(x), 1)
    assert np.allclose(samples[:, 0] / 32767.0, x, atol=1 / 32767.0)

    st = np.stack([_sine(220.0), _sine(330.0)], axis=1)
    s2, sr2 = decode_wav(encode_wav(st, 8_000))
    assert sr2 == 8_000 and s2.shape == st.shape
    assert np.allclose(s2 / 32767.0, st, atol=1 / 32767.0)


def test_wav_rejects_non_pcm16():
    blob = bytearray(encode_wav(_sine(100.0), 16_000))
    blob[20:22] = (3).to_bytes(2, "little")  # fmt_tag 3 = IEEE float
    with pytest.raises(NotImplementedError, match="PCM16"):
        decode_wav(bytes(blob))


def test_audio_feature_actor_analytic():
    freqs = [100.0, 440.0, 1000.0]
    sr = 16_000
    batch = pa.table({
        "clip_id": pa.array(range(len(freqs)), pa.int64()),
        "bytes": pa.array([encode_wav(_sine(f, sr=sr), sr) for f in freqs],
                          pa.binary()),
    })
    out = AudioFeatureActor()(batch).to_pandas()
    assert np.allclose(out["duration_ms"], 100.0)
    assert np.allclose(out["rms"], 0.5 / np.sqrt(2), atol=2e-3)
    for f, zcr in zip(freqs, out["zcr"]):
        assert abs(zcr - 2 * f / sr) < 2.5 / (sr * 0.1), f  # ±2 crossings
    assert np.all(out["peak"] <= 0.5 + 1e-3) and np.all(out["peak"] > 0.45)


def test_audio_feature_actor_null_and_empty():
    batch = pa.table({
        "clip_id": pa.array([0, 1], pa.int64()),
        "bytes": pa.array([None, encode_wav(np.zeros(0), 16_000)], pa.binary()),
    })
    out = AudioFeatureActor()(batch).to_pandas()
    assert np.isnan(out.loc[0, "rms"])
    assert out.loc[1, "duration_ms"] == 0.0 and out.loc[1, "rms"] == 0.0


def test_audio_resample_preserves_rms():
    blob = encode_wav(_sine(200.0, sr=16_000), 16_000)
    batch = pa.table({"bytes": pa.array([blob], pa.binary())})
    out = AudioResampleActor(target_rate=8_000)(batch)
    samples, sr = decode_wav(out["bytes"][0].as_py())
    assert sr == 8_000
    assert abs(len(samples) - 800) <= 1  # 100 ms at 8 kHz
    rms = np.sqrt(np.mean((samples[:, 0] / 32767.0) ** 2))
    assert abs(rms - 0.5 / np.sqrt(2)) < 5e-3


def test_audio_features_query(ray_session):
    """End-to-end actor-pool run over the sf0.001 documents table: every
    clip's RMS is the sine's A/√2 and its ZCR tracks its planted frequency."""
    from legislation_scraper_ray.pipelines.queries import audio_features

    out = audio_features("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500  # sf0.001 documents rows
    assert np.allclose(out["duration_ms"], 80.0)
    assert np.allclose(out["rms"], 0.5 / np.sqrt(2), atol=3e-3)
    want_zcr = 2 * out["freq_hz"].to_numpy() / 16_000
    assert np.allclose(out["zcr"], want_zcr, atol=2.5 / (16_000 * 0.08))
