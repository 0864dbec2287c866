"""Resampler golden tests vs scipy and mel frontend tests vs transformers."""

import numpy as np
import pytest

from infernos_tpu.audio.resample import resample, resample_jax, out_len
from infernos_tpu.audio.mel import log_mel_np, log_mel_jax


def _sig(n, sr):
    t = np.arange(n) / sr
    rng = np.random.default_rng(42)
    return (
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)


@pytest.mark.parametrize("from_sr,to_sr", [(8000, 16000), (16000, 8000), (16000, 22050)])
def test_resample_matches_scipy(from_sr, to_sr):
    from scipy.signal import resample_poly

    x = _sig(from_sr // 2, from_sr)  # 0.5 s
    got = resample(x, from_sr, to_sr)
    want = resample_poly(x.astype(np.float64), to_sr, from_sr, window=("kaiser", 5.0))
    assert len(got) == out_len(len(x), from_sr, to_sr) == len(want)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("from_sr,to_sr", [(8000, 16000), (16000, 8000)])
def test_resample_jax_matches_host(from_sr, to_sr):
    x = np.stack([_sig(from_sr // 5, from_sr) for _ in range(3)])
    import jax

    got = np.asarray(jax.jit(lambda a: resample_jax(a, from_sr, to_sr))(x))
    want = np.stack([resample(r, from_sr, to_sr) for r in x])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_transformers(n_mels):
    from transformers import WhisperFeatureExtractor

    x = _sig(16000, 16000)  # 1 s
    fe = WhisperFeatureExtractor(feature_size=n_mels, padding_value=0.0)
    # Compare unpadded: feed exactly the samples, no 30 s padding
    want = fe(x, sampling_rate=16000, padding=False, return_tensors="np")[
        "input_features"
    ][0]
    got = log_mel_np(x, n_mels=n_mels)[0]
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_log_mel_jax_matches_np():
    import jax

    x = np.stack([_sig(8000, 16000), _sig(8000, 16000) * 0.3])
    got = np.asarray(jax.jit(lambda a: log_mel_jax(a, n_mels=80))(x))
    want = log_mel_np(x, n_mels=80)
    # float32 rFFT on device vs float64-accumulated numpy: ~1e-3 worst case
    np.testing.assert_allclose(got, want, atol=2e-3)
