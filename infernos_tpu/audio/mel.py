"""Whisper-compatible log-mel spectrogram frontend.

Capability parity: the reference extracts mel features on the host via the HF
``WhisperProcessor`` before handing them to ctranslate2
(``Cluster/InfernSTTWorker.py:109-123``).

TPU-first design: the whole frontend -- framing, Hann window, rFFT, Slaney
mel filterbank matmul, log compression -- is a single jittable function
batched over ``[B, T]`` waveforms, so STT feature extraction runs on-device
fused with the encoder (no host round-trip).  Numerics match
``transformers.WhisperFeatureExtractor`` (n_fft=400, hop=160, Slaney-norm
mel banks, log10 with 8-dB dynamic-range floor then (x+4)/4 scaling).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160


def _hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    mel = 3.0 * f / 200.0
    log_region = f >= 1000.0
    logstep = np.log(6.4) / 27.0
    mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / logstep, mel)
    return mel


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f = 200.0 * m / 3.0
    logstep = np.log(6.4) / 27.0
    f = np.where(m >= 15.0, 1000.0 * np.exp(logstep * (m - 15.0)), f)
    return f


@lru_cache(maxsize=8)
def mel_filterbank(n_mels: int = 128, n_fft: int = N_FFT, sr: int = SAMPLE_RATE,
                   fmin: float = 0.0, fmax: float = 8000.0) -> np.ndarray:
    """[n_mels, n_fft//2+1] Slaney-normalized triangular filterbank."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


@lru_cache(maxsize=2)
def _hann(n_fft: int = N_FFT) -> np.ndarray:
    # Periodic Hann (torch.hann_window default), as used by Whisper.
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)).astype(np.float32)


def log_mel_jax(wav, n_mels: int = 128):
    """``[B, T]`` float32 @16 kHz -> ``[B, n_mels, T//HOP]`` log-mel, jittable.

    Matches WhisperFeatureExtractor: reflect-pad n_fft//2, drop the last STFT
    frame, per-sample (not per-batch) dynamic-range floor and (x+4)/4 scale.
    """
    import jax.numpy as jnp

    window = jnp.asarray(_hann())
    fb = jnp.asarray(mel_filterbank(n_mels))
    pad = N_FFT // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    B, T = x.shape
    n_frames = 1 + (T - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[:, idx] * window[None, None, :]  # [B, F, N_FFT]
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.abs(spec) ** 2  # [B, F, N_FFT//2+1]
    power = power[:, :-1, :]  # Whisper drops the final frame
    mel = jnp.einsum("mf,btf->bmt", fb, power)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    return (log_spec + 4.0) / 4.0


def log_mel_np(wav: np.ndarray, n_mels: int = 128) -> np.ndarray:
    """Host/numpy reference of :func:`log_mel_jax` for tests and tools."""
    if wav.ndim == 1:
        wav = wav[None, :]
    window = _hann()
    fb = mel_filterbank(n_mels)
    pad = N_FFT // 2
    x = np.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[:, idx] * window[None, None, :]
    spec = np.fft.rfft(frames, axis=-1)
    power = (np.abs(spec) ** 2)[:, :-1, :]
    mel = np.einsum("mf,btf->bmt", fb, power)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    floor = log_spec.max(axis=(1, 2), keepdims=True) - 8.0
    log_spec = np.maximum(log_spec, floor)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)
