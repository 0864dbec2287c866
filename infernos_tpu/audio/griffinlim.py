"""Griffin-Lim mel-inversion vocoder: deterministic, weight-free, jittable.

Why this exists: the reference always serves a *pretrained* HiFi-GAN
(``HelloSippyTTSRT/HelloSippyRTPipe.py:171-183``); under zero egress the
in-repo HiFi-GAN can only be trained GAN-less (multi-resolution STFT loss),
and that checkpoint destroys the formant detail the speechlang letter code
lives in -- measured copy-synthesis intelligibility 0.34 vs **0.97 for
Griffin-Lim** on the same mels (round-3 stage-isolation diagnostic).  So
the tiny-real serving mode vocodes with Griffin-Lim; the HiFi-GAN path
(``models/hifigan.py``) remains for ported real checkpoints.

TPU-first: the whole inversion -- mel pseudo-inverse, iterative STFT /
iSTFT phase projection, overlap-add -- is one jittable function with
static shapes.  The iteration count is fixed (``lax.scan``), framing is a
gather, overlap-add is a sum of ``n_fft // hop`` hop-strided shifts (no
scatter), and the OLA window normalization is precomputed host-side at
trace time.  Interface-compatible with ``hifigan.apply`` so the TTS engine
dispatches on config type: ``apply(params, cfg, logmel[B, T, M]) ->
waveform [B, T * hop]``.

The per-chunk streaming phase restart this implies is handled by the
engine's existing ``pre_frames`` mel context + the AmendmentNetwork1
boundary declicker (``models/amendnet.py``), same as for the neural
vocoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

from .mel import mel_filterbank


@dataclass(frozen=True)
class GriffinLimConfig:
    """Matches the tiny-TTS mel frontend (``tools/train_tiny_tts.mel80_np``):
    power spectrum -> mel -> log10, hop 256, win 1024 @ 16 kHz."""

    n_fft: int = 1024
    hop: int = 256
    n_mels: int = 80
    sample_rate: int = 16000
    fmax: float = 8000.0
    iters: int = 24
    model_in_dim: int = 80  # hifigan-interface parity (engine introspection)

    @property
    def total_upsample(self) -> int:
        return self.hop


def init_params(cfg: GriffinLimConfig) -> Dict[str, Any]:
    """Precompute the mel pseudo-inverse + window (the 'weights')."""
    fb = mel_filterbank(cfg.n_mels, cfg.n_fft, cfg.sample_rate,
                        fmax=cfg.fmax)  # [M, F]
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(cfg.n_fft)
                              / cfg.n_fft)).astype(np.float32)
    return {
        "fb_pinv": jnp.asarray(np.linalg.pinv(fb)),  # [F, M]
        "win": jnp.asarray(win),
    }


@lru_cache(maxsize=16)
def _ola_norm(n_fft: int, hop: int, n_frames: int) -> np.ndarray:
    """Overlap-added squared-window normalizer for ``n_frames`` frames."""
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    length = (n_frames - 1) * hop + n_fft
    wsum = np.zeros(length, np.float64)
    for i in range(n_frames):
        wsum[i * hop: i * hop + n_fft] += win ** 2
    return np.maximum(wsum, 1e-8).astype(np.float32)


def _frame(x, n_fft: int, hop: int, n_frames: int):
    """[B, L] -> [B, n_frames, n_fft] (static gather framing)."""
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])  # [T, n_fft]
    return x[:, idx]


def _istft(S, win, n_fft: int, hop: int):
    """[B, T, F] complex -> [B, (T-1)*hop + n_fft] via shift-add OLA."""
    B, T, _ = S.shape
    frames = jnp.fft.irfft(S, n=n_fft, axis=-1) * win[None, None, :]
    k = n_fft // hop  # overlapping segments per output hop (4 for 1024/256)
    length = (T - 1) * hop + n_fft
    # frames[:, t] starts at t*hop: pad each of the k hop-strided segment
    # planes to the output grid and sum (no scatter; all shapes static)
    seg = frames.reshape(B, T, k, hop)  # segment j of frame t lands at (t+j)*hop
    out = jnp.zeros((B, length), frames.dtype)
    for j in range(k):
        plane = seg[:, :, j, :].reshape(B, T * hop)  # frame t at t*hop
        out = out + jnp.pad(plane, ((0, 0), (j * hop,
                                             length - T * hop - j * hop)))
    return out / jnp.asarray(_ola_norm(n_fft, hop, T))[None, :]


def _stft(x, win, n_fft: int, hop: int, n_frames: int):
    return jnp.fft.rfft(_frame(x, n_fft, hop, n_frames)
                        * win[None, None, :], axis=-1)


def apply(params: Dict[str, Any], cfg: GriffinLimConfig, logmel):
    """[B, T, M] log10 power-mel -> [B, T * hop] waveform (jittable).

    Mirrors ``hifigan.apply``'s contract (batch in, ``T * upsample`` samples
    out, tanh-free float32 in [-1, 1]-ish range).
    """
    B, T, _ = logmel.shape
    n_fft, hop = cfg.n_fft, cfg.hop
    power = jnp.maximum(
        jnp.einsum("fm,btm->btf", params["fb_pinv"], 10.0 ** logmel), 0.0)
    mag = jnp.sqrt(power)  # [B, T, F]

    # deterministic phase init (fixed key: same mel -> same audio)
    key = jax.random.PRNGKey(12345)
    ph = jax.random.uniform(key, mag.shape, jnp.float32, 0.0, 2.0 * np.pi)
    S = mag * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    win = params["win"]

    def body(S, _):
        x = _istft(S, win, n_fft, hop)
        # re-frame the synthesized signal on the same grid (analysis window
        # starts at t*hop; signal is long enough by construction)
        Sn = _stft(x, win, n_fft, hop, T)
        phase = Sn / jnp.maximum(jnp.abs(Sn), 1e-8)
        return mag * phase, None

    S, _ = jax.lax.scan(body, S, None, length=cfg.iters)
    x = _istft(S, win, n_fft, hop)
    # analysis framing assumed a reflect-pad of n_fft//2 (mel80_np): trim it
    return x[:, n_fft // 2: n_fft // 2 + T * hop]
