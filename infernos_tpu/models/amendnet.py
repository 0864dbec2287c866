"""Chunk-boundary smoother for streaming vocoding.

Capability parity: the reference's ``AmendmentNetwork1``
(``HelloSippyTTSRT/HelloSippyRT.py:163-237``, pretrained
``sobomax/speecht5-rt.post_vocoder.v2``) is a small conv net that takes each
vocoder chunk (mel 80ch + audio folded to 256-sample frames) and produces a
per-sample gain mask, multiplied in and tanh-clamped, hiding the seam between
independently vocoded chunks.

We implement the same role with an equivalent conv architecture.  Weights
initialize so the mask starts at ~1.0 (identity) -- without the reference's
pretrained weights available offline, identity init keeps the streaming path
bit-stable; training/porting can refine it later.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from . import layers as L


@dataclasses.dataclass(frozen=True)
class AmendNetConfig:
    num_mels: int = 80
    frame_size: int = 256  # audio samples per mel frame (HiFi-GAN upsample)
    chunk_frames: int = 8  # frames amended per call (reference: chunk 8)
    pre_frames: int = 2  # left context (reference trim_pr)
    post_frames: int = 2  # right context (reference trim_po)
    hidden: int = 128

    @property
    def total_frames(self) -> int:
        return self.pre_frames + self.chunk_frames + self.post_frames


def init_params(key, cfg: AmendNetConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    c_in = cfg.num_mels + cfg.frame_size
    p = {
        "conv1": L.conv1d_init(ks[0], c_in, cfg.hidden, 3),
        "conv2": L.conv1d_init(ks[1], cfg.hidden, cfg.hidden, 3),
        "out": L.conv1d_init(ks[2], cfg.hidden, cfg.frame_size, 3),
    }
    # identity start: zero the mask head so gain == softplus-shifted 1.0
    p["out"]["w"] = jnp.zeros_like(p["out"]["w"])
    p["out"]["b"] = jnp.zeros_like(p["out"]["b"])
    return p


def load_pretrained(path: str = None) -> Dict[str, Any] | None:
    """In-repo trained smoother weights (``tools/train_amendnet.py``: a
    boundary declicker trained on synthetic chunk artifacts -- the
    zero-egress substitute for the reference's downloaded
    ``sobomax/speecht5-rt.post_vocoder.v2``), or None when absent."""
    from .npz_io import data_path, load_params

    return load_params(path or data_path("amendnet_weights.npz"))


def apply(params, cfg: AmendNetConfig, mel, audio):
    """Smooth one vocoded chunk.

    mel:   [B, total_frames, num_mels]  (chunk + context, post-postnet)
    audio: [B, total_frames * frame_size]  (vocoder output for same span)
    Returns [B, chunk_frames * frame_size] amended audio for the chunk only.
    """
    B, T, _ = mel.shape
    frames = audio.reshape(B, T, cfg.frame_size)
    x = jnp.concatenate([mel, frames], axis=-1)
    h = jax.nn.leaky_relu(L.conv1d(x, params["conv1"], padding=1), 0.1)
    h = jax.nn.leaky_relu(L.conv1d(h, params["conv2"], padding=1), 0.1)
    # gain mask centered at 1.0 (identity at init since head is zeroed)
    gain = 1.0 + jnp.tanh(L.conv1d(h, params["out"], padding=1))
    amended = jnp.tanh(frames * gain)
    s, e = cfg.pre_frames, cfg.pre_frames + cfg.chunk_frames
    return amended[:, s:e].reshape(B, cfg.chunk_frames * cfg.frame_size)
