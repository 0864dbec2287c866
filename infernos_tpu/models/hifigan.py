"""HiFi-GAN vocoder in functional JAX.

Capability parity: the reference vocodes with ``SpeechT5HifiGan``
(``HelloSippyTTSRT/HelloSippyRTPipe.py:171-175`` loads
``microsoft/speecht5_hifigan``).  Numerics follow the HF implementation so
checkpoints port via :func:`port_from_hf`.

Streaming use: the TTS engine calls :func:`apply` on fixed-size mel chunks
with a few frames of left context (the reference's ``pre_frames`` carry-over,
``HelloSippyRTPipe.py:230-240``), then trims ``total_upsample * ctx`` leading
samples.  All convs are 'same'-padded, so chunk boundaries only see edge
effects within the receptive field -- the chunk smoother
(:mod:`.amendnet`) repairs the residual seam.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L


@dataclasses.dataclass(frozen=True)
class HifiGanConfig:
    model_in_dim: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (4, 4, 4, 4)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 8, 8)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    leaky_relu_slope: float = 0.1
    normalize_before: bool = True

    @property
    def total_upsample(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


def _get_padding(k: int, d: int = 1) -> int:
    return (k * d - d) // 2


def init_params(key, cfg: HifiGanConfig) -> Dict[str, Any]:
    n_up = len(cfg.upsample_rates)
    n_res = n_up * len(cfg.resblock_kernel_sizes)
    ks = list(jax.random.split(key, 2 + n_up + n_res * 6))

    def nk():
        return ks.pop()

    def conv(c_in, c_out, k):
        # HF initializes conv weights N(0, 0.01)
        return {
            "w": 0.01 * jax.random.normal(nk(), (k, c_in, c_out), jnp.float32),
            "b": jnp.zeros((c_out,), jnp.float32),
        }

    params: Dict[str, Any] = {
        "conv_pre": conv(cfg.model_in_dim, cfg.upsample_initial_channel, 7),
        "ups": [],
        "resblocks": [],
        "mean": jnp.zeros((cfg.model_in_dim,), jnp.float32),
        "scale": jnp.ones((cfg.model_in_dim,), jnp.float32),
    }
    ch = cfg.upsample_initial_channel
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        c_out = ch // (2 ** (i + 1))
        c_in = ch // (2**i)
        params["ups"].append(
            {
                "w": 0.01 * jax.random.normal(nk(), (k, c_out, c_in), jnp.float32),
                "b": jnp.zeros((c_out,), jnp.float32),
            }
        )
        for ksz, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            params["resblocks"].append(
                {
                    "convs1": [conv(c_out, c_out, ksz) for _ in dils],
                    "convs2": [conv(c_out, c_out, ksz) for _ in dils],
                }
            )
    params["conv_post"] = conv(ch // (2 ** len(cfg.upsample_rates)), 1, 7)
    return params


def _resblock(p, x, ksz, dils, slope):
    for c1, c2, d in zip(p["convs1"], p["convs2"], dils):
        r = x
        x = jax.nn.leaky_relu(x, slope)
        x = L.conv1d(x, c1, padding=_get_padding(ksz, d), dilation=d)
        x = jax.nn.leaky_relu(x, slope)
        x = L.conv1d(x, c2, padding=_get_padding(ksz, 1))
        x = x + r
    return x


def apply(params, cfg: HifiGanConfig, spectrogram):
    """[B, T, n_mels] log-mel -> [B, T * total_upsample] waveform."""
    x = spectrogram
    if cfg.normalize_before:
        x = (x - params["mean"]) / params["scale"]
    x = L.conv1d(x, params["conv_pre"], padding=3)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, cfg.leaky_relu_slope)
        x = L.conv_transpose1d(x, params["ups"][i], stride=rate, padding=(k - rate) // 2)
        acc = None
        for j in range(nk):
            rb = params["resblocks"][i * nk + j]
            y = _resblock(rb, x, cfg.resblock_kernel_sizes[j],
                          cfg.resblock_dilation_sizes[j], cfg.leaky_relu_slope)
            acc = y if acc is None else acc + y
        x = acc / nk
    x = jax.nn.leaky_relu(x, 0.01)  # HF uses the torch default slope here
    x = L.conv1d(x, params["conv_post"], padding=3)
    return jnp.tanh(x)[:, :, 0]


# -- HF weight porting ---------------------------------------------------------

def _t(x):
    return jnp.asarray(np.asarray(x.detach().cpu().float().numpy()))


def port_from_hf(model) -> Tuple[Dict[str, Any], HifiGanConfig]:
    """Port a ``transformers.SpeechT5HifiGan``."""
    hc = model.config
    cfg = HifiGanConfig(
        model_in_dim=hc.model_in_dim,
        upsample_initial_channel=hc.upsample_initial_channel,
        upsample_rates=tuple(hc.upsample_rates),
        upsample_kernel_sizes=tuple(hc.upsample_kernel_sizes),
        resblock_kernel_sizes=tuple(hc.resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(tuple(d) for d in hc.resblock_dilation_sizes),
        leaky_relu_slope=hc.leaky_relu_slope,
        normalize_before=hc.normalize_before,
    )

    def conv(mod):
        # torch Conv1d [C_out, C_in, K] -> [K, C_in, C_out]
        p = {"w": _t(mod.weight).transpose(2, 1, 0)}
        if mod.bias is not None:
            p["b"] = _t(mod.bias)
        return p

    def convT(mod):
        # torch ConvTranspose1d [C_in, C_out, K] -> [K, C_out, C_in]
        return {"w": _t(mod.weight).transpose(2, 1, 0), "b": _t(mod.bias)}

    params = {
        "conv_pre": conv(model.conv_pre),
        "ups": [convT(u) for u in model.upsampler],
        "resblocks": [
            {"convs1": [conv(c) for c in rb.convs1], "convs2": [conv(c) for c in rb.convs2]}
            for rb in model.resblocks
        ],
        "conv_post": conv(model.conv_post),
        "mean": _t(model.mean),
        "scale": _t(model.scale),
    }
    return params, cfg
