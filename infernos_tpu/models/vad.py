"""Voice-activity-detection models with explicit, slot-batched state.

Capability parity: the reference runs Silero VAD v3.1 (a TorchScript blob,
``Core/VAD/SileroVAD.py:44``) whose RNN state it already externalizes per
channel for batching (``Core/VAD/SileroVADUtils.py:4-26`` stores two
``(2, 64)`` tensors per channel).  That externalized-state design is exactly
the JAX-friendly shape: here the model is a pure function
``(params, window[B, W], state) -> (probs[B], state)`` and the state is an
explicit pytree ``[B, ...]``, so thousands of channels batch into one jitted
call per 96 ms tick.

Two interchangeable implementations:

- :class:`NeuralVAD`: Silero-class architecture (conv feature frontend +
  2-layer LSTM(64) + sigmoid head).  Weights are random-initialized offline;
  ``port_weights`` accepts a state dict when a trained checkpoint is
  available.
- :class:`EnergyVAD`: deterministic adaptive-energy heuristic, the offline
  default for end-to-end tests (same role as the reference's fallback
  ``ZlibVAD``, ``Core/VAD/ZlibVAD.py:20-52``, which is also provided in
  ``serving.vad_engine``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L


@dataclasses.dataclass(frozen=True)
class VADConfig:
    window: int = 768  # samples per decision @8 kHz (reference SileroVAD.py:56)
    sample_rate: int = 8000
    n_fft: int = 256
    hop: int = 128
    conv_ch: int = 64
    lstm_hidden: int = 64
    lstm_layers: int = 2


class VADState(NamedTuple):
    h: jnp.ndarray  # [layers, B, hidden]
    c: jnp.ndarray  # [layers, B, hidden]


def init_state(cfg: VADConfig, batch: int) -> VADState:
    shape = (cfg.lstm_layers, batch, cfg.lstm_hidden)
    # distinct buffers: h and c are donated separately through the jitted step
    return VADState(jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))


def init_params(key, cfg: VADConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 4 + cfg.lstm_layers)
    n_bins = cfg.n_fft // 2 + 1
    p: Dict[str, Any] = {
        "conv1": L.conv1d_init(ks[0], n_bins, cfg.conv_ch, 3),
        "conv2": L.conv1d_init(ks[1], cfg.conv_ch, cfg.conv_ch, 3),
        "lstm": [],
        "head": L.linear_init(ks[2], cfg.lstm_hidden, 1),
    }
    H = cfg.lstm_hidden
    for i in range(cfg.lstm_layers):
        d_in = cfg.conv_ch if i == 0 else H
        k1, k2 = jax.random.split(ks[3 + i])
        bound = 1.0 / np.sqrt(H)
        p["lstm"].append({
            "wi": L.uniform_init(k1, (d_in, 4 * H), bound),
            "wh": L.uniform_init(k2, (H, 4 * H), bound),
            "b": jnp.zeros((4 * H,), jnp.float32),
        })
    return p


def _lstm_cell(p, x, h, c):
    """Single LSTM step, torch gate order (i, f, g, o)."""
    gates = x @ p["wi"] + h @ p["wh"] + p["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def apply(params, cfg: VADConfig, window, state: VADState) -> Tuple[jnp.ndarray, VADState]:
    """window: [B, W] float32 -> (speech probs [B], new state).  Jittable."""
    B, W = window.shape
    n_frames = 1 + (W - cfg.n_fft) // cfg.hop
    idx = np.arange(cfg.n_fft)[None, :] + cfg.hop * np.arange(n_frames)[:, None]
    hann = jnp.asarray(
        (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(cfg.n_fft) / cfg.n_fft)).astype(np.float32)
    )
    frames = window[:, idx] * hann[None, None, :]
    mag = jnp.abs(jnp.fft.rfft(frames, axis=-1)).astype(jnp.float32)  # [B, F, bins]
    feat = jnp.log1p(mag)
    x = jax.nn.relu(L.conv1d(feat, params["conv1"], padding=1))
    x = jax.nn.relu(L.conv1d(x, params["conv2"], padding=1))  # [B, F, C]

    hs, cs = [], []
    for li, lp in enumerate(params["lstm"]):
        h, c = state.h[li], state.c[li]

        def cell(carry, xt):
            h, c = carry
            h, c = _lstm_cell(lp, xt, h, c)
            return (h, c), h

        (h, c), ys = jax.lax.scan(cell, (h, c), x.transpose(1, 0, 2))
        x = ys.transpose(1, 0, 2)
        hs.append(h)
        cs.append(c)
    prob = jax.nn.sigmoid(L.linear(x[:, -1], params["head"]))[:, 0]
    return prob, VADState(jnp.stack(hs), jnp.stack(cs))


def load_pretrained(path: str = None) -> Dict[str, Any] | None:
    """Load the in-repo trained VAD weights (``tools/train_vad.py``), or
    None when absent.  The reference downloads Silero's checkpoint at
    runtime (``Core/VAD/SileroVAD.py:44-45``); here the same-class network
    is trained on synthetic telephone audio and vendored as data."""
    from .npz_io import data_path, load_params

    return load_params(path or data_path("vad_weights.npz"))


class NeuralVAD:
    """Jitted, slot-batched neural VAD with donated state."""

    def __init__(self, params, cfg: VADConfig, batch: int):
        self.cfg = cfg
        self.batch = batch
        self.params = params
        self.state = init_state(cfg, batch)
        self._fn = jax.jit(lambda w, s: apply(self.params, cfg, w, s),
                           donate_argnums=(1,))

    def __call__(self, windows: np.ndarray) -> np.ndarray:
        """windows: [B, W] for all channels this tick -> probs [B]."""
        probs, self.state = self._fn(jnp.asarray(windows), self.state)
        return np.asarray(probs)

    def reset_channel(self, idx: int) -> None:
        self.state = VADState(
            self.state.h.at[:, idx].set(0.0), self.state.c.at[:, idx].set(0.0)
        )


class NumpyVAD:
    """Pure-numpy inference for the trained VAD (media-plane hot path).

    The ingest ring ticks every 96 ms; a jitted forward would dispatch to
    the DEFAULT jax backend -- on tunneled/remote TPUs that is one ~100+ ms
    round trip per tick, which the media plane cannot absorb.  The net is
    ~100k params, so host-side numpy runs it in well under a millisecond;
    the device stays reserved for the big models.  Numerics match the JAX
    path (parity-tested).
    """

    def __init__(self, params, cfg: VADConfig, batch: int):
        self.cfg = cfg
        self.batch = batch
        g = lambda p: np.asarray(p, np.float32)
        self.conv1_w = g(params["conv1"]["w"])  # [K, Cin, Cout]
        self.conv1_b = g(params["conv1"]["b"])
        self.conv2_w = g(params["conv2"]["w"])
        self.conv2_b = g(params["conv2"]["b"])
        self.lstm = [{k: g(v) for k, v in lp.items()} for lp in params["lstm"]]
        self.head_w = g(params["head"]["w"])
        self.head_b = g(params["head"].get("b", np.zeros(1)))
        L_, H = cfg.lstm_layers, cfg.lstm_hidden
        self.h = np.zeros((L_, batch, H), np.float32)
        self.c = np.zeros((L_, batch, H), np.float32)
        n = cfg.n_fft
        self._hann = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)

    @staticmethod
    def _conv1d(x, w, b):
        """x [B,F,Cin], w [3,Cin,Cout], pad 1."""
        xp = np.pad(x, ((0, 0), (1, 1), (0, 0)))
        y = (xp[:, :-2] @ w[0] + xp[:, 1:-1] @ w[1] + xp[:, 2:] @ w[2])
        return y + b

    #: worker may pass ``slots`` to run only the occupied rows (the media
    #: worker was paying the FULL slot-table width per forward otherwise --
    #: at 200 slots that made every staggered-arrival forward cost ~40x its
    #: true batch, the dominant host burn in the round-5 ramp profile)
    supports_slots = True

    def __call__(self, windows: np.ndarray,
                 slots: "np.ndarray | None" = None) -> np.ndarray:
        cfg = self.cfg
        B, W = windows.shape
        n_frames = 1 + (W - cfg.n_fft) // cfg.hop
        idx = (np.arange(cfg.n_fft)[None, :]
               + cfg.hop * np.arange(n_frames)[:, None])
        frames = windows[:, idx] * self._hann[None, None, :]
        feat = np.log1p(np.abs(np.fft.rfft(frames, axis=-1))).astype(np.float32)
        x = np.maximum(self._conv1d(feat, self.conv1_w, self.conv1_b), 0.0)
        x = np.maximum(self._conv1d(x, self.conv2_w, self.conv2_b), 0.0)

        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        for li, lp in enumerate(self.lstm):
            h = self.h[li] if slots is None else self.h[li][slots]
            c = self.c[li] if slots is None else self.c[li][slots]
            ys = np.empty((B, x.shape[1], h.shape[-1]), np.float32)
            for t in range(x.shape[1]):
                gates = x[:, t] @ lp["wi"] + h @ lp["wh"] + lp["b"]
                i, f, g_, o = np.split(gates, 4, axis=-1)
                c = sig(f) * c + sig(i) * np.tanh(g_)
                h = sig(o) * np.tanh(c)
                ys[:, t] = h
            if slots is None:
                self.h[li], self.c[li] = h, c
            else:
                self.h[li][slots] = h
                self.c[li][slots] = c
            x = ys
        return sig(x[:, -1] @ self.head_w + self.head_b)[:, 0]

    def reset_channel(self, idx: int) -> None:
        self.h[:, idx] = 0.0
        self.c[:, idx] = 0.0


class EnergyVAD:
    """Adaptive-energy VAD: deterministic, dependency-free, works untrained.

    Tracks a per-channel noise floor (exponential min-follower); a window is
    speech when its RMS exceeds ``floor * ratio`` and an absolute gate.
    """

    def __init__(self, batch: int, floor_init: float = 1e-3, ratio: float = 3.0,
                 abs_gate: float = 0.01, decay: float = 0.995):
        self.floor = np.full(batch, floor_init, np.float32)
        self.ratio = ratio
        self.abs_gate = abs_gate
        self.decay = decay

    def __call__(self, windows: np.ndarray) -> np.ndarray:
        rms = np.sqrt(np.mean(np.square(windows), axis=-1) + 1e-12)
        self.floor = np.minimum(self.floor / self.decay, np.maximum(rms, 1e-5))
        speech = (rms > self.floor * self.ratio) & (rms > self.abs_gate)
        return speech.astype(np.float32)

    def reset_channel(self, idx: int) -> None:
        self.floor[idx] = 1e-3
