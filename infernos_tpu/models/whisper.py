"""Whisper-class speech-to-text model in functional JAX.

Capability parity: the reference serves ``openai/whisper-large-v3`` through
the C++ ctranslate2 engine at int8 (``Cluster/InfernSTTWorker.py:25-36``).
Here the engine is XLA:TPU: architecture and numerics follow HF
``WhisperForConditionalGeneration`` exactly so pretrained checkpoints port
via :func:`port_from_hf` (golden-tested against random-init HF models).

TPU-first design:

- mel frontend (``audio.mel.log_mel_jax``) + encoder run as ONE jitted
  program per audio-length bucket -- ingest-to-encoder stays on device;
- decode uses the same slot-batched KV-cache pattern as the TTS engine:
  per-slot positions, join/leave by slot writes, greedy steps batched
  across concurrent sessions (continuous batching; the reference batches
  <=4 whole utterances instead, ``InfernSTTWorker.py:17``);
- ``<|nospeech|>`` probability is read from the first decode step's logits
  (parity with the reference's ``no_speech_prob`` gating,
  ``Cluster/STTSession.py:25`` max_ns_prob=0.5).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L
from .whisper_tokens import specials_for_vocab


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51866
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    decoder_layers: int = 32
    decoder_attention_heads: int = 20
    ffn_dim: int = 5120
    max_source_positions: int = 1500
    max_target_positions: int = 448
    # special tokens (large-v3 defaults; tokenizer provides real values)
    eos_token_id: int = 50257
    sot_token_id: int = 50258
    no_speech_token_id: int = 50363

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper fixed encoder positional table (OpenAI layout: sin|cos)."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


# -- init ---------------------------------------------------------------------

def _attn_init(key, d, k_bias=False):
    ks = jax.random.split(key, 4)
    return {
        "q": L.linear_init(ks[0], d, d),
        "k": L.linear_init(ks[1], d, d, bias=k_bias),
        "v": L.linear_init(ks[2], d, d),
        "o": L.linear_init(ks[3], d, d),
    }


def _enc_layer_init(key, cfg):
    ks = jax.random.split(key, 3)
    d = cfg.d_model
    return {
        "ln1": L.layer_norm_init(d),
        "attn": _attn_init(ks[0], d),
        "ln2": L.layer_norm_init(d),
        "fc1": L.linear_init(ks[1], d, cfg.ffn_dim),
        "fc2": L.linear_init(ks[2], cfg.ffn_dim, d),
    }


def _dec_layer_init(key, cfg):
    ks = jax.random.split(key, 4)
    d = cfg.d_model
    return {
        "ln1": L.layer_norm_init(d),
        "self_attn": _attn_init(ks[0], d),
        "ln2": L.layer_norm_init(d),
        "cross_attn": _attn_init(ks[1], d),
        "ln3": L.layer_norm_init(d),
        "fc1": L.linear_init(ks[2], d, cfg.ffn_dim),
        "fc2": L.linear_init(ks[3], cfg.ffn_dim, d),
    }


def stack_layers(layers):
    """List of per-layer pytrees -> one pytree with a leading layer dim.

    Layer stacks let the transformer run as ``lax.scan`` over layers: the
    traced graph holds ONE layer body instead of 32 unrolled copies, which
    cuts trace+compile time by an order of magnitude at large depths.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def init_params(key, cfg: WhisperConfig) -> Dict[str, Any]:
    n = 6 + cfg.encoder_layers + cfg.decoder_layers
    ks = list(jax.random.split(key, n))
    nk = ks.pop
    d = cfg.d_model
    return {
        "conv1": L.conv1d_init(nk(), cfg.num_mel_bins, d, 3),
        "conv2": L.conv1d_init(nk(), d, d, 3),
        "enc_pos": jnp.asarray(_sinusoids(cfg.max_source_positions, d)),
        "enc_layers": stack_layers(
            [_enc_layer_init(nk(), cfg) for _ in range(cfg.encoder_layers)]),
        "enc_ln": L.layer_norm_init(d),
        "tok_embed": L.embedding_init(nk(), cfg.vocab_size, d),
        "dec_pos": {"w": 0.02 * jax.random.normal(nk(), (cfg.max_target_positions, d))},
        "dec_layers": stack_layers(
            [_dec_layer_init(nk(), cfg) for _ in range(cfg.decoder_layers)]),
        "dec_ln": L.layer_norm_init(d),
    }


# -- encoder ------------------------------------------------------------------

def encode(params, cfg: WhisperConfig, mel):
    """mel ``[B, n_mels, T]`` -> encoder states ``[B, T//2, D]``.

    T may be any even length <= 2*max_source_positions: the positional table
    is truncated, enabling short-audio buckets (8 s/16 s/30 s) that cut
    encoder FLOPs ~linearly vs the reference's always-30 s padding.
    """
    x = mel.transpose(0, 2, 1)  # [B, T, n_mels]
    x = jax.nn.gelu(L.conv1d(x, params["conv1"], padding=1), approximate=False)
    x = jax.nn.gelu(L.conv1d(x, params["conv2"], stride=2, padding=1), approximate=False)
    S = x.shape[1]
    assert S <= params["enc_pos"].shape[0], (
        f"audio too long: {S} frames > max_source_positions "
        f"{params['enc_pos'].shape[0]}")
    x = x + params["enc_pos"][:S].astype(x.dtype)
    from ..ops.attention import fused_attention

    H = cfg.encoder_attention_heads

    def body(x, lp):
        h_in = L.layer_norm(x, lp["ln1"])
        # encoder self-attention runs through the Pallas block-q kernel on
        # TPU (the FLOPs-heavy stage of STT serving); XLA path elsewhere
        q = L.linear(h_in, lp["attn"]["q"])
        k = L.linear(h_in, lp["attn"]["k"])
        v = L.linear(h_in, lp["attn"]["v"])
        h = fused_attention(q, k, v, n_heads=H)
        x = x + L.linear(h, lp["attn"]["o"])
        h = L.layer_norm(x, lp["ln2"])
        h = L.linear(jax.nn.gelu(L.linear(h, lp["fc1"]), approximate=False), lp["fc2"])
        return x + h, None

    x, _ = jax.lax.scan(body, x, params["enc_layers"])
    return L.layer_norm(x, params["enc_ln"])


# -- decoder ------------------------------------------------------------------

class WhisperCache(NamedTuple):
    self_k: jnp.ndarray  # [L, B, H, Tmax, Dh]
    self_v: jnp.ndarray
    # arrays [L, B, H, S, Dh], or int8 dicts {"q": int8, "s": f32[..., S, 1]}
    # (per-position symmetric quantization; see quantize_kv)
    cross_k: Any
    cross_v: Any


def quantize_kv(x) -> Dict[str, jnp.ndarray]:
    """Per-position symmetric int8 over the head dim: [..., S, Dh] ->
    {"q": int8 [..., S, Dh], "s": f32 [..., S, 1]}.

    The cross K/V cache is the decode step's dominant HBM traffic (large-v3
    at the 32 s bucket: ~0.5 GB/slot in bf16, read every token step); int8
    cuts that ~4x, the same lever the reference buys from ctranslate2's int8
    engine (``Cluster/InfernSTTWorker.py:36``)."""
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8)
    s = (amax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def dequantize_kv(c, dtype):
    """Inverse of quantize_kv; passes dense arrays through unchanged.  XLA
    fuses the int8->dtype convert + scale into the attention dot's operand
    load, so no dense copy materializes in HBM."""
    if isinstance(c, dict):
        return c["q"].astype(dtype) * c["s"].astype(dtype)
    return c


def init_cache(cfg: WhisperConfig, batch: int, max_steps: int, enc_len: int,
               dtype=jnp.float32, cross_int8: bool = False,
               time_minor: bool = False) -> WhisperCache:
    """``time_minor=True`` stores every cache with TIME as the minor dim
    (``[L, B, H, Dh, T]``); with head_dim=64 minor the TPU pads the lane
    dim 64->128 (2x HBM on every cache buffer, PERF.md round 4), while T
    (224 / 1500) pads by <15%/2%."""
    Lyr, H, Dh = cfg.decoder_layers, cfg.decoder_attention_heads, cfg.head_dim
    if time_minor:
        z = lambda t: jnp.zeros((Lyr, batch, H, Dh, t), dtype)
        zq = lambda t: {"q": jnp.zeros((Lyr, batch, H, Dh, t), jnp.int8),
                        "s": jnp.zeros((Lyr, batch, H, 1, t), jnp.float32)}
    else:
        z = lambda t: jnp.zeros((Lyr, batch, H, t, Dh), dtype)
        zq = lambda t: {"q": jnp.zeros((Lyr, batch, H, t, Dh), jnp.int8),
                        "s": jnp.zeros((Lyr, batch, H, t, 1), jnp.float32)}
    if cross_int8:
        return WhisperCache(z(max_steps), z(max_steps), zq(enc_len), zq(enc_len))
    return WhisperCache(z(max_steps), z(max_steps), z(enc_len), z(enc_len))


def to_time_minor_kv(c):
    """Canonical ``[..., T, Dh]`` K/V (dense or int8 dict) -> time-minor
    ``[..., Dh, T]``.  ``dequantize_kv`` broadcasts either orientation."""
    if isinstance(c, dict):
        return {"q": jnp.swapaxes(c["q"], -1, -2),
                "s": jnp.swapaxes(c["s"], -1, -2)}
    return jnp.swapaxes(c, -1, -2)


def fill_cross_kv(params, cfg: WhisperConfig, cache: WhisperCache, enc_out,
                  time_minor: bool = False) -> WhisperCache:
    def body(_, lp):
        k, v = L.precompute_cross_kv(lp["cross_attn"], enc_out,
                                     n_heads=cfg.decoder_attention_heads)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(body, None, params["dec_layers"])
    if isinstance(cache.cross_k, dict):
        ks, vs = quantize_kv(ks), quantize_kv(vs)
    if time_minor:
        ks, vs = to_time_minor_kv(ks), to_time_minor_kv(vs)
    return cache._replace(cross_k=ks, cross_v=vs)


def decode_full(params, cfg: WhisperConfig, tokens, enc_out, enc_mask=None):
    """Teacher-forced decoder over ``[B, T]`` tokens -> logits ``[B, T, V]``.

    Used for parity tests and as the prompt-prefill reference.
    """
    B, T = tokens.shape
    H = cfg.decoder_attention_heads
    x = params["tok_embed"]["w"][tokens] + params["dec_pos"]["w"][:T]
    causal = L.causal_bias(T)
    xmask = L.pad_mask_to_bias(enc_mask, T) if enc_mask is not None else None

    def body(x, lp):
        h = L.attention(lp["self_attn"], L.layer_norm(x, lp["ln1"]),
                        n_heads=H, mask=causal)
        x = x + h
        h = L.attention(lp["cross_attn"], L.layer_norm(x, lp["ln2"]), enc_out,
                        n_heads=H, mask=xmask)
        x = x + h
        h = L.layer_norm(x, lp["ln3"])
        h = L.linear(jax.nn.gelu(L.linear(h, lp["fc1"]), approximate=False), lp["fc2"])
        return x + h, None

    x, _ = jax.lax.scan(body, x, params["dec_layers"])
    x = L.layer_norm(x, params["dec_ln"])
    return jnp.einsum("btd,vd->btv", x, params["tok_embed"]["w"])


def decode_step(params, cfg: WhisperConfig, tokens, cache: WhisperCache, pos,
                enc_mask=None, time_minor: bool = False
                ) -> Tuple[jnp.ndarray, WhisperCache]:
    """One greedy step for all slots: tokens ``[B]``, pos ``[B]`` ->
    (logits ``[B, V]``, cache).  ``time_minor``: caches are
    ``[L, B, H, Dh, T]`` (see :func:`init_cache`)."""
    H = cfg.decoder_attention_heads
    self_step = L.attention_step_tm if time_minor else L.attention_step
    cross_step = L.cross_attention_step_tm if time_minor else L.cross_attention_step
    x = params["tok_embed"]["w"][tokens][:, None, :] + \
        params["dec_pos"]["w"][pos][:, None, :]

    def body(x, layer):
        lp, k_l, v_l, ck_l, cv_l = layer
        h, k_c, v_c = self_step(
            lp["self_attn"], L.layer_norm(x, lp["ln1"]), n_heads=H,
            k_cache=k_l, v_cache=v_l, pos=pos,
        )
        x = x + h
        h = cross_step(
            lp["cross_attn"], L.layer_norm(x, lp["ln2"]),
            dequantize_kv(ck_l, x.dtype), dequantize_kv(cv_l, x.dtype),
            n_heads=H, kv_mask=enc_mask,
        )
        x = x + h
        h = L.layer_norm(x, lp["ln3"])
        h = L.linear(jax.nn.gelu(L.linear(h, lp["fc1"]), approximate=False), lp["fc2"])
        return x + h, (k_c, v_c)

    x, (sk, sv) = jax.lax.scan(
        body, x, (params["dec_layers"], cache.self_k, cache.self_v,
                  cache.cross_k, cache.cross_v))
    x = L.layer_norm(x, params["dec_ln"])[:, 0]
    logits = jnp.einsum("bd,vd->bv", x, params["tok_embed"]["w"])
    return logits, cache._replace(self_k=sk, self_v=sv)


def init_ring(cfg: WhisperConfig, batch: int, k_steps: int, dtype=jnp.float32,
              time_minor: bool = False):
    """Per-dispatch K/V ring for :func:`decode_step_ring`:
    ``([L, B, H, K, Dh], [L, B, H, K, Dh])`` zeros (``[L, B, H, Dh, K]``
    when ``time_minor``)."""
    H, Dh = cfg.decoder_attention_heads, cfg.d_model // cfg.decoder_attention_heads
    shape = ((cfg.decoder_layers, batch, H, Dh, k_steps) if time_minor
             else (cfg.decoder_layers, batch, H, k_steps, Dh))
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def decode_step_ring(params, cfg: WhisperConfig, tokens, cache: WhisperCache,
                     ring_k, ring_v, pos0, pos, step_i,
                     enc_mask=None, time_minor: bool = False,
                     cross_direct_int8: bool = False, unroll: int = 1
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step that writes K/V to the dispatch ring, not the cache.

    The engine's K-step dispatch scans this with (ring_k, ring_v) in the
    carry and the big cache LOOP-INVARIANT, then merges once via
    :func:`merge_ring` -- avoiding the full-cache scatter copy
    ``decode_step`` pays every scan iteration (see
    ``layers.attention_step_ring``).  ``pos0``: per-slot position at
    dispatch entry; ``pos``: current per-slot position (embedding index);
    ``step_i``: scalar dispatch-internal step.
    Returns (logits ``[B, V]``, ring_k, ring_v).
    """
    H = cfg.decoder_attention_heads
    ring_step = L.attention_step_ring_tm if time_minor else L.attention_step_ring
    if cross_direct_int8:
        assert time_minor, "int8-direct cross attention needs time-minor caches"
    cross_step = L.cross_attention_step_tm if time_minor else L.cross_attention_step
    x = params["tok_embed"]["w"][tokens][:, None, :] + \
        params["dec_pos"]["w"][pos][:, None, :]

    def body(x, layer):
        lp, k_l, v_l, ck_l, cv_l, rk_l, rv_l = layer
        h, rk_l, rv_l = ring_step(
            lp["self_attn"], L.layer_norm(x, lp["ln1"]), n_heads=H,
            k_cache=k_l, v_cache=v_l, ring_k=rk_l, ring_v=rv_l,
            pos0=pos0, step_i=step_i,
        )
        x = x + h
        if cross_direct_int8:
            h = L.cross_attention_step_i8(
                lp["cross_attn"], L.layer_norm(x, lp["ln2"]), ck_l, cv_l,
                n_heads=H, kv_mask=enc_mask,
            )
        else:
            h = cross_step(
                lp["cross_attn"], L.layer_norm(x, lp["ln2"]),
                dequantize_kv(ck_l, x.dtype), dequantize_kv(cv_l, x.dtype),
                n_heads=H, kv_mask=enc_mask,
            )
        x = x + h
        h = L.layer_norm(x, lp["ln3"])
        h = L.linear(jax.nn.gelu(L.linear(h, lp["fc1"]), approximate=False), lp["fc2"])
        return x + h, (rk_l, rv_l)

    # unroll=decoder_layers: static weight slices, no per-layer slice-copy
    # (PERF.md round 4 scan-copy finding)
    x, (rk, rv) = jax.lax.scan(
        body, x, (params["dec_layers"], cache.self_k, cache.self_v,
                  cache.cross_k, cache.cross_v, ring_k, ring_v),
        unroll=unroll)
    x = L.layer_norm(x, params["dec_ln"])[:, 0]
    logits = jnp.einsum("bd,vd->bv", x, params["tok_embed"]["w"])
    return logits, rk, rv


def merge_ring(cache: WhisperCache, ring_k, ring_v, tpos,
               time_minor: bool = False) -> WhisperCache:
    """Scatter a dispatch's ring columns into the big cache ONCE.

    ``tpos`` ``[B, K]`` int32: target time index per (slot, dispatch step);
    entries >= Tmax (the done-slot sentinel) are dropped (see
    ``layers.merge_kv_ring``).
    """
    merge = L.merge_kv_ring_tm if time_minor else L.merge_kv_ring
    return cache._replace(
        self_k=merge(cache.self_k, ring_k, tpos),
        self_v=merge(cache.self_v, ring_v, tpos))


def beam_decode(params, cfg: WhisperConfig, enc_out, prompt, prompt_len, *,
                beam_size: int, max_new: int, eos_id: int,
                suppress_mask=None, begin_suppress_mask=None,
                length_penalty: float = 1.0,
                dtype=jnp.float32):
    """Batched beam search for ONE utterance (quality path).

    The reference serves through ctranslate2's default beam search
    (``Cluster/InfernSTTWorker.py:65``); this repo's slot engine decodes
    greedily for throughput and uses beam as the top rung of the decode-
    quality ladder (greedy -> escalating temperature -> beam).

    ``enc_out`` [1, S, D], ``prompt`` [P] int32 padded, ``prompt_len``
    scalar (dynamic).  One jittable program: prompt prefill (junk pad
    positions are overwritten in AR order before they are ever attended),
    then ``max_new`` expansion steps over ``beam_size`` beams with the
    self K/V cache gathered by parent beam each step.  Finished beams
    continue with zero-cost EOS so their scores freeze.

    Returns (tokens [max_new] int32 -- EOS-padded, n_tokens, sum_logprob)
    of the best length-normalized finished-or-running beam.
    """
    W = beam_size
    P = prompt.shape[0]
    V = params["tok_embed"]["w"].shape[0]
    NEG = -1e30

    cache = init_cache(cfg, 1, P + max_new, enc_out.shape[1], dtype)
    cache = fill_cross_kv(params, cfg, cache, enc_out)

    def pre(carry, x):
        cache, last = carry
        i, tok = x
        logits, cache = decode_step(params, cfg, tok[None], cache,
                                    jnp.full((1,), i, jnp.int32))
        last = jnp.where(i == prompt_len - 1, logits[0], last)
        return (cache, last), None

    (cache, last_logits), _ = jax.lax.scan(
        pre, (cache, jnp.zeros((V,), jnp.float32)),
        (jnp.arange(P), prompt))

    cache = jax.tree_util.tree_map(lambda a: jnp.repeat(a, W, axis=1), cache)
    eos_onehot = jnp.arange(V) == eos_id

    def logp_of(logits):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if suppress_mask is not None:
            lp = jnp.where(suppress_mask[None, :], NEG, lp)
        return lp

    def expand(cum, fin, lp):
        lp = jnp.where(fin[:, None],
                       jnp.where(eos_onehot[None, :], 0.0, NEG), lp)
        scores = (cum[:, None] + lp).reshape(-1)
        top, idx = jax.lax.top_k(scores, W)
        return top, idx // V, idx % V

    # initial expansion: all beams share the prefilled cache; only beam 0
    # is alive so the top-W picks W DISTINCT first tokens
    cum0 = jnp.where(jnp.arange(W) == 0, 0.0, NEG)
    lp0 = logp_of(jnp.broadcast_to(last_logits[None], (W, V)))
    if begin_suppress_mask is not None:  # first-position-only suppress set
        lp0 = jnp.where(begin_suppress_mask[None, :], NEG, lp0)
    cum, _, tok = expand(cum0, jnp.zeros((W,), bool), lp0)
    fin = tok == eos_id
    n_gen = jnp.where(fin, 0, 1)
    toks = jnp.zeros((W, max_new), jnp.int32).at[:, 0].set(tok)

    def step(carry, t):
        cache, cur, cum, fin, n_gen, toks = carry
        pos = jnp.full((W,), 0, jnp.int32) + prompt_len + t - 1
        logits, cache = decode_step(params, cfg, cur, cache, pos)
        cum, parent, tok = expand(cum, fin, logp_of(logits))
        take = lambda a: jnp.take(a, parent, axis=1)
        cache = cache._replace(self_k=take(cache.self_k),
                               self_v=take(cache.self_v))
        fin = fin[parent]
        n_gen = n_gen[parent]
        toks = toks[parent]
        now_eos = tok == eos_id
        n_gen = jnp.where(jnp.logical_or(fin, now_eos), n_gen, n_gen + 1)
        toks = toks.at[:, t].set(jnp.where(fin, eos_id, tok))
        fin = jnp.logical_or(fin, now_eos)
        return (cache, tok, cum, fin, n_gen, toks), None

    (cache, _, cum, fin, n_gen, toks), _ = jax.lax.scan(
        step, (cache, tok, cum, fin, n_gen, toks),
        jnp.arange(1, max_new))

    norm = jnp.maximum(n_gen, 1).astype(jnp.float32) ** length_penalty
    best = jnp.argmax(cum / norm)
    return toks[best], n_gen[best], cum[best]


# -- HF weight porting ---------------------------------------------------------

def _t(x):
    return jnp.asarray(np.asarray(x.detach().cpu().float().numpy()))


def _lin(mod):
    p = {"w": _t(mod.weight).T}
    if getattr(mod, "bias", None) is not None:
        p["b"] = _t(mod.bias)
    return p


def _attn(mod):
    return {"q": _lin(mod.q_proj), "k": _lin(mod.k_proj), "v": _lin(mod.v_proj),
            "o": _lin(mod.out_proj)}


def _ln(mod):
    return {"g": _t(mod.weight), "b": _t(mod.bias)}


def _conv(mod):
    return {"w": _t(mod.weight).transpose(2, 1, 0), "b": _t(mod.bias)}


def port_from_hf(model) -> Tuple[Dict[str, Any], WhisperConfig]:
    """Port ``transformers.WhisperForConditionalGeneration`` weights."""
    hc = model.config
    gen = model.generation_config
    cfg = WhisperConfig(
        vocab_size=hc.vocab_size,
        num_mel_bins=hc.num_mel_bins,
        d_model=hc.d_model,
        encoder_layers=hc.encoder_layers,
        encoder_attention_heads=hc.encoder_attention_heads,
        decoder_layers=hc.decoder_layers,
        decoder_attention_heads=hc.decoder_attention_heads,
        ffn_dim=hc.encoder_ffn_dim,
        max_source_positions=hc.max_source_positions,
        max_target_positions=hc.max_target_positions,
        eos_token_id=hc.eos_token_id,
        sot_token_id=getattr(gen, "decoder_start_token_id", hc.decoder_start_token_id),
        # <|nospeech|> depends on the vocabulary layout (50362 in the
        # 51865-token v2 vocab, 50363 in v3); HF generation configs carry
        # no_timestamps but NOT no-speech, so resolve it from the vocab size
        # via the vendored table (models/whisper_tokens.py).
        no_speech_token_id=specials_for_vocab(hc.vocab_size).nospeech,
    )
    enc = model.model.encoder
    dec = model.model.decoder
    params = {
        "conv1": _conv(enc.conv1),
        "conv2": _conv(enc.conv2),
        "enc_pos": _t(enc.embed_positions.weight),
        "enc_layers": stack_layers([
            {
                "ln1": _ln(l.self_attn_layer_norm),
                "attn": _attn(l.self_attn),
                "ln2": _ln(l.final_layer_norm),
                "fc1": _lin(l.fc1),
                "fc2": _lin(l.fc2),
            }
            for l in enc.layers
        ]),
        "enc_ln": _ln(enc.layer_norm),
        "tok_embed": {"w": _t(dec.embed_tokens.weight)},
        "dec_pos": {"w": _t(dec.embed_positions.weight)},
        "dec_layers": stack_layers([
            {
                "ln1": _ln(l.self_attn_layer_norm),
                "self_attn": _attn(l.self_attn),
                "ln2": _ln(l.encoder_attn_layer_norm),
                "cross_attn": _attn(l.encoder_attn),
                "ln3": _ln(l.final_layer_norm),
                "fc1": _lin(l.fc1),
                "fc2": _lin(l.fc2),
            }
            for l in dec.layers
        ]),
        "dec_ln": _ln(dec.layer_norm),
    }
    return params, cfg
