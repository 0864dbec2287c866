"""Qwen2-class decoder-only LLM in functional JAX with tensor parallelism.

Capability parity: the reference serves ``Qwen/Qwen2.5-14B-Instruct`` 4-bit
through ipex-llm on one GPU (``Cluster/InfernLLMWorker.py:64-101``).  Here
the 14B model is the one place real model parallelism enters (SURVEY.md
section 2.9): weights carry ``PartitionSpec`` annotations over a ``tp`` mesh
axis -- attention heads and MLP intermediate shard across ICI, XLA inserts
the all-reduces (no hand-written collectives).

Architecture/numerics follow HF ``Qwen2ForCausalLM`` exactly (RMSNorm in
fp32, rotate-half RoPE, GQA, SwiGLU, qkv bias) so checkpoints port via
:func:`port_from_hf` -- golden-tested against a random-init HF model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from . import layers as L


@dataclasses.dataclass(frozen=True)
class QwenConfig:
    vocab_size: int = 152064
    hidden_size: int = 5120
    num_layers: int = 48
    num_heads: int = 40
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 13824
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    max_positions: int = 32768
    eos_token_id: int = 151645  # <|im_end|>
    tie_word_embeddings: bool = False


# -- init ---------------------------------------------------------------------

def _layer_init(key, cfg: QwenConfig):
    ks = jax.random.split(key, 7)
    D, Hd = cfg.hidden_size, cfg.head_dim
    return {
        "ln1": {"g": jnp.ones((D,), jnp.float32)},
        "q": L.linear_init(ks[0], D, cfg.num_heads * Hd, bias=True),
        "k": L.linear_init(ks[1], D, cfg.num_kv_heads * Hd, bias=True),
        "v": L.linear_init(ks[2], D, cfg.num_kv_heads * Hd, bias=True),
        "o": L.linear_init(ks[3], cfg.num_heads * Hd, D, bias=False),
        "ln2": {"g": jnp.ones((D,), jnp.float32)},
        "gate": L.linear_init(ks[4], D, cfg.intermediate_size, bias=False),
        "up": L.linear_init(ks[5], D, cfg.intermediate_size, bias=False),
        "down": L.linear_init(ks[6], cfg.intermediate_size, D, bias=False),
    }


def stack_layers(layers):
    """Per-layer pytrees -> one pytree with a leading layer dim (the model
    runs as ``lax.scan`` over layers: one traced layer body instead of 48
    unrolled copies -- order-of-magnitude faster trace/compile at 14B)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def init_params(key, cfg: QwenConfig) -> Dict[str, Any]:
    ks = list(jax.random.split(key, 3 + cfg.num_layers))
    nk = ks.pop
    p = {
        "embed": {"w": 0.02 * jax.random.normal(nk(), (cfg.vocab_size, cfg.hidden_size))},
        "layers": stack_layers([_layer_init(nk(), cfg)
                                for _ in range(cfg.num_layers)]),
        "ln_f": {"g": jnp.ones((cfg.hidden_size,), jnp.float32)},
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = {"w": 0.02 * jax.random.normal(nk(), (cfg.hidden_size, cfg.vocab_size))}
    return p


def param_shardings(cfg: QwenConfig, tp_axis: str = "tp") -> Dict[str, Any]:
    """PartitionSpec pytree matching :func:`init_params` layout.

    Column-parallel q/k/v/gate/up (output dim sharded), row-parallel o/down
    (input dim sharded): one all-reduce per attention and per MLP, riding ICI.
    """
    # layer-stacked weights carry a leading (unsharded) layer dim
    col = {"w": P(None, None, tp_axis), "b": P(None, tp_axis)}
    colnb = {"w": P(None, None, tp_axis)}
    row = {"w": P(None, tp_axis, None)}
    rep1 = {"g": P(None)}
    layer = {
        "ln1": {"g": P(None, None)}, "q": col, "k": col, "v": col, "o": row,
        "ln2": {"g": P(None, None)}, "gate": colnb, "up": colnb, "down": row,
    }
    out = {
        "embed": {"w": P(None, None)},
        "layers": layer,
        "ln_f": rep1,
    }
    if not cfg.tie_word_embeddings:
        out["lm_head"] = {"w": P(None, tp_axis)}
    return out


# -- core ops ------------------------------------------------------------------

def rms_norm(x, p, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (p["g"] * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype))


def _rope_tables(cfg: QwenConfig, positions):
    """positions [...,] -> (cos, sin) [..., head_dim]."""
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2) / cfg.head_dim))
    freqs = positions[..., None].astype(jnp.float32) * jnp.asarray(inv)[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(x, cos, sin):
    """x [B, H, T, Dh]; cos/sin [B, T, Dh].  Computed in f32 (rotation
    accuracy) and cast back so bf16 caches stay bf16."""
    cos = cos[:, None]
    sin = sin[:, None]
    xf = x.astype(jnp.float32)
    return (xf * cos + _rotate_half(xf) * sin).astype(x.dtype)


class QwenCache(NamedTuple):
    k: jnp.ndarray  # [L, B, Hkv, Tmax, Dh]
    v: jnp.ndarray


def init_cache(cfg: QwenConfig, batch: int, max_len: int, dtype=jnp.float32) -> QwenCache:
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    return QwenCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def cache_shardings(cfg: QwenConfig, tp_axis: str = "tp") -> QwenCache:
    return QwenCache(P(None, None, tp_axis), P(None, None, tp_axis))


def _attn_full(lp, cfg, x, positions, mask):
    """Full-sequence GQA attention (prefill); returns (out, k, v)."""
    B, T, D = x.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = L.linear(x, lp["q"]).reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
    k = L.linear(x, lp["k"]).reshape(B, T, Hkv, Dh).transpose(0, 2, 1, 3)
    v = L.linear(x, lp["v"]).reshape(B, T, Hkv, Dh).transpose(0, 2, 1, 3)
    cos, sin = _rope_tables(cfg, positions)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    rep = H // Hkv
    # grouped GQA einsums: contract each kv head against its `rep` query
    # heads directly instead of materializing a repeated K/V
    qg = q.reshape(B, Hkv, rep, T, Dh)
    logits = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k) * (Dh**-0.5)
    logits = logits + mask[:, :, None]  # additive [B|1, 1, Tq, Tk] -> group bcast
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bgrqk,bgkd->bgrqd", w, v)
    out = out.reshape(B, H, T, Dh).transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
    return L.linear(out, lp["o"]), k, v


def _mlp(lp, x):
    return L.linear(jax.nn.silu(L.linear(x, lp["gate"])) * L.linear(x, lp["up"]),
                    lp["down"])


def prefill(params, cfg: QwenConfig, tokens, pos_offset=None):
    """Teacher-forced pass over [B, T] tokens.

    Returns (logits [B, T, V], k-stack, v-stack [L, B, Hkv, T, Dh]).
    ``pos_offset`` [B] shifts positions for continued sequences.
    """
    B, T = tokens.shape
    x = params["embed"]["w"][tokens]
    if pos_offset is None:
        pos_offset = jnp.zeros((B,), jnp.int32)
    positions = pos_offset[:, None] + jnp.arange(T)[None, :]
    mask = L.causal_bias(T)

    def body(x, lp):
        h, k, v = _attn_full(lp, cfg, rms_norm(x, lp["ln1"], cfg.rms_norm_eps),
                             positions, mask)
        x = x + h
        x = x + _mlp(lp, rms_norm(x, lp["ln2"], cfg.rms_norm_eps))
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["ln_f"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:
        logits = jnp.einsum("btd,vd->btv", x, params["embed"]["w"])
    else:
        logits = jnp.einsum("btd,dv->btv", x, head["w"])
    return logits, ks, vs


def decode_step(params, cfg: QwenConfig, tokens, cache: QwenCache, pos):
    """One token for all slots: tokens [B], pos [B] -> (logits [B, V], cache).

    Slot-batched: every slot carries its own position; cache writes land at
    per-slot offsets (continuous batching, same pattern as the TTS/STT
    engines)."""
    B = tokens.shape[0]
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = H // Hkv
    x = params["embed"]["w"][tokens][:, None, :]  # [B, 1, D]
    cos, sin = _rope_tables(cfg, pos[:, None])  # [B, 1, Dh]
    Tmax = cache.k.shape[3]
    valid = jnp.arange(Tmax)[None, None, None, :] <= pos[:, None, None, None]

    def upd(c, n, p):  # c [Hkv, Tmax, Dh], n [Hkv, 1, Dh]
        return jax.lax.dynamic_update_slice_in_dim(c, n, p, axis=1)

    def body(x, layer):
        lp, k_l, v_l = layer
        h_in = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        q = L.linear(h_in, lp["q"]).reshape(B, 1, H, Dh).transpose(0, 2, 1, 3)
        k = L.linear(h_in, lp["k"]).reshape(B, 1, Hkv, Dh).transpose(0, 2, 1, 3)
        v = L.linear(h_in, lp["v"]).reshape(B, 1, Hkv, Dh).transpose(0, 2, 1, 3)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        k_c = jax.vmap(upd)(k_l, k, pos)
        v_c = jax.vmap(upd)(v_l, v, pos)
        # grouped GQA einsums: no repeated-cache materialization (see
        # decode_step_ring)
        qg = q.reshape(B, Hkv, rep, 1, Dh)
        logits = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k_c) * (Dh**-0.5)
        logits = jnp.where(valid[:, :, None], logits, L.NEG_INF)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", w, v_c)
        out = out.reshape(B, H, 1, Dh).transpose(0, 2, 1, 3).reshape(B, 1, H * Dh)
        x = x + L.linear(out, lp["o"])
        x = x + _mlp(lp, rms_norm(x, lp["ln2"], cfg.rms_norm_eps))
        return x, (k_c, v_c)

    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    cache = QwenCache(ks, vs)
    x = rms_norm(x, params["ln_f"], cfg.rms_norm_eps)[:, 0]
    head = params.get("lm_head")
    if head is None:
        logits = jnp.einsum("bd,vd->bv", x, params["embed"]["w"])
    else:
        logits = jnp.einsum("bd,dv->bv", x, head["w"])
    return logits, cache


def init_ring(cfg: QwenConfig, batch: int, k_steps: int, dtype):
    """Per-dispatch K/V ring for :func:`decode_step_ring`:
    ``[L, B, Hkv, K, Dh]`` zeros (pair)."""
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, k_steps, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def decode_step_ring(params, cfg: QwenConfig, tokens, cache: QwenCache,
                     ring_k, ring_v, pos0, pos, step_i, unroll: int = 1):
    """One decode step writing K/V to the dispatch ring, not the cache.

    Same rationale as ``whisper.decode_step_ring``: the per-slot cache
    scatter forces a full-cache copy every scan iteration; the ring write
    is a uniform-index in-place update, merged once per dispatch via
    :func:`merge_ring`.  The big cache is loop-invariant during the
    enclosing scan.  ``pos0`` [B]: positions at dispatch entry.
    Returns (logits [B, V], ring_k, ring_v).
    """
    B = tokens.shape[0]
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = H // Hkv
    x = params["embed"]["w"][tokens][:, None, :]  # [B, 1, D]
    cos, sin = _rope_tables(cfg, pos[:, None])  # [B, 1, Dh]
    Tmax = cache.k.shape[3]
    K = ring_k.shape[3]
    valid = jnp.arange(Tmax)[None, None, None, :] < pos0[:, None, None, None]
    # <= step_i: ring[step_i] is the current column (written in the body)
    rvalid = (jnp.arange(K) <= step_i)[None, None, None, :]

    def body(x, layer):
        lp, k_l, v_l, rk_l, rv_l = layer
        h_in = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        q = L.linear(h_in, lp["q"]).reshape(B, 1, H, Dh).transpose(0, 2, 1, 3)
        k = L.linear(h_in, lp["k"]).reshape(B, 1, Hkv, Dh).transpose(0, 2, 1, 3)
        v = L.linear(h_in, lp["v"]).reshape(B, 1, Hkv, Dh).transpose(0, 2, 1, 3)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)  # [B, Hkv, 1, Dh]
        rk_l = jax.lax.dynamic_update_slice_in_dim(rk_l, k, step_i, axis=2)
        rv_l = jax.lax.dynamic_update_slice_in_dim(rv_l, v, step_i, axis=2)
        # GQA WITHOUT jnp.repeat: repeating the KV cache to H heads
        # materializes a rep-times cache copy per layer per step (7x at
        # 7B dims -- dominant decode traffic); grouped einsums read the
        # [B, Hkv, T, Dh] cache directly, each kv head serving its `rep`
        # query heads inside the contraction
        qg = q.reshape(B, Hkv, rep, 1, Dh)
        scale = Dh**-0.5
        big = jnp.where(valid[:, :, None],
                        jnp.einsum("bgrqd,bgkd->bgrqk", qg, k_l) * scale,
                        L.NEG_INF)
        ring = jnp.where(rvalid[:, :, None],
                         jnp.einsum("bgrqd,bgkd->bgrqk", qg, rk_l) * scale,
                         L.NEG_INF)
        logits = jnp.concatenate([big, ring], axis=-1)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (jnp.einsum("bgrqk,bgkd->bgrqd", w[..., :Tmax], v_l)
               + jnp.einsum("bgrqk,bgkd->bgrqd", w[..., Tmax:], rv_l))
        out = out.reshape(B, H, 1, Dh).transpose(0, 2, 1, 3).reshape(B, 1, H * Dh)
        x = x + L.linear(out, lp["o"])
        x = x + _mlp(lp, rms_norm(x, lp["ln2"], cfg.rms_norm_eps))
        return x, (rk_l, rv_l)

    # unroll=num_layers turns the per-layer dynamic weight slices into
    # static ones (no slice-copy materialization; measured 1.31x on the
    # isolated int8 matmul chain, PERF.md round 4)
    x, (rks, rvs) = jax.lax.scan(
        body, x, (params["layers"], cache.k, cache.v, ring_k, ring_v),
        unroll=unroll)
    x = rms_norm(x, params["ln_f"], cfg.rms_norm_eps)[:, 0]
    head = params.get("lm_head")
    if head is None:
        logits = jnp.einsum("bd,vd->bv", x, params["embed"]["w"])
    else:
        logits = jnp.einsum("bd,dv->bv", x, head["w"])
    return logits, rks, rvs


def merge_ring(cache: QwenCache, ring_k, ring_v, tpos) -> QwenCache:
    """Scatter a dispatch's ring columns into the cache once (tpos [B, K];
    entries >= Tmax dropped -- see ``layers.merge_kv_ring``)."""
    return QwenCache(L.merge_kv_ring(cache.k, ring_k, tpos),
                     L.merge_kv_ring(cache.v, ring_v, tpos))


def verify_steps(params, cfg: QwenConfig, tokens, cache: QwenCache, pos):
    """K-token speculative-verify pass: tokens [B, K], pos [B].

    Token j of each slot lands at position ``pos+j`` (KV written there) and
    its query attends to cache positions ``<= pos+j`` -- a causal
    mini-prefill against the live cache.  Returns (logits [B, K, V], cache).
    Decode is weight/cache-bandwidth bound, so verifying K drafted tokens
    costs about one decode step of HBM traffic: accepted tokens are nearly
    free (the speculative-decode win; reference rides plain
    ``model.generate``, Cluster/InfernLLMWorker.py:112-118).
    """
    B, K = tokens.shape
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rep = H // Hkv
    x = params["embed"]["w"][tokens]  # [B, K, D]
    positions = pos[:, None] + jnp.arange(K)[None, :]  # [B, K]
    cos, sin = _rope_tables(cfg, positions)  # [B, K, Dh]
    Tmax = cache.k.shape[3]
    kpos = jnp.arange(Tmax)
    # [B, 1, K, Tmax]: query j sees kv positions <= pos+j
    valid = kpos[None, None, None, :] <= positions[:, None, :, None]

    def upd(c, n, p):  # c [Hkv, Tmax, Dh], n [Hkv, K, Dh]
        return jax.lax.dynamic_update_slice_in_dim(c, n, p, axis=1)

    def body(x, layer):
        lp, k_l, v_l = layer
        h_in = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        q = L.linear(h_in, lp["q"]).reshape(B, K, H, Dh).transpose(0, 2, 1, 3)
        k = L.linear(h_in, lp["k"]).reshape(B, K, Hkv, Dh).transpose(0, 2, 1, 3)
        v = L.linear(h_in, lp["v"]).reshape(B, K, Hkv, Dh).transpose(0, 2, 1, 3)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        k_c = jax.vmap(upd)(k_l, k, pos)
        v_c = jax.vmap(upd)(v_l, v, pos)
        # grouped GQA einsums: no repeated-cache materialization (see
        # decode_step_ring)
        qg = q.reshape(B, Hkv, rep, K, Dh)
        logits = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k_c) * (Dh**-0.5)
        logits = jnp.where(valid[:, :, None], logits, L.NEG_INF)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", w, v_c)
        out = out.reshape(B, H, K, Dh).transpose(0, 2, 1, 3).reshape(B, K, H * Dh)
        x = x + L.linear(out, lp["o"])
        x = x + _mlp(lp, rms_norm(x, lp["ln2"], cfg.rms_norm_eps))
        return x, (k_c, v_c)

    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
    cache = QwenCache(ks, vs)
    x = rms_norm(x, params["ln_f"], cfg.rms_norm_eps)  # [B, K, D]
    head = params.get("lm_head")
    if head is None:
        logits = jnp.einsum("bkd,vd->bkv", x, params["embed"]["w"])
    else:
        logits = jnp.einsum("bkd,dv->bkv", x, head["w"])
    return logits, cache


# -- HF weight porting ---------------------------------------------------------

def _t(x):
    return jnp.asarray(np.asarray(x.detach().cpu().float().numpy()))


def _lin(mod):
    p = {"w": _t(mod.weight).T}
    if getattr(mod, "bias", None) is not None:
        p["b"] = _t(mod.bias)
    return p


def port_from_hf(model) -> Tuple[Dict[str, Any], QwenConfig]:
    """Port ``transformers.Qwen2ForCausalLM`` weights."""
    hc = model.config
    cfg = QwenConfig(
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_layers=hc.num_hidden_layers,
        num_heads=hc.num_attention_heads,
        num_kv_heads=hc.num_key_value_heads,
        head_dim=getattr(hc, "head_dim", None) or hc.hidden_size // hc.num_attention_heads,
        intermediate_size=hc.intermediate_size,
        rms_norm_eps=hc.rms_norm_eps,
        rope_theta=hc.rope_theta,
        max_positions=hc.max_position_embeddings,
        eos_token_id=(hc.eos_token_id if isinstance(hc.eos_token_id, int)
                      else (hc.eos_token_id or [QwenConfig.eos_token_id])[0]),
        tie_word_embeddings=hc.tie_word_embeddings,
    )
    m = model.model
    params: Dict[str, Any] = {
        "embed": {"w": _t(m.embed_tokens.weight)},
        "layers": stack_layers([
            {
                "ln1": {"g": _t(l.input_layernorm.weight)},
                "q": _lin(l.self_attn.q_proj),
                "k": _lin(l.self_attn.k_proj),
                "v": _lin(l.self_attn.v_proj),
                "o": _lin(l.self_attn.o_proj),
                "ln2": {"g": _t(l.post_attention_layernorm.weight)},
                "gate": _lin(l.mlp.gate_proj),
                "up": _lin(l.mlp.up_proj),
                "down": _lin(l.mlp.down_proj),
            }
            for l in m.layers
        ]),
        "ln_f": {"g": _t(m.norm.weight)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"w": _t(model.lm_head.weight).T}
    return params, cfg
