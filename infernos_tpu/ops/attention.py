"""Pallas TPU attention kernel for the encoder hot path.

The Whisper encoder is the FLOPs-heavy stage of STT serving (32 layers x
S=1500 at large-v3).  This kernel computes one q-block against the full K/V
per (batch*head) program: at telephony sequence lengths (S <= ~2k,
Dh = 64) K, V and the logits block all fit VMEM, so the simple
block-q/full-kv schedule is optimal -- no online-softmax passes, one MXU
matmul chain per block, fp32 accumulation.

Falls back to a pure-XLA computation (same math) off-TPU or when shapes
don't tile; ``tests/test_ops.py`` checks kernel-vs-XLA parity in interpreter
mode.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # [BQ, Dh]
    k = k_ref[0].astype(jnp.float32)  # [S, Dh]
    v = v_ref[0]  # [S, Dh]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [BQ, S]
    mask = mask_ref[0]  # [1, S] float32 additive
    logits = logits + mask
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        w, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _pallas_attention(q, k, v, mask_add, *, block_q: int, interpret: bool):
    """q,k,v: [BH, S, Dh]; mask_add: [BH, S] additive fp32."""
    BH, S, Dh = q.shape
    scale = Dh**-0.5
    grid = (BH, S // block_q)
    kernel = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, S, Dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, S, Dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, S, Dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(q, k, v, mask_add[:, None, :])


def _xla_attention(q, k, v, mask_add):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    logits = logits + mask_add[:, None, :]
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", w, v)


# Reverse-mode AD support: the kernel is forward-only, so differentiate via
# the mathematically identical XLA computation (recompute-in-backward).
# In-repo training (tools/train_tiny_stt.py) backprops through the encoder;
# serving never takes this path.
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _pallas_attention_ad(q, k, v, mask_add, block_q, interpret):
    return _pallas_attention(q, k, v, mask_add, block_q=block_q,
                             interpret=interpret)


def _pallas_attention_fwd(q, k, v, mask_add, block_q, interpret):
    out = _pallas_attention(q, k, v, mask_add, block_q=block_q,
                            interpret=interpret)
    return out, (q, k, v, mask_add)


def _pallas_attention_bwd(block_q, interpret, res, g):
    q, k, v, mask_add = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, mask_add),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(mask_add)


_pallas_attention_ad.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def fused_attention(q, k, v, *, n_heads: int, mask: Optional[jnp.ndarray] = None,
                    block_q: int = 128, use_pallas: Optional[bool] = None,
                    interpret: bool = False):
    """Multi-head self-attention on pre-projected tensors.

    q/k/v: ``[B, S, D]`` (D = n_heads * head_dim); mask: ``[B, S]`` bool
    (True = valid) or None.  Returns ``[B, S, D]``.
    """
    B, S, D = q.shape
    Dh = D // n_heads

    def split(x):
        return (x.reshape(B, S, n_heads, Dh).transpose(0, 2, 1, 3)
                .reshape(B * n_heads, S, Dh))

    qs, ks, vs = split(q), split(k), split(v)
    if mask is None:
        mask_add = jnp.zeros((B, S), jnp.float32)
    else:
        mask_add = jnp.where(mask.astype(bool), 0.0, NEG_INF).astype(jnp.float32)
    mask_bh = jnp.repeat(mask_add, n_heads, axis=0)

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        # pad S up to a block_q multiple so the kernel tiles at any bucket
        # length (production buckets 400/800/1500/1600 are never 128-aligned;
        # padded key columns are masked, padded query rows sliced off)
        S_pad = -(-S // block_q) * block_q
        if S_pad != S:
            pad = S_pad - S
            qs = jnp.pad(qs, ((0, 0), (0, pad), (0, 0)))
            ks = jnp.pad(ks, ((0, 0), (0, pad), (0, 0)))
            vs = jnp.pad(vs, ((0, 0), (0, pad), (0, 0)))
            mask_bh = jnp.pad(mask_bh, ((0, 0), (0, pad)),
                              constant_values=NEG_INF)
        out = _pallas_attention_ad(qs, ks, vs, mask_bh, block_q,
                                   interpret)[:, :S]
    else:
        out = _xla_attention(qs, ks, vs, mask_bh)
    return (out.reshape(B, n_heads, S, Dh).transpose(0, 2, 1, 3)
            .reshape(B, S, D))
