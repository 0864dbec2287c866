"""Pallas fused TTS decoder-step kernel (VERDICT r2 item 3).

The TTS AR chain is ~97% of the serving tick and runs ~10x over its
weight-bandwidth floor as plain XLA: each decoder step is ~90 small ops
([B,768]x[768,768] matmuls, single-query attentions, LNs) whose fixed
per-op and HBM-latency overheads dominate at slot-batch sizes
(PERF.md round-2 profile; the 1.07x qkv-fusion negative result showed the
overhead is spread across the whole step graph, so only whole-step fusion
helps).  This kernel runs ONE grid step per decoder layer and performs the
complete layer -- self-attention over the KV cache (chunk-streamed from
HBM with online softmax, dead chunks skipped at runtime), cross-attention
over the precomputed encoder K/V, and the FFN -- with weights DMA'd once
per layer into reused VMEM buffers.

Mosaic-lowering constraints shaped the design (all measured on v5e):
- no lane-dim shape casts: attention runs PER HEAD with pre-split weights
  (all six projections stored [L, H, Dh, D]: projection matmuls contract
  on the minor D axis, and per-head output products are accumulated, so
  heads never concatenate);
- any manually-DMA'd HBM array must have a 128-multiple minor dim
  (`tpu.memref_slice` alignment), so the KV caches are TIME-MINOR:
  `[L, B, H, Dh, T]` with T padded to the 128-chunk grid -- every DMA
  slice is then tile-aligned (the canonical `[L, B, H, T, Dh=64]` layout
  cannot be chunk-DMA'd at all);
- neither ``erf`` nor ``erfc`` lowers: exact GELU uses the A-S 7.1.26
  rational erf (6.6e-7 max diff, elementary ops only);
- self- and cross-cache dtypes may differ: separate streaming buffers
  (DMA requires matching element types).

Replaces ``models.speecht5.decode_step``'s layer scan for serving; the
XLA path remains the oracle (``tests/test_tts_fused_step.py`` checks
parity in interpreter mode).  Cache WRITES stay in XLA (vmapped
dynamic-update at per-slot ``pos``): the kernel returns each layer's new
K/V row and attends to the current token directly, which is equivalent to
reading the just-written cache row.

Reference behavior being accelerated: the reference's per-step decoder
loop ``HelloSippyTTSRT/HelloSippyRTPipe.py:191-259``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7): Pallas TPU
    lowering implements neither ``erf`` nor ``erfc``, so exact GELU is
    computed from elementary ops (f32 indistinguishable from lax.erf)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(h):
    return 0.5 * h * (1.0 + _erf(h * 0.7071067811865476))


def _layer_kernel(  # noqa: C901 (one kernel = one layer, intentionally big)
    # scalar-prefetch
    maxpos_ref,            # SMEM [1] int32: max(pos)+1 over active slots
    # inputs
    x0_ref,                # VMEM [B, D] f32 (prenet output)
    pos_ref,               # VMEM [B, 1] int32 per-slot write position
    encb_ref,              # VMEM [Nc, B, chunk] f32 chunked cross bias
    sqw_ref, skw_ref, svw_ref,  # ANY [L, H, Dh, D]
    sow_ref,               # ANY [L, H, Dh, D]
    cqw_ref,               # ANY [L, H, Dh, D]
    cow_ref,               # ANY [L, H, Dh, D]
    w1_ref,                # ANY [L, D, F]
    w2_ref,                # ANY [L, F, D]
    smalls_ref,            # VMEM [L, 9, D] f32 (D-wide biases + LN params)
    headb_ref,             # VMEM [L, 4, H, Dh] f32 (sq, sk, sv, cq biases)
    b1_ref,                # VMEM [L, F] f32
    selfk_ref, selfv_ref,  # ANY [L, B, H, Dh, Tpad] (time-minor)
    crossk_ref, crossv_ref,  # ANY [L, B, H, Dh, Spad] (time-minor)
    # outputs
    xout_ref,              # VMEM [B, D] f32
    knew_ref, vnew_ref,    # VMEM [L_block=1, H, B, Dh]
    # scratch
    x_scr,                 # VMEM [B, D] f32 (carried hidden)
    *,
    n_heads: int,
    chunk: int,
    eps: float,
    self_dtype,
    cross_dtype,
):
    l = pl.program_id(0)
    B, D = x_scr.shape
    H = n_heads
    Dh = D // H
    F = b1_ref.shape[1]
    S = crossk_ref.shape[4]
    Tmax = selfk_ref.shape[4]
    assert Tmax % chunk == 0 and S % chunk == 0
    scale = Dh ** -0.5

    @pl.when(l == 0)
    def _():
        x_scr[:] = x0_ref[:]

    sm = smalls_ref[l]   # [9, D] f32
    hb = headb_ref[l]    # [4, H, Dh] f32
    (BSO, BCO, B2, LN1G, LN1B, LN2G, LN2B, LN3G, LN3B) = range(9)
    (HQ, HK, HV, HCQ) = range(4)

    def ln(x, gi, bi):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * sm[gi][None, :] \
            + sm[bi][None, :]

    def matmul_t(x, w_ref_vmem):
        """x [B, D] x w [Dh, D] -> [B, Dh] (contract on minor D)."""
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w_ref_vmem[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def matmul(x, w_ref_vmem):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w_ref_vmem[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---------------- phase A: self-attention + cross-attention -------------
    def attn_phase(wq, wk, wv, wo, wcq, wco, kcb, vcb, ckb, cvb,
                   acc, mrow, drow, hacc, sems):
        # wq..wco: [H, Dh, D] bf16
        # kcb/vcb, ckb/cvb: [B, Dh, chunk] per-head streaming buffers in
        # the self-/cross-cache dtypes (DMA requires matching elem types)
        # acc: [B, Dh] f32; mrow/drow: [B, 1] f32; hacc: [B, D] f32
        wdmas = [pltpu.make_async_copy(ref.at[l], buf, sems.at[i])
                 for i, (ref, buf) in enumerate((
                     (sqw_ref, wq), (skw_ref, wk), (svw_ref, wv),
                     (sow_ref, wo), (cqw_ref, wcq), (cow_ref, wco)))]
        for d in wdmas:
            d.start()
        for d in wdmas:
            d.wait()
        x = x_scr[:]
        maxpos = maxpos_ref[0]
        posv = pos_ref[:]  # [B, 1] int32

        n_chunks = Tmax // chunk
        hacc[:] = jnp.zeros((B, D), jnp.float32)
        for h in range(H):
            q_h = (matmul_t(x, wq.at[h]) + hb[HQ, h][None, :]) * scale
            k_h = matmul_t(x, wk.at[h]) + hb[HK, h][None, :]
            v_h = matmul_t(x, wv.at[h]) + hb[HV, h][None, :]
            knew_ref[0, h] = k_h.astype(knew_ref.dtype)
            vnew_ref[0, h] = v_h.astype(vnew_ref.dtype)

            mrow[:] = jnp.full((B, 1), NEG_INF, jnp.float32)
            drow[:] = jnp.zeros((B, 1), jnp.float32)
            acc[:] = jnp.zeros((B, Dh), jnp.float32)

            for c in range(n_chunks):
                @pl.when(c * chunk < maxpos)
                def _(c=c, q_h=q_h):
                    kd = pltpu.make_async_copy(
                        selfk_ref.at[l, :, h, :, pl.ds(c * chunk, chunk)],
                        kcb, sems.at[6])
                    vd = pltpu.make_async_copy(
                        selfv_ref.at[l, :, h, :, pl.ds(c * chunk, chunk)],
                        vcb, sems.at[7])
                    kd.start()
                    vd.start()
                    kd.wait()
                    kc = kcb[:].astype(jnp.float32)  # [B, Dh, chunk]
                    scores = jnp.sum(q_h[:, :, None] * kc, axis=1)
                    kpos = (c * chunk
                            + jax.lax.broadcasted_iota(jnp.int32,
                                                       (B, chunk), 1))
                    valid = kpos < posv  # [B, chunk]
                    scores = jnp.where(valid, scores, NEG_INF)
                    m_new = jnp.maximum(
                        mrow[:], jnp.max(scores, axis=-1, keepdims=True))
                    alpha = jnp.exp(mrow[:] - m_new)  # [B, 1]
                    p = jnp.exp(scores - m_new)       # [B, chunk]
                    vd.wait()
                    vc = vcb[:].astype(jnp.float32)   # [B, Dh, chunk]
                    acc[:] = (acc[:] * alpha
                              + jnp.sum(p[:, None, :] * vc, axis=2))
                    drow[:] = drow[:] * alpha + jnp.sum(p, axis=-1,
                                                        keepdims=True)
                    mrow[:] = m_new

            # current token (the row the caller writes at pos)
            s_cur = jnp.sum(q_h * k_h, axis=-1, keepdims=True)  # [B, 1]
            m_new = jnp.maximum(mrow[:], s_cur)
            alpha = jnp.exp(mrow[:] - m_new)
            p_cur = jnp.exp(s_cur - m_new)
            out_h = (acc[:] * alpha + p_cur * v_h) \
                / (drow[:] * alpha + p_cur)
            hacc[:] = hacc[:] + matmul(out_h, wo.at[h])

        h_attn = hacc[:] + sm[BSO][None, :]
        x = ln(x + h_attn, LN1G, LN1B)

        # ---- cross attention (chunk-stream encoder K/V, reuse buffers) ----
        n_cchunks = S // chunk
        hacc[:] = jnp.zeros((B, D), jnp.float32)
        for h in range(H):
            qc_h = (matmul_t(x, wcq.at[h]) + hb[HCQ, h][None, :]) * scale
            mrow[:] = jnp.full((B, 1), NEG_INF, jnp.float32)
            drow[:] = jnp.zeros((B, 1), jnp.float32)
            acc[:] = jnp.zeros((B, Dh), jnp.float32)
            for c in range(n_cchunks):
                kd = pltpu.make_async_copy(
                    crossk_ref.at[l, :, h, :, pl.ds(c * chunk, chunk)],
                    ckb, sems.at[6])
                vd = pltpu.make_async_copy(
                    crossv_ref.at[l, :, h, :, pl.ds(c * chunk, chunk)],
                    cvb, sems.at[7])
                kd.start()
                vd.start()
                kd.wait()
                kc = ckb[:].astype(jnp.float32)
                scores = jnp.sum(qc_h[:, :, None] * kc, axis=1)
                scores = scores + encb_ref[c]  # [B, chunk], NEG_INF padded
                m_new = jnp.maximum(
                    mrow[:], jnp.max(scores, axis=-1, keepdims=True))
                alpha = jnp.exp(mrow[:] - m_new)
                p = jnp.exp(scores - m_new)
                vd.wait()
                vc = cvb[:].astype(jnp.float32)
                acc[:] = acc[:] * alpha + jnp.sum(p[:, None, :] * vc, axis=2)
                drow[:] = drow[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
                mrow[:] = m_new
            out_h = acc[:] / jnp.maximum(drow[:], 1e-20)
            hacc[:] = hacc[:] + matmul(out_h, wco.at[h])

        h_cross = hacc[:] + sm[BCO][None, :]
        x_scr[:] = ln(x + h_cross, LN2G, LN2B)

    pl.run_scoped(
        attn_phase,
        wq=pltpu.VMEM((n_heads, D // n_heads, D), jnp.bfloat16),
        wk=pltpu.VMEM((n_heads, D // n_heads, D), jnp.bfloat16),
        wv=pltpu.VMEM((n_heads, D // n_heads, D), jnp.bfloat16),
        wo=pltpu.VMEM((n_heads, D // n_heads, D), jnp.bfloat16),
        wcq=pltpu.VMEM((n_heads, D // n_heads, D), jnp.bfloat16),
        wco=pltpu.VMEM((n_heads, D // n_heads, D), jnp.bfloat16),
        kcb=pltpu.VMEM((B, D // n_heads, chunk), self_dtype),
        vcb=pltpu.VMEM((B, D // n_heads, chunk), self_dtype),
        ckb=pltpu.VMEM((B, D // n_heads, chunk), cross_dtype),
        cvb=pltpu.VMEM((B, D // n_heads, chunk), cross_dtype),
        acc=pltpu.VMEM((B, D // n_heads), jnp.float32),
        mrow=pltpu.VMEM((B, 1), jnp.float32),
        drow=pltpu.VMEM((B, 1), jnp.float32),
        hacc=pltpu.VMEM((B, D), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((8,)),
    )

    # ---------------- phase B: FFN ------------------------------------------
    def ffn_phase(w1b, w2b, sems):
        d1 = pltpu.make_async_copy(w1_ref.at[l], w1b, sems.at[0])
        d2 = pltpu.make_async_copy(w2_ref.at[l], w2b, sems.at[1])
        d1.start()
        d2.start()
        x = x_scr[:]
        d1.wait()
        hmid = matmul(x, w1b) + b1_ref[l][None, :]
        hmid = _gelu_exact(hmid)
        d2.wait()
        h = matmul(hmid, w2b) + sm[B2][None, :]
        x_scr[:] = ln(x + h, LN3G, LN3B)

    pl.run_scoped(
        ffn_phase,
        w1b=pltpu.VMEM((D, F), jnp.bfloat16),
        w2b=pltpu.VMEM((F, D), jnp.bfloat16),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )

    @pl.when(l == pl.num_programs(0) - 1)
    def _():
        xout_ref[:] = x_scr[:]


def pack_smalls(dec_layers, dtype=jnp.float32):
    """[L, 9, D] f32: D-wide biases (so, co, ffn.out) + LN g/b."""
    sa, ca = dec_layers["self_attn"], dec_layers["cross_attn"]
    rows = [sa["o"]["b"], ca["o"]["b"], dec_layers["ffn"]["out"]["b"],
            dec_layers["ln1"]["g"], dec_layers["ln1"]["b"],
            dec_layers["ln2"]["g"], dec_layers["ln2"]["b"],
            dec_layers["ln3"]["g"], dec_layers["ln3"]["b"]]
    return jnp.stack([r.astype(dtype) for r in rows], axis=1)  # [L, 9, D]


def pack_head_biases(dec_layers, n_heads: int, dtype=jnp.float32):
    """[L, 4, H, Dh] f32: per-head q/k/v (self) + q (cross) biases."""
    sa, ca = dec_layers["self_attn"], dec_layers["cross_attn"]
    L, D = sa["q"]["b"].shape
    rows = [sa["q"]["b"], sa["k"]["b"], sa["v"]["b"], ca["q"]["b"]]
    packed = jnp.stack([r.astype(dtype) for r in rows], axis=1)  # [L, 4, D]
    return packed.reshape(L, 4, n_heads, D // n_heads)


def _heads_t(w, n_heads):
    """[L, D_in, D_out] -> [L, H, Dh, D_in]: per-head, minor dim D_in
    (128-aligned) so the HBM slab can be DMA-sliced per layer."""
    L, Din, Dout = w.shape
    return w.reshape(L, Din, n_heads, Dout // n_heads).transpose(0, 2, 3, 1)


def _heads_o(w, n_heads):
    """[L, D_in, D_out] -> [L, H, Dh, D_out] for output projections (split
    the INPUT dim by head; minor dim D_out is 128-aligned)."""
    L, Din, Dout = w.shape
    return w.reshape(L, n_heads, Din // n_heads, Dout)


def to_time_minor(cache, chunk: int = 128):
    """Canonical [L,B,H,T,Dh] cache -> time-minor [L,B,H,Dh,Tpad]."""
    def tm(a):
        T = a.shape[3]
        pad = (-T) % chunk
        a = jnp.transpose(a, (0, 1, 2, 4, 3))
        if pad:
            a = jnp.pad(a, ((0, 0),) * 4 + ((0, pad),))
        return a

    return cache._replace(self_k=tm(cache.self_k), self_v=tm(cache.self_v),
                          cross_k=tm(cache.cross_k),
                          cross_v=tm(cache.cross_v))


def from_time_minor(cache, max_steps: int, enc_len: int):
    """Inverse of :func:`to_time_minor` (slices the chunk padding off)."""
    def cn(a, T):
        return jnp.transpose(a[..., :T], (0, 1, 2, 4, 3))

    return cache._replace(
        self_k=cn(cache.self_k, max_steps), self_v=cn(cache.self_v, max_steps),
        cross_k=cn(cache.cross_k, enc_len), cross_v=cn(cache.cross_v, enc_len))


def tm_init_cache(cfg, batch: int, max_steps: int, enc_len: int,
                  dtype=jnp.float32, chunk: int = 128):
    """Time-minor cache for fused serving (T/S padded to the chunk grid)."""
    from ..models import speecht5 as st5

    Lyr, H, Dh = cfg.decoder_layers, cfg.decoder_attention_heads, cfg.head_dim
    T = max_steps + ((-max_steps) % chunk)
    S = enc_len + ((-enc_len) % chunk)
    z = lambda t: jnp.zeros((Lyr, batch, H, Dh, t), dtype)
    return st5.DecoderCache(z(T), z(T), z(S), z(S))


def fused_decode_step(params, cfg, x, cache, pos, enc_mask=None, *,
                      chunk: int = 128, interpret: bool = False,
                      time_minor: bool = False
                      ) -> Tuple[jnp.ndarray, object]:
    """Drop-in for ``speecht5.decode_step`` (x: [B, 1, D]).

    Returns ([B, 1, D] hidden, updated cache).  ``time_minor=False``
    accepts/returns the canonical cache (transposing internally -- for
    tests and one-off use); the serving engine holds a
    :func:`tm_init_cache` cache and passes ``time_minor=True`` so no
    per-step transposition happens.  Cache K/V rows for the current
    position are written back in XLA (vmapped dynamic update at per-slot
    ``pos``), exactly like the oracle.
    """
    if not interpret:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except RuntimeError:
            interpret = True
    canonical = not time_minor
    if canonical:
        T_orig = cache.self_k.shape[3]
        S_orig = cache.cross_k.shape[3]
        cache = to_time_minor(cache, chunk)
    dl = params["dec_layers"]
    B = x.shape[0]
    D = x.shape[-1]
    H = cfg.decoder_attention_heads
    Dh = D // H
    Lyr = dl["ln1"]["g"].shape[0]

    smalls = pack_smalls(dl)
    headb = pack_head_biases(dl, H)
    b1 = dl["ffn"]["in"]["b"].astype(jnp.float32)  # [L, F]
    wdt = jnp.bfloat16

    x0 = x[:, 0, :].astype(jnp.float32)
    pos_in = pos.astype(jnp.int32)[:, None]
    maxpos = jnp.max(pos).astype(jnp.int32)[None]
    S_pad = cache.cross_k.shape[4]
    S_real = S_orig if canonical else (
        enc_mask.shape[1] if enc_mask is not None else S_pad)
    if enc_mask is not None:
        encbias = jnp.where(enc_mask.astype(bool), 0.0, NEG_INF
                            ).astype(jnp.float32)
    else:
        encbias = jnp.zeros((B, S_real), jnp.float32)
    # chunked [Nc, B, chunk] with NEG_INF padding: in-kernel lane slicing
    # of a [B, S] bias at non-tile offsets is not lowerable, a per-chunk
    # leading index is
    encb = jnp.pad(encbias, ((0, 0), (0, S_pad - S_real)),
                   constant_values=NEG_INF)
    encb = encb.reshape(B, S_pad // chunk, chunk).transpose(1, 0, 2)

    kernel = functools.partial(_layer_kernel, n_heads=H, chunk=chunk,
                               eps=cfg.layer_norm_eps,
                               self_dtype=cache.self_k.dtype,
                               cross_dtype=cache.cross_k.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Lyr,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # encb (chunked)
            pl.BlockSpec(memory_space=pl.ANY),    # sqw
            pl.BlockSpec(memory_space=pl.ANY),    # skw
            pl.BlockSpec(memory_space=pl.ANY),    # svw
            pl.BlockSpec(memory_space=pl.ANY),    # sow
            pl.BlockSpec(memory_space=pl.ANY),    # cqw
            pl.BlockSpec(memory_space=pl.ANY),    # cow
            pl.BlockSpec(memory_space=pl.ANY),    # w1
            pl.BlockSpec(memory_space=pl.ANY),    # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),   # smalls
            pl.BlockSpec(memory_space=pltpu.VMEM),   # headb
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1
            pl.BlockSpec(memory_space=pl.ANY),    # selfk
            pl.BlockSpec(memory_space=pl.ANY),    # selfv
            pl.BlockSpec(memory_space=pl.ANY),    # crossk
            pl.BlockSpec(memory_space=pl.ANY),    # crossv
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),                    # xout
            pl.BlockSpec((1, H, B, Dh), lambda l, *_: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),                     # knew
            pl.BlockSpec((1, H, B, Dh), lambda l, *_: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),                     # vnew
        ),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
    )

    sa, ca = dl["self_attn"], dl["cross_attn"]
    xout, knew, vnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((Lyr, H, B, Dh), cache.self_k.dtype),
            jax.ShapeDtypeStruct((Lyr, H, B, Dh), cache.self_v.dtype),
        ),
        interpret=interpret,
    )(maxpos, x0, pos_in, encb,
      _heads_t(sa["q"]["w"].astype(wdt), H),
      _heads_t(sa["k"]["w"].astype(wdt), H),
      _heads_t(sa["v"]["w"].astype(wdt), H),
      _heads_o(sa["o"]["w"].astype(wdt), H),
      _heads_t(ca["q"]["w"].astype(wdt), H),
      _heads_o(ca["o"]["w"].astype(wdt), H),
      dl["ffn"]["in"]["w"].astype(wdt), dl["ffn"]["out"]["w"].astype(wdt),
      smalls, headb, b1,
      cache.self_k, cache.self_v, cache.cross_k, cache.cross_v)

    # cache writes in XLA (per-slot pos; in-place under donation)
    knew_h = knew.transpose(0, 2, 1, 3)  # [L, B, H, Dh]
    vnew_h = vnew.transpose(0, 2, 1, 3)

    def upd(c, new):  # c [L,B,H,Dh,T], new [L,B,H,Dh]
        def one(cb, nb, p):  # [L,H,Dh,T], [L,H,Dh], scalar
            return jax.lax.dynamic_update_slice_in_dim(
                cb, nb[:, :, :, None], p, axis=3)
        return jax.vmap(one, in_axes=(1, 1, 0), out_axes=1)(c, new, pos)

    cache = cache._replace(self_k=upd(cache.self_k, knew_h),
                           self_v=upd(cache.self_v, vnew_h))
    if canonical:
        cache = from_time_minor(cache, T_orig, S_orig)
    return xout.astype(x.dtype)[:, None, :], cache
