"""Time-minor whisper cache parity: [L,B,H,Dh,T] storage must be
numerically identical to the canonical [L,B,H,T,Dh] path.

Why the layout exists: head_dim=64 as the minor dim pads 2x on TPU tiling
(measured OOM dump, PERF.md round 4); time-minor storage removes ~3.5 GB
of padding at serving dims.  Reference counterpart for the decode path:
ctranslate2's int8 whisper decode (``Cluster/InfernSTTWorker.py:36``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infernos_tpu.models import presets, whisper as wsp

CFG = presets.WHISPER_TINY_TEST
B, TMAX, S, K = 4, 12, 10, 5


def _enc_and_caches(cross_int8):
    k = jax.random.PRNGKey(0)
    params = wsp.init_params(k, CFG)
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, S, CFG.d_model))
    can = wsp.init_cache(CFG, B, TMAX, S, cross_int8=cross_int8)
    tm = wsp.init_cache(CFG, B, TMAX, S, cross_int8=cross_int8,
                        time_minor=True)
    can = wsp.fill_cross_kv(params, CFG, can, enc)
    tm = wsp.fill_cross_kv(params, CFG, tm, enc, time_minor=True)
    # seed self caches with the same prefix state
    pre_k = jax.random.normal(jax.random.PRNGKey(2), can.self_k.shape)
    pre_v = jax.random.normal(jax.random.PRNGKey(3), can.self_v.shape)
    can = can._replace(self_k=pre_k, self_v=pre_v)
    tm = tm._replace(self_k=jnp.swapaxes(pre_k, -1, -2),
                     self_v=jnp.swapaxes(pre_v, -1, -2))
    return params, can, tm


@pytest.mark.parametrize("cross_int8", [False, True])
def test_decode_step_time_minor_parity(cross_int8):
    params, can, tm = _enc_and_caches(cross_int8)
    pos = jnp.asarray([3, 5, 0, 7], jnp.int32)
    tok = jnp.asarray([1, 2, 3, 4], jnp.int32)
    mask = jnp.arange(S)[None, :] < jnp.asarray([S, S - 2, 4, S])[:, None]
    lc, can2 = wsp.decode_step(params, CFG, tok, can, pos, enc_mask=mask)
    lt, tm2 = wsp.decode_step(params, CFG, tok, tm, pos, enc_mask=mask,
                              time_minor=True)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lt),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(can2.self_k),
                               np.asarray(jnp.swapaxes(tm2.self_k, -1, -2)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("cross_int8", [False, True])
def test_ring_decode_time_minor_parity(cross_int8):
    """K-step ring dispatch (the serving path) matches canonical exactly:
    same logits every step, same merged cache."""
    params, can, tm = _enc_and_caches(cross_int8)
    pos0 = jnp.asarray([3, 5, 0, 7], jnp.int32)
    tok0 = jnp.asarray([1, 2, 3, 4], jnp.int32)
    mask = jnp.ones((B, S), bool)

    def run(cache, time_minor):
        ring_k, ring_v = wsp.init_ring(CFG, B, K, cache.self_k.dtype,
                                       time_minor=time_minor)
        pos, tok = pos0, tok0
        done = jnp.zeros((B,), bool)
        logits_all, wposs = [], []
        for i in range(K):
            logits, ring_k, ring_v = wsp.decode_step_ring(
                params, CFG, tok, cache, ring_k, ring_v, pos0, pos,
                jnp.int32(i), enc_mask=mask, time_minor=time_minor)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            new_done = jnp.logical_or(done, nxt == CFG.eos_token_id)
            wposs.append(jnp.where(done, TMAX, pos))
            pos = jnp.where(done, pos, pos + 1)
            tok = jnp.where(new_done, tok, nxt)
            done = new_done
            logits_all.append(logits)
        cache = wsp.merge_ring(cache, ring_k, ring_v,
                               jnp.stack(wposs, 1), time_minor=time_minor)
        return jnp.stack(logits_all), cache

    lc, can2 = run(can, False)
    lt, tm2 = run(tm, True)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lt),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(can2.self_k),
                               np.asarray(jnp.swapaxes(tm2.self_k, -1, -2)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(can2.self_v),
                               np.asarray(jnp.swapaxes(tm2.self_v, -1, -2)),
                               rtol=1e-6, atol=1e-6)
