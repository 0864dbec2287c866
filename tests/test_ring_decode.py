"""Ring-buffer K-step decode vs the per-step scatter oracle.

``decode_step``'s vmapped per-slot cache write lowers to a batch scatter
that XLA copy-insertion turns into a full-cache copy every scan step; the
engines instead scan ``decode_step_ring`` (uniform-index ring write) and
``merge_ring`` once per dispatch.  These tests prove the ring path is
numerically identical: same logits per step, same cache contents after
the merge, for slots at staggered positions and slots going EOS-done
mid-dispatch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infernos_tpu.models import qwen
from infernos_tpu.models import whisper as wsp

W_TINY = wsp.WhisperConfig(
    vocab_size=100, num_mel_bins=20, d_model=32, encoder_layers=1,
    encoder_attention_heads=2, decoder_layers=2, decoder_attention_heads=2,
    ffn_dim=64, max_source_positions=100, max_target_positions=64,
    eos_token_id=2, sot_token_id=3, no_speech_token_id=4)

Q_TINY = qwen.QwenConfig(
    vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=8, intermediate_size=64, rope_theta=10000.0,
    max_positions=256, eos_token_id=2, tie_word_embeddings=False)

B, K, TMAX, S = 4, 5, 32, 8


def _rand_whisper():
    params = wsp.init_params(jax.random.PRNGKey(0), W_TINY)
    cache = wsp.init_cache(W_TINY, B, TMAX, S)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    cache = cache._replace(
        self_k=0.1 * jax.random.normal(ks[0], cache.self_k.shape),
        self_v=0.1 * jax.random.normal(ks[1], cache.self_v.shape),
        cross_k=0.1 * jax.random.normal(ks[2], cache.cross_k.shape),
        cross_v=0.1 * jax.random.normal(ks[3], cache.cross_v.shape))
    return params, cache


@pytest.mark.parametrize("done0", [[False] * B, [False, True, False, True]])
def test_whisper_ring_matches_per_step(done0):
    params, cache = _rand_whisper()
    pos = jnp.asarray([1, 4, 9, 13], jnp.int32)
    tok = jnp.asarray([5, 6, 7, 8], jnp.int32)
    done = jnp.asarray(done0)
    enc_mask = jnp.ones((B, S), bool)

    # oracle: K sequential decode_steps with per-slot scatter writes,
    # greedy feedback, done slots frozen (engine semantics)
    c_ref, p_ref, t_ref, d_ref = cache, pos, tok, done
    ref_logits, ref_entry_done = [], []
    for _ in range(K):
        ref_entry_done.append(np.asarray(d_ref))
        lg, c_ref = wsp.decode_step(params, W_TINY, t_ref, c_ref, p_ref,
                                    enc_mask=enc_mask)
        ref_logits.append(lg)
        nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        new_done = jnp.logical_or(d_ref, nxt == W_TINY.eos_token_id)
        p_ref = jnp.where(d_ref, p_ref, p_ref + 1)
        t_ref = jnp.where(new_done, t_ref, nxt)
        d_ref = new_done

    # ring path: scan decode_step_ring, merge once
    ring_k, ring_v = wsp.init_ring(W_TINY, B, K)
    pos0 = pos

    def one(carry, step_i):
        ring_k, ring_v, p, t, d = carry
        lg, ring_k, ring_v = wsp.decode_step_ring(
            params, W_TINY, t, cache, ring_k, ring_v, pos0, p, step_i,
            enc_mask=enc_mask)
        nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        new_done = jnp.logical_or(d, nxt == W_TINY.eos_token_id)
        wpos = jnp.where(d, TMAX, p)
        p = jnp.where(d, p, p + 1)
        t = jnp.where(new_done, t, nxt)
        return (ring_k, ring_v, p, t, new_done), (lg, wpos)

    (ring_k, ring_v, p_r, t_r, d_r), (lgs, wposs) = jax.lax.scan(
        one, (ring_k, ring_v, pos, tok, done), jnp.arange(K))
    c_r = wsp.merge_ring(cache, ring_k, ring_v, wposs.T)

    for i in range(K):
        # a done-at-entry slot decodes discarded garbage in both paths
        # (and sees different garbage columns) -- compare live slots only
        live = ~ref_entry_done[i]
        np.testing.assert_allclose(np.asarray(lgs[i])[live],
                                   np.asarray(ref_logits[i])[live],
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(p_r), np.asarray(p_ref))
    np.testing.assert_array_equal(np.asarray(t_r), np.asarray(t_ref))
    # cache parity only at positions the ring path owns: the oracle
    # additionally rewrites a done slot's frozen column every step
    # (idempotent garbage); compare the columns active slots wrote
    tp = np.asarray(wposs.T)
    sk_r, sk_o = np.asarray(c_r.self_k), np.asarray(c_ref.self_k)
    sv_r, sv_o = np.asarray(c_r.self_v), np.asarray(c_ref.self_v)
    for b in range(B):
        for t in tp[b][tp[b] < TMAX]:
            np.testing.assert_allclose(sk_r[:, b, :, t], sk_o[:, b, :, t],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(sv_r[:, b, :, t], sv_o[:, b, :, t],
                                       rtol=1e-5, atol=1e-5)


def test_qwen_ring_matches_per_step():
    params = qwen.init_params(jax.random.PRNGKey(0), Q_TINY)
    cache = qwen.init_cache(Q_TINY, B, TMAX, dtype=jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    cache = qwen.QwenCache(
        0.1 * jax.random.normal(ks[0], cache.k.shape),
        0.1 * jax.random.normal(ks[1], cache.v.shape))
    pos = jnp.asarray([2, 0, 7, 11], jnp.int32)
    tok = jnp.asarray([5, 6, 7, 8], jnp.int32)
    done = jnp.asarray([False, False, True, False])

    c_ref, p_ref, t_ref, d_ref = cache, pos, tok, done
    ref_logits, ref_entry_done = [], []
    for _ in range(K):
        ref_entry_done.append(np.asarray(d_ref))
        lg, c_ref = qwen.decode_step(params, Q_TINY, t_ref, c_ref, p_ref)
        ref_logits.append(lg)
        nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        new_done = jnp.logical_or(d_ref, nxt == Q_TINY.eos_token_id)
        p_ref = jnp.where(d_ref, p_ref, p_ref + 1)
        t_ref = jnp.where(new_done, t_ref, nxt)
        d_ref = new_done

    ring_k, ring_v = qwen.init_ring(Q_TINY, B, K, jnp.float32)
    pos0 = pos

    def one(carry, step_i):
        ring_k, ring_v, p, t, d = carry
        lg, ring_k, ring_v = qwen.decode_step_ring(
            params, Q_TINY, t, cache, ring_k, ring_v, pos0, p, step_i)
        nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        new_done = jnp.logical_or(d, nxt == Q_TINY.eos_token_id)
        wpos = jnp.where(d, TMAX, p)
        p = jnp.where(d, p, p + 1)
        t = jnp.where(new_done, t, nxt)
        return (ring_k, ring_v, p, t, new_done), (lg, wpos)

    (ring_k, ring_v, p_r, t_r, d_r), (lgs, wposs) = jax.lax.scan(
        one, (ring_k, ring_v, pos, tok, done), jnp.arange(K))
    c_r = qwen.merge_ring(cache, ring_k, ring_v, wposs.T)

    for i in range(K):
        live = ~ref_entry_done[i]
        np.testing.assert_allclose(np.asarray(lgs[i])[live],
                                   np.asarray(ref_logits[i])[live],
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(p_r), np.asarray(p_ref))
    np.testing.assert_array_equal(np.asarray(t_r), np.asarray(t_ref))
    tp = np.asarray(wposs.T)
    k_r, k_o = np.asarray(c_r.k), np.asarray(c_ref.k)
    v_r, v_o = np.asarray(c_r.v), np.asarray(c_ref.v)
    for b in range(B):
        for t in tp[b][tp[b] < TMAX]:
            np.testing.assert_allclose(k_r[:, b, :, t], k_o[:, b, :, t],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(v_r[:, b, :, t], v_o[:, b, :, t],
                                       rtol=1e-5, atol=1e-5)


def test_whisper_ring_fuzz_random_patterns():
    """Random pos/done patterns across several dispatches: ring path must
    track the scatter oracle's pos/tokens exactly (logits checked on live
    slots) -- guards the sentinel/mask algebra beyond the hand-picked
    cases."""
    params, cache = _rand_whisper()
    rng = np.random.default_rng(42)
    enc_mask = jnp.ones((B, S), bool)
    pos = jnp.asarray(rng.integers(0, TMAX - 3 * K - 1, size=B), jnp.int32)
    tok = jnp.asarray(rng.integers(5, 90, size=B), jnp.int32)
    done = jnp.asarray(rng.random(B) < 0.3)

    c_ref, c_r = cache, cache
    p_ref = p_r = pos
    t_ref = t_r = tok
    d_ref = d_r = done
    for dispatch in range(3):
        entry_done = []
        ref_lgs = []
        for _ in range(K):
            entry_done.append(np.asarray(d_ref))
            lg, c_ref = wsp.decode_step(params, W_TINY, t_ref, c_ref, p_ref,
                                        enc_mask=enc_mask)
            ref_lgs.append(np.asarray(lg))
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            nd = jnp.logical_or(d_ref, nxt == W_TINY.eos_token_id)
            p_ref = jnp.where(d_ref, p_ref, p_ref + 1)
            t_ref = jnp.where(nd, t_ref, nxt)
            d_ref = nd

        ring_k, ring_v = wsp.init_ring(W_TINY, B, K)
        pos0 = p_r

        def one(carry, step_i, _cache=c_r):
            ring_k, ring_v, p, t, d = carry
            lg, ring_k, ring_v = wsp.decode_step_ring(
                params, W_TINY, t, _cache, ring_k, ring_v, pos0, p, step_i,
                enc_mask=enc_mask)
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            nd = jnp.logical_or(d, nxt == W_TINY.eos_token_id)
            wpos = jnp.where(d, TMAX, p)
            p = jnp.where(d, p, p + 1)
            t = jnp.where(nd, t, nxt)
            return (ring_k, ring_v, p, t, nd), (lg, wpos)

        (ring_k, ring_v, p_r, t_r, d_r), (lgs, wposs) = jax.lax.scan(
            one, (ring_k, ring_v, p_r, t_r, d_r), jnp.arange(K))
        c_r = wsp.merge_ring(c_r, ring_k, ring_v, wposs.T)

        for i in range(K):
            live = ~entry_done[i]
            np.testing.assert_allclose(np.asarray(lgs[i])[live],
                                       ref_lgs[i][live],
                                       rtol=5e-5, atol=5e-5)
        np.testing.assert_array_equal(np.asarray(p_r), np.asarray(p_ref))
        np.testing.assert_array_equal(np.asarray(t_r), np.asarray(t_ref))
        np.testing.assert_array_equal(np.asarray(d_r), np.asarray(d_ref))
        # simulate engine churn between dispatches: finished slots rejoin
        freed = np.asarray(d_r)
        if freed.any():
            newpos = rng.integers(0, TMAX - 3 * K - 1, size=B).astype(np.int32)
            newtok = rng.integers(5, 90, size=B).astype(np.int32)
            sel = jnp.asarray(freed)
            p_ref = p_r = jnp.where(sel, jnp.asarray(newpos), p_r)
            t_ref = t_r = jnp.where(sel, jnp.asarray(newtok), t_r)
            d_ref = d_r = jnp.zeros((B,), bool)
            # oracle and ring caches must agree where it matters: reset
            # both to the ring cache so drift in dead columns can't leak
            c_ref = c_r
