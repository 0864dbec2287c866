"""Pallas fused TTS decoder-step kernel vs the XLA oracle (interpret mode).

VERDICT r2 item 3: the AR chain is ~97% of the serving tick; the fused
kernel must match ``speecht5.decode_step`` numerics before it can serve.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infernos_tpu.models import speecht5 as st5
from infernos_tpu.ops.tts_step import fused_decode_step

CFG = st5.SpeechT5Config(
    vocab_size=40, hidden_size=64, encoder_layers=1,
    encoder_attention_heads=4, encoder_ffn_dim=96, decoder_layers=3,
    decoder_attention_heads=4, decoder_ffn_dim=96, num_mel_bins=8,
    speech_decoder_prenet_units=16, speech_decoder_postnet_units=16,
    speaker_embedding_dim=16, max_text_positions=16,
    max_speech_positions=64)

B, TMAX, S = 4, 16, 8


def _setup(seed=0, pos=None):
    params = st5.init_params(jax.random.PRNGKey(seed), CFG)
    k = jax.random.PRNGKey(seed + 1)
    cache = st5.init_cache(CFG, B, TMAX, S)
    ks = jax.random.split(k, 6)
    # random (but shared) cache contents + per-slot positions
    cache = cache._replace(
        self_k=jax.random.normal(ks[0], cache.self_k.shape),
        self_v=jax.random.normal(ks[1], cache.self_v.shape),
        cross_k=jax.random.normal(ks[2], cache.cross_k.shape),
        cross_v=jax.random.normal(ks[3], cache.cross_v.shape),
    )
    x = jax.random.normal(ks[4], (B, 1, CFG.hidden_size))
    if pos is None:
        pos = jnp.asarray([0, 3, 7, 12], jnp.int32)
    enc_mask = jnp.asarray(
        np.tril(np.ones((B, S)))[:, ::-1].copy().astype(bool))
    enc_mask = enc_mask.at[:, :2].set(True)  # ensure some valid columns
    return params, cache, x, pos, enc_mask


@pytest.mark.parametrize("pos", [[0, 0, 0, 0], [0, 3, 7, 12], [15, 1, 8, 4]])
def test_fused_step_matches_oracle(pos):
    params, cache, x, _, enc_mask = _setup()
    pos = jnp.asarray(pos, jnp.int32)
    h_ref, cache_ref = st5.decode_step(params, CFG, x, cache, pos,
                                       enc_mask=enc_mask)
    h_fus, cache_fus = fused_decode_step(params, CFG, x, cache, pos,
                                         enc_mask=enc_mask, chunk=8,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(h_fus), np.asarray(h_ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cache_fus.self_k),
                               np.asarray(cache_ref.self_k),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cache_fus.self_v),
                               np.asarray(cache_ref.self_v),
                               rtol=2e-2, atol=2e-2)


def test_fused_step_no_enc_mask():
    params, cache, x, pos, _ = _setup(seed=3)
    h_ref, _ = st5.decode_step(params, CFG, x, cache, pos)
    h_fus, _ = fused_decode_step(params, CFG, x, cache, pos, chunk=8,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(h_fus), np.asarray(h_ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_step_multi_iteration_parity():
    """Three consecutive AR steps: cache evolution must track the oracle."""
    params, cache_a, x, pos, enc_mask = _setup(seed=7)
    cache_b = cache_a
    pos_a = pos_b = pos
    for it in range(3):
        x_it = jax.random.normal(jax.random.PRNGKey(100 + it),
                                 (B, 1, CFG.hidden_size))
        h_a, cache_a = st5.decode_step(params, CFG, x_it, cache_a, pos_a,
                                       enc_mask=enc_mask)
        h_b, cache_b = fused_decode_step(params, CFG, x_it, cache_b, pos_b,
                                         enc_mask=enc_mask, chunk=8,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_a),
                                   rtol=3e-2, atol=3e-2)
        pos_a = pos_a + 1
        pos_b = pos_b + 1


def test_engine_audio_parity_fused_vs_xla():
    """Whole-engine parity: same sessions, fused kernel vs XLA decode."""
    from infernos_tpu.models import hifigan as hfg
    from infernos_tpu.serving.tts_engine import TTSEngine, TTSEngineConfig

    voc = hfg.HifiGanConfig(
        model_in_dim=CFG.num_mel_bins, upsample_initial_channel=16,
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1,),))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = st5.init_params(k1, CFG)
    voc_params = hfg.init_params(k2, voc)

    def run(fused):
        ecfg = TTSEngineConfig(batch_slots=2, max_text_tokens=S,
                               max_steps=TMAX, pre_frames=2,
                               chunk_schedule=(4,), min_steps=2,
                               stop_threshold=2.0, fused_step=fused)
        eng = TTSEngine(params, CFG, voc_params, voc, ecfg)
        got = []
        eng.start_session(np.arange(2, 8, dtype=np.int32),
                          np.zeros(CFG.speaker_embedding_dim, np.float32),
                          lambda a: got.append(a), max_frames=8)
        steps = 0
        while eng.step() and steps < 50:
            steps += 1
        return np.concatenate([g for g in got if g is not None])

    a_xla = run(False)
    a_fused = run(True)
    assert a_xla.shape == a_fused.shape
    np.testing.assert_allclose(a_fused, a_xla, rtol=5e-2, atol=5e-2)


def test_fused_step_bf16_cache_parity():
    """bf16 K/V caches (the TPU serving dtype): the in-kernel RMW merges
    in f32 and casts on store; parity within bf16 tolerance."""
    import jax.numpy as jnp

    params, cache, x, pos, enc_mask = _setup(seed=11)
    bf = lambda a: a.astype(jnp.bfloat16)
    cache16 = cache._replace(self_k=bf(cache.self_k), self_v=bf(cache.self_v),
                             cross_k=bf(cache.cross_k),
                             cross_v=bf(cache.cross_v))
    params16 = jax.tree_util.tree_map(bf, params)
    h_ref, cache_ref = st5.decode_step(params16, CFG, x.astype(jnp.bfloat16),
                                       cache16, pos, enc_mask=enc_mask)
    h_fus, cache_fus = fused_decode_step(params16, CFG, x, cache16, pos,
                                         enc_mask=enc_mask, chunk=8,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(h_fus, np.float32),
                               np.asarray(h_ref, np.float32),
                               rtol=6e-2, atol=6e-2)
    np.testing.assert_allclose(np.asarray(cache_fus.self_k, np.float32),
                               np.asarray(cache_ref.self_k, np.float32),
                               rtol=6e-2, atol=6e-2)


def test_fused_step_int8_matches_quantized_oracle():
    """Int8-weight mode: fused kernel vs the XLA oracle running the SAME
    quantized params (``layers.linear`` consumes quantized dicts, so the
    oracle computes (x @ w_q) * scale -- the kernel must match it, not the
    dense model)."""
    from infernos_tpu.models import quant

    params, cache, x, _, enc_mask = _setup(seed=11)
    qparams = dict(params)
    qparams["dec_layers"] = quant.quantize_params(params["dec_layers"],
                                                  min_size=0)
    pos = jnp.asarray([0, 3, 7, 12], jnp.int32)
    h_ref, cache_ref = st5.decode_step(qparams, CFG, x, cache, pos,
                                       enc_mask=enc_mask)
    h_fus, cache_fus = fused_decode_step(qparams, CFG, x, cache, pos,
                                         enc_mask=enc_mask, chunk=8,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(h_fus), np.asarray(h_ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cache_fus.self_k),
                               np.asarray(cache_ref.self_k),
                               rtol=2e-2, atol=2e-2)
