"""Int8 weight-only quantization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infernos_tpu.models import layers as L
from infernos_tpu.models import presets, quant, qwen, whisper as wsp


def test_quantize_linear_accuracy():
    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal(128).astype(np.float32))}
    q = quant.quantize_linear(p)
    assert q["w_q"].dtype == jnp.int8
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    want = np.asarray(L.linear(x, p))
    got = np.asarray(L.linear(x, q))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, rel


def test_quantize_params_walk_and_excludes():
    cfg = presets.WHISPER_TINY_TEST
    params = wsp.init_params(jax.random.PRNGKey(0), cfg)
    qp = quant.quantize_params(params, min_size=16)
    # stacked linears quantized (leading layer dim preserved)
    assert "w_q" in qp["enc_layers"]["fc1"]
    assert qp["enc_layers"]["fc1"]["w_q"].ndim == 3
    assert "w_q" in qp["dec_layers"]["self_attn"]["q"]
    # embeddings / positional / conv untouched
    assert "w" in qp["tok_embed"]
    assert "w" in qp["dec_pos"]
    assert "w" in qp["conv1"]
    # memory shrinks substantially
    assert quant.quantized_bytes(qp) < 0.55 * quant.quantized_bytes(params)


def test_quantized_whisper_close_to_fp():
    cfg = presets.WHISPER_TINY_TEST
    params = wsp.init_params(jax.random.PRNGKey(0), cfg)
    qp = quant.quantize_params(params, min_size=16)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, cfg.num_mel_bins, 64)).astype(np.float32))
    enc_f = np.asarray(wsp.encode(params, cfg, mel))
    enc_q = np.asarray(wsp.encode(qp, cfg, mel))
    # cosine similarity of the encoder states stays high
    cos = (enc_f * enc_q).sum() / (np.linalg.norm(enc_f) * np.linalg.norm(enc_q))
    assert cos > 0.99, cos


def test_quantized_qwen_decode_runs():
    cfg = presets.QWEN_TINY
    params = qwen.init_params(jax.random.PRNGKey(0), cfg)
    qp = quant.quantize_params(params, min_size=16)
    toks = jnp.asarray(np.arange(3, 9)[None, :])
    lf, _, _ = qwen.prefill(params, cfg, toks)
    lq, ks, vs = qwen.prefill(qp, cfg, toks)
    cos = (np.asarray(lf) * np.asarray(lq)).sum() / (
        np.linalg.norm(np.asarray(lf)) * np.linalg.norm(np.asarray(lq)))
    assert cos > 0.98, cos
    cache = qwen.init_cache(cfg, 1, max_len=10)
    cache = qwen.QwenCache(cache.k.at[:, :, :, :6].set(ks),
                           cache.v.at[:, :, :, :6].set(vs))
    logits, _ = qwen.decode_step(qp, cfg, jnp.asarray([5]), cache,
                                 jnp.asarray([6], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()
