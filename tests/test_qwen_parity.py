"""Qwen2 parity vs random-init HF model + TP sharding smoke on the CPU mesh."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from infernos_tpu.models import qwen


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen2Config(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=64,
        max_position_embeddings=128,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    return Qwen2ForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def ported(hf_model):
    return qwen.port_from_hf(hf_model)


def test_prefill_parity(hf_model, ported):
    params, cfg = ported
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, size=(2, 9))
    with torch.no_grad():
        want = hf_model(torch.tensor(toks, dtype=torch.long)).logits.numpy()
    got, _, _ = qwen.prefill(params, cfg, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def test_incremental_matches_prefill(ported):
    params, cfg = ported
    rng = np.random.default_rng(1)
    B, T = 2, 7
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)))
    want, ks, vs = qwen.prefill(params, cfg, toks)

    cache = qwen.init_cache(cfg, B, max_len=T + 2)
    outs = []
    for t in range(T):
        pos = jnp.full((B,), t, jnp.int32)
        logits, cache = qwen.decode_step(params, cfg, toks[:, t], cache, pos)
        outs.append(np.asarray(logits))
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(want), atol=3e-4)


def test_prefill_kv_matches_step_kv(ported):
    """Prefill's returned K/V must equal what incremental steps write (the
    join path of the LLM engine depends on this)."""
    params, cfg = ported
    rng = np.random.default_rng(2)
    B, T = 1, 5
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)))
    _, ks, vs = qwen.prefill(params, cfg, toks)
    cache = qwen.init_cache(cfg, B, max_len=T)
    for t in range(T):
        pos = jnp.full((B,), t, jnp.int32)
        _, cache = qwen.decode_step(params, cfg, toks[:, t], cache, pos)
    np.testing.assert_allclose(np.asarray(cache.k), np.asarray(ks), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cache.v), np.asarray(vs), atol=2e-5)


def test_tp_sharded_prefill_matches(ported):
    """TP over the 8-device CPU mesh must be numerically transparent."""
    from infernos_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding

    params, cfg = ported
    mesh = make_mesh(2, axes=("tp",))
    specs = qwen.param_shardings(cfg)
    sharded = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 6)))
    want, _, _ = qwen.prefill(params, cfg, toks)
    got, _, _ = jax.jit(lambda p, t: qwen.prefill(p, cfg, t))(sharded, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_greedy_matches_hf_generate(hf_model, ported):
    params, cfg = ported
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 5))
    with torch.no_grad():
        want = hf_model.generate(
            torch.tensor(prompt, dtype=torch.long), max_new_tokens=6,
            do_sample=False, num_beams=1,
        )[0].tolist()
    logits, ks, vs = qwen.prefill(params, cfg, jnp.asarray(prompt))
    T = prompt.shape[1]
    cache = qwen.init_cache(cfg, 1, max_len=T + 8)
    cache = qwen.QwenCache(
        cache.k.at[:, :, :, :T].set(np.asarray(ks)),
        cache.v.at[:, :, :, :T].set(np.asarray(vs)),
    )
    toks = list(prompt[0])
    nxt = int(np.asarray(logits[0, -1]).argmax())
    toks.append(nxt)
    for t in range(5):
        logits1, cache = qwen.decode_step(
            params, cfg, jnp.asarray([toks[-1]]), cache,
            jnp.asarray([T + t], jnp.int32))
        toks.append(int(np.asarray(logits1[0]).argmax()))
    assert toks[: len(want)] == want[: len(toks)], (toks, want)
