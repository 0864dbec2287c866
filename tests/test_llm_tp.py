"""LLMEngine tensor parallelism on the virtual 8-device CPU mesh.

VERDICT round-1 item 4: the 14B model is the one place real model
parallelism enters (SURVEY.md section 7, build-plan item 7); the engine --
prefill buckets, donated cache joins, continuous decode -- must run under a
``tp`` mesh with ``qwen.param_shardings`` AND ``qwen.cache_shardings``,
producing the same tokens as the unsharded engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from infernos_tpu.models import presets, qwen
from infernos_tpu.parallel import make_mesh
from infernos_tpu.serving.llm_engine import LLMEngine, LLMEngineConfig, LLMRequest

# GQA config whose kv heads split over the 8-way mesh (mirrors the 14B
# shape: 40 q heads / 8 kv heads -> here 8/8 on the tiny dims)
TP_CFG = qwen.QwenConfig(
    vocab_size=160, hidden_size=64, num_layers=2, num_heads=8,
    num_kv_heads=8, head_dim=8, intermediate_size=128, rope_theta=10000.0,
    max_positions=256, eos_token_id=2, tie_word_embeddings=False,
)


def _collect(engine, prompts):
    outs = {i: [] for i in range(len(prompts))}
    for i, p in enumerate(prompts):
        engine.submit(LLMRequest(np.asarray(p, np.int32),
                                 lambda s, f, i=i: outs[i].append((s, f))))
    while engine.step():
        pass
    return outs


@pytest.fixture(scope="module")
def prompts():
    rng = np.random.default_rng(0)
    return [rng.integers(3, 150, size=n).tolist() for n in (5, 9, 14)]


@pytest.fixture(scope="module")
def params():
    return qwen.init_params(jax.random.PRNGKey(1), TP_CFG)


def test_engine_tp_matches_unsharded(params, prompts):
    ecfg = LLMEngineConfig(batch_slots=2, prompt_buckets=(16,),
                           max_total_tokens=48, max_new_tokens=8)
    ref_eng = LLMEngine(params, TP_CFG, ecfg)
    want = _collect(ref_eng, prompts)

    mesh = make_mesh(8, axes=("tp",))
    specs = qwen.param_shardings(TP_CFG)
    tp_params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray))
    tp_eng = LLMEngine(tp_params, TP_CFG, ecfg, mesh=mesh)
    # cache is sharded over the kv-head axis
    assert "tp" in str(tp_eng.cache.k.sharding.spec)
    got = _collect(tp_eng, prompts)
    assert got == want

    # decode state stayed sharded after joins + steps (no silent gather)
    assert "tp" in str(tp_eng.cache.k.sharding.spec)


def test_engine_tp_queued_join(params, prompts):
    """Continuous batching under TP: queued request joins a freed slot."""
    mesh = make_mesh(8, axes=("tp",))
    specs = qwen.param_shardings(TP_CFG)
    tp_params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray))
    ecfg = LLMEngineConfig(batch_slots=1, prompt_buckets=(16,),
                           max_total_tokens=48, max_new_tokens=6)
    eng = LLMEngine(tp_params, TP_CFG, ecfg, mesh=mesh)
    direct = _collect(eng, [prompts[0]])[0]
    got = _collect(eng, [prompts[1], prompts[0]])  # second one queues
    assert got[1] == direct


def test_14b_preset_dims():
    """The preset must be the real Qwen2.5-14B geometry
    (reference Cluster/InfernLLMWorker.py:64)."""
    c = presets.QWEN25_14B
    assert (c.hidden_size, c.num_layers, c.num_heads, c.num_kv_heads) == \
        (5120, 48, 40, 8)
    assert c.intermediate_size == 13824 and c.vocab_size == 152064
    # kv heads divide a v5e-4 tp mesh and the 8-way test mesh
    assert c.num_kv_heads % 4 == 0 and c.num_kv_heads % 8 == 0
