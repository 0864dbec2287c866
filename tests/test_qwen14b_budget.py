"""Qwen2.5-14B tensor-parallel serving: offline memory + program validation.

The reference serves 14B 4-bit on one GPU (``Cluster/InfernLLMWorker.py:64-101``).
Here the 14B point is int8 TP over a v5e-4 (4 x 16 GiB HBM): these tests make
a failing memory budget a TEST failure instead of a boot-time OOM
(VERDICT r3 item 7), and validate the full TP decode program traces at real
14B dims -- all via ``jax.eval_shape`` / abstract lowering, no weights
materialized.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from infernos_tpu.models import presets, qwen
from infernos_tpu.models.quant import (quantize_params, quantize_shardings)
from infernos_tpu.parallel import make_mesh
from infernos_tpu.parallel.budget import (V5E_HBM_BYTES, budget_report,
                                          per_chip_bytes, replicated_bytes)

TP = 4  # v5e-4
CFG = presets.QWEN25_14B
SLOTS = 8           # reference batch, Cluster/InfernLLMWorker.py
MAX_TOTAL = 2048    # engine default max_total_tokens
MAX_BUCKET = 1024   # largest prefill bucket


def _abstract_quantized_params():
    """Shape tree of the SERVING weight layout: int8 linears, bf16 dense."""

    def build(key):
        p = qwen.init_params(key, CFG)
        p = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
        return quantize_params(p)

    return jax.eval_shape(build, jax.random.PRNGKey(0))


def test_14b_int8_tp4_fits_v5e_hbm():
    """int8 14B weights + bf16 KV (8 slots x 2048) + prefill buffers must
    fit a v5e chip under ``param_shardings`` at tp=4, with 10% headroom
    for XLA scratch."""
    qshapes = _abstract_quantized_params()
    qspecs = quantize_shardings(qwen.param_shardings(CFG), qshapes)
    axis = {"tp": TP}

    parts = {
        "weights_int8": per_chip_bytes(qshapes, qspecs, axis),
        "kv_cache_bf16": per_chip_bytes(
            jax.eval_shape(
                lambda: qwen.init_cache(CFG, SLOTS, MAX_TOTAL,
                                        dtype=jnp.bfloat16)),
            qwen.cache_shardings(CFG), axis),
        # largest prefill bucket's full-length K/V output (bf16, all layers)
        # -- the dominant transient the engine materializes per join
        "prefill_kv_bf16": per_chip_bytes(
            jax.eval_shape(
                lambda: qwen.init_cache(CFG, 1, MAX_BUCKET,
                                        dtype=jnp.bfloat16)),
            qwen.cache_shardings(CFG), axis),
        # prefill activations: hidden [1, T, D] bf16 + the last-position
        # logits row; the full [T, vocab] logits never materialize (the
        # engine argmaxes one row on device)
        "prefill_act_bf16": MAX_BUCKET * CFG.hidden_size * 2 * 4,
    }
    rep = budget_report(parts, limit=V5E_HBM_BYTES, headroom=0.10)
    assert rep["fits"], f"14B int8 tp{TP} does not fit v5e HBM: {rep}"
    # sanity: the accounting is not trivially small -- int8 14B weights
    # per chip must land in the plausible 3-6 GiB band
    w_gib = parts["weights_int8"] / 1024**3
    assert 2.5 < w_gib < 7.0, f"weights/chip {w_gib:.2f} GiB implausible"


def test_14b_does_not_fit_one_chip():
    """Negative control: the same accounting shows int8 14B + caches does
    NOT fit a single chip -- i.e. the budget math has teeth and the TP
    requirement is real (PERF.md: int8 weights alone ~14 GB)."""
    qshapes = _abstract_quantized_params()
    parts = {
        "weights_int8": replicated_bytes(qshapes),
        "kv_cache_bf16": replicated_bytes(
            jax.eval_shape(lambda: qwen.init_cache(
                CFG, SLOTS, MAX_TOTAL, dtype=jnp.bfloat16))),
    }
    rep = budget_report(parts, limit=V5E_HBM_BYTES, headroom=0.10)
    assert not rep["fits"], rep


def test_14b_tp_decode_step_lowers_abstract():
    """The TP decode-step program traces + lowers at REAL 14B dims on a
    4-device mesh with int8 params -- catches shape/sharding/dtype wiring
    errors without materializing a single weight."""
    mesh = make_mesh(TP, axes=("tp",))
    qshapes = _abstract_quantized_params()
    qspecs = quantize_shardings(qwen.param_shardings(CFG), qshapes)
    p_abs = jax.tree_util.tree_map(
        lambda s, spec: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, spec)),
        qshapes, qspecs)
    cs = qwen.cache_shardings(CFG)
    cache_abs = jax.tree_util.tree_map(
        lambda s, spec: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, spec)),
        jax.eval_shape(lambda: qwen.init_cache(CFG, SLOTS, MAX_TOTAL,
                                               dtype=jnp.bfloat16)), cs)
    rep = NamedSharding(mesh, P(None))

    def step(params, cache, tok, pos):
        logits, cache = qwen.decode_step(params, CFG, tok, cache, pos)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    lowered = jax.jit(step, donate_argnums=(1,)).lower(
        p_abs, cache_abs,
        jax.ShapeDtypeStruct((SLOTS,), jnp.int32, sharding=rep),
        jax.ShapeDtypeStruct((SLOTS,), jnp.int32, sharding=rep))
    txt = lowered.as_text()
    assert "stablehlo" in txt or "module" in txt


def test_tiny_tp_engine_int8_matches_dense():
    """Numerics: the TP engine with QUANTIZED params (quantize_shardings
    placement) decodes the same greedy tokens as the unsharded dense
    engine on the tiny model -- the int8 TP serving path end-to-end."""
    from infernos_tpu.serving.llm_engine import (LLMEngine, LLMEngineConfig,
                                                 LLMRequest)

    cfg = qwen.QwenConfig(
        vocab_size=160, hidden_size=64, num_layers=2, num_heads=8,
        num_kv_heads=8, head_dim=8, intermediate_size=128,
        rope_theta=10000.0, max_positions=128, eos_token_id=2,
        tie_word_embeddings=False)
    params = qwen.init_params(jax.random.PRNGKey(1), cfg)
    qparams = quantize_params(params, min_size=256)
    assert any("w_q" in str(jax.tree_util.keystr(kp))
               for kp, _ in jax.tree_util.tree_flatten_with_path(qparams)[0]), \
        "tiny model did not quantize; raise min_size threshold"

    def run(engine_params, mesh=None):
        ecfg = LLMEngineConfig(batch_slots=2, prompt_buckets=(16,),
                               max_total_tokens=48, max_new_tokens=8)
        eng = LLMEngine(engine_params, cfg, ecfg, mesh=mesh)
        outs = []
        eng.submit(LLMRequest(np.arange(3, 12, dtype=np.int32),
                              lambda s, fin: outs.append(s)))
        while eng.step():
            pass
        return "".join(outs)

    want = run(qparams)
    mesh = make_mesh(8, axes=("tp",))
    qspecs = quantize_shardings(qwen.param_shardings(cfg), qparams)
    tp_q = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        qparams, qspecs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray))
    got = run(tp_q, mesh=mesh)
    assert got == want
