"""LLM serving benchmark: aggregate decode throughput on one chip.

VERDICT r2 item 4: re-measure 7B-int8 decode with multi-step dispatch
(the round-1 96 tok/s predates it), then with speculative decode.
Match: the reference's LLM path ``Cluster/InfernLLMWorker.py:112-118``
(lockstep ``generate`` over a padded batch).

Usage:
  python -m infernos_tpu.bench.llmbench [--slots 8] [--new 48] [--reqs 16]
         [--steps-per-dispatch 8] [--spec] [--dims 7b|tiny]

Prints one JSON line with tok/s aggregate + latency percentiles.
Random weights: throughput numbers are serving-compute real; with --spec
the acceptance rate reflects the (repetitive) random-weight distribution
and is reported, not hidden.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np

from ..utils.compile_cache import enable


def main() -> None:
    enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--new", type=int, default=48)
    ap.add_argument("--reqs", type=int, default=16)
    ap.add_argument("--prompt", type=int, default=256)
    ap.add_argument("--steps-per-dispatch", type=int, default=8)
    ap.add_argument("--spec", action="store_true")
    ap.add_argument("--spec-k", type=int, default=8)
    ap.add_argument("--dims", default="7b", choices=["7b", "tiny"])
    ap.add_argument("--int8", action="store_true", default=True)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..models import qwen
    from ..serving.llm_engine import LLMEngine, LLMEngineConfig, LLMRequest

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if a.dims == "7b":
        cfg = qwen.QwenConfig(
            vocab_size=152064, hidden_size=3584, num_layers=28,
            num_heads=28, num_kv_heads=4, head_dim=128,
            intermediate_size=18944, max_positions=4096,
            eos_token_id=151645)
    else:
        cfg = qwen.QwenConfig(
            vocab_size=1024, hidden_size=256, num_layers=4, num_heads=8,
            num_kv_heads=4, head_dim=32, intermediate_size=512,
            max_positions=2048, eos_token_id=2)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def zeros_init():
        # build zeros DIRECTLY in the final (possibly int8-quantized)
        # shapes: materializing 7B bf16 zeros first (15.2 GB) and
        # quantizing after does not fit a 16 GB chip
        def build(k):
            p = qwen.init_params(k, cfg)
            if a.int8 and a.dims == "7b":
                from ..models import quant

                p = quant.quantize_params(p)
            return p

        shapes = jax.eval_shape(build, jax.random.PRNGKey(0))
        return jax.jit(lambda: jax.tree_util.tree_map(
            lambda sd: jnp.zeros(
                sd.shape,
                sd.dtype if sd.dtype == jnp.int8 else dtype),
            shapes))()

    params = zeros_init()

    ecfg = LLMEngineConfig(
        batch_slots=a.slots, prompt_buckets=(a.prompt,),
        max_total_tokens=a.prompt + a.new + 8, max_new_tokens=a.new,
        dtype=dtype, steps_per_dispatch=a.steps_per_dispatch,
        spec_decode=a.spec, spec_k=a.spec_k)
    eng = LLMEngine(params, cfg, ecfg)

    t0 = time.monotonic()
    eng.warmup()
    compile_s = time.monotonic() - t0

    rng = np.random.default_rng(0)
    lat = []
    done_n = [0]

    def submit_one(i):
        t_sub = time.monotonic()

        def cb(s, fin, t_sub=t_sub):
            if fin:
                lat.append(time.monotonic() - t_sub)
                done_n[0] += 1

        ids = rng.integers(3, min(cfg.vocab_size - 8, 50000),
                           size=a.prompt - 8).astype(np.int32)
        eng.submit(LLMRequest(prompt_ids=ids, sentence_cb=cb,
                              max_new_tokens=a.new))

    t0 = time.monotonic()
    for i in range(a.reqs):
        submit_one(i)
    while eng.step():
        pass
    wall = time.monotonic() - t0
    total_tokens = a.reqs * a.new  # capped; EOS never fires on zeros

    from ..utils.metrics import metrics

    snap = metrics.snapshot()
    lat.sort()
    p = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else 0.0
    out = {
        "metric": "llm_decode_tok_per_s",
        "value": round(total_tokens / wall, 1),
        "unit": f"aggregate new tokens/s ({a.dims}, batch {a.slots}, "
                f"{'spec' if a.spec else f'K={a.steps_per_dispatch}'})",
        "detail": {
            "platform": dev.platform,
            "requests": a.reqs, "new_tokens_each": a.new,
            "prompt_tokens": a.prompt,
            "gen_p50_s": round(p(0.5), 2), "gen_p95_s": round(p(0.95), 2),
            "compile_s": round(compile_s, 1),
            "spec_emit_mean": round(snap.get("llm.spec_emit.mean", 0.0), 2),
            "wall_s": round(wall, 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
