"""One-process LLM engine A/B: pipeline depth max_inflight in {1, 2, 3}
at K=16, 7B dims int8 weights, B=16 slots.

After the grouped-GQA rewrite the pure-device dispatch runs at ~991
tok/s (80% of roofline, PERF.md) while the engine last measured 389
tok/s -- the host loop (harvest fetch RTT over the axon tunnel +
callback work) is now the limiter.  Deeper in-flight pipelines overlap
the fetch of dispatch N-2 with the compute of dispatch N.

Engines built fresh per config (method jits are per-instance, so no
fn-identity aliasing).  Reference counterpart: the streamed generate
loop, ``Cluster/InfernLLMWorker.py:112-118``.
"""
import gc
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from infernos_tpu.models import qwen, quant
from infernos_tpu.serving.llm_engine import (LLMEngine, LLMEngineConfig,
                                             LLMRequest)

cfg = qwen.QwenConfig(
    vocab_size=152064, hidden_size=3584, num_layers=28, num_heads=28,
    num_kv_heads=4, head_dim=128, intermediate_size=18944,
    max_positions=4096, eos_token_id=151645)
dtype = jnp.bfloat16
PROMPT, NEW, REQS, SLOTS, K = 256, 96, 32, 16, 16


def zeros_init():
    def build(k):
        return quant.quantize_params(qwen.init_params(k, cfg))
    shapes = jax.eval_shape(build, jax.random.PRNGKey(0))
    return jax.jit(lambda: jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape,
                             sd.dtype if sd.dtype == jnp.int8 else dtype),
        shapes))()


def run(params, inflight):
    ecfg = LLMEngineConfig(
        batch_slots=SLOTS, prompt_buckets=(PROMPT,),
        max_total_tokens=PROMPT + NEW + 8, max_new_tokens=NEW,
        dtype=dtype, steps_per_dispatch=K, max_inflight=inflight)
    eng = LLMEngine(params, cfg, ecfg)
    t0 = time.monotonic()
    eng.warmup()
    compile_s = time.monotonic() - t0
    rng = np.random.default_rng(0)
    lat, done_n = [], [0]

    def submit_one(i):
        t_sub = time.monotonic()

        def cb(s, fin, t_sub=t_sub):
            if fin:
                lat.append(time.monotonic() - t_sub)
                done_n[0] += 1
        ids = rng.integers(3, 50000, size=PROMPT - 8).astype(np.int32)
        eng.submit(LLMRequest(ids, cb))

    t0 = time.monotonic()
    for i in range(REQS):
        submit_one(i)
    while done_n[0] < REQS and time.monotonic() - t0 < 900:
        if not eng.step():
            time.sleep(0.005)
    wall = time.monotonic() - t0
    toks = REQS * NEW
    print(f"inflight={inflight}: {toks / wall:7.1f} tok/s aggregate, gen "
          f"p50 {np.percentile(lat, 50):.2f}s p95 "
          f"{np.percentile(lat, 95):.2f}s, compile {compile_s:.1f}s, "
          f"wall {wall:.1f}s, done {done_n[0]}/{REQS}", flush=True)
    del eng
    gc.collect()


if __name__ == "__main__":
    params = zeros_init()
    for depth in (1, 2, 3):
        run(params, depth)
    print("AB DONE", flush=True)
