"""One-process LLM engine A/B: batch slots in {16, 24, 32} at K=16,
7B dims int8 weights, Tmax 1024.

The round-4 roofline sweep showed the DEVICE step is nearly
batch-free (weights dominate HBM traffic: B=16 -> 1081 tok/s,
B=32 -> 1939 tok/s at +12% step time, PERF.md).  The engine last
measured 539 tok/s aggregate at 16 slots -- this A/B checks how much
of the device-side 1.8x headroom the ENGINE (continuous batching +
host callbacks through the tunnel) captures at 24/32 slots.

Reference counterpart: the streamed generate loop,
``Cluster/InfernLLMWorker.py:112-118`` (its batch is 8 on one GPU).
"""
import gc
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from infernos_tpu.models import qwen
from infernos_tpu.serving.llm_engine import (LLMEngine, LLMEngineConfig,
                                             LLMRequest)

sys.path.insert(0, "/root/repo/tools/ab")
from llm_inflight_ab import cfg, zeros_init  # same 7B dims + zero-int8 build

dtype = jnp.bfloat16
PROMPT, NEW, K = 256, 96, 16
TMAX = 1024


def run(params, slots):
    reqs = slots * 2  # two full waves: measures steady continuous batching
    ecfg = LLMEngineConfig(
        batch_slots=slots, prompt_buckets=(PROMPT,),
        max_total_tokens=TMAX, max_new_tokens=NEW,
        dtype=dtype, steps_per_dispatch=K, max_inflight=1)
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
    for i in range(reqs):
        submit_one(i)
    while done_n[0] < reqs and time.monotonic() - t0 < 900:
        if not eng.step():
            time.sleep(0.005)
    wall = time.monotonic() - t0
    toks = reqs * NEW
    print(f"slots={slots}: {toks / wall:7.1f} tok/s aggregate, gen "
          f"p50 {np.percentile(lat, 50):.2f}s p95 "
          f"{np.percentile(lat, 95):.2f}s, compile {compile_s:.1f}s, "
          f"wall {wall:.1f}s, done {done_n[0]}/{reqs}", flush=True)
    del eng
    gc.collect()


if __name__ == "__main__":
    params = zeros_init()
    arg = sys.argv[1] if len(sys.argv) > 1 else "16,24,32"
    for slots in (int(x) for x in arg.split(",")):
        run(params, slots)
    print("AB DONE", flush=True)
