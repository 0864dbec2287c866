"""LLM serving latency test: N concurrent self-re-queuing timed sessions.

Capability parity with the reference's ``examples/llm_test.py:13-48``: many
concurrent sessions each submit a request, time it, and immediately submit
the next one for a fixed number of rounds; prints per-round latency
percentiles.

Run: PYTHONPATH=. python examples/llm_test.py [n_sessions] [rounds] [--tiny]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(n_sessions: int = 16, rounds: int = 3, tiny: bool = True) -> None:
    import jax

    from infernos_tpu.utils.platform import ensure_backend

    ensure_backend()
    from infernos_tpu.models import presets, qwen
    from infernos_tpu.models.tokenizers import ByteTokenizer
    from infernos_tpu.serving.llm_engine import LLMEngine, LLMEngineConfig, LLMRequest

    cfg = presets.QWEN_TINY if tiny else presets.QWEN25_14B
    tok = ByteTokenizer()
    eng = LLMEngine(
        qwen.init_params(jax.random.PRNGKey(0), cfg), cfg,
        LLMEngineConfig(batch_slots=8, prompt_buckets=(64, 128),
                        max_total_tokens=256, max_new_tokens=32),
        detokenize=tok.detokenize)
    t0 = time.monotonic()
    eng.warmup()
    print(f"warmup: {time.monotonic() - t0:.1f}s")

    lat: list = []
    pending = {"n": 0}

    def submit(sess_i: int, round_i: int) -> None:
        if round_i >= rounds:
            return
        t_start = time.monotonic()
        prompt = tok(f"session {sess_i} round {round_i}: say something.")

        def cb(text: str, is_final: bool) -> None:
            if not is_final:
                return
            lat.append(time.monotonic() - t_start)
            pending["n"] -= 1
            submit(sess_i, round_i + 1)

        while not eng.free_slots():
            eng.step()
        eng.submit(LLMRequest(prompt_ids=prompt, sentence_cb=cb))
        pending["n"] += 1

    t0 = time.monotonic()
    for i in range(n_sessions):
        submit(i, 0)
    while eng.step() or pending["n"] > 0:
        if not eng.n_active and pending["n"] == 0:
            break
    wall = time.monotonic() - t0
    lat.sort()
    n = len(lat)
    print(f"{n} requests in {wall:.1f}s ({n / wall:.1f} req/s)")
    print(f"latency p50={lat[n // 2]:.3f}s p95={lat[int(0.95 * n)]:.3f}s "
          f"max={lat[-1]:.3f}s")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(n_sessions=int(args[0]) if args else 16,
         rounds=int(args[1]) if len(args) > 1 else 3,
         tiny="--full" not in sys.argv)
