"""A/B probe: TTS tick time with the Pallas fused decoder step vs XLA.

VERDICT r2 item 3 'Done' criterion: measured tick-time reduction at the
serving batch size.  Run on the chip:

  python -m infernos_tpu.bench.ttsprobe [--slots 24] [--ticks 60]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from ..utils.compile_cache import enable


def run_mode(fused: bool, B: int, ticks: int, frames: int):
    import jax
    import jax.numpy as jnp

    from ..models import hifigan as hfg
    from ..models import speecht5 as st5
    from ..serving.tts_engine import TTSEngine, TTSEngineConfig

    cfg = st5.SpeechT5Config()
    voc = hfg.HifiGanConfig()
    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def zeros_init(init_fn):
        shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
        return jax.jit(lambda: jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, dtype), shapes))()

    params = zeros_init(lambda k: st5.init_params(k, cfg))
    voc_params = zeros_init(lambda k: hfg.init_params(k, voc))
    ecfg = TTSEngineConfig(
        batch_slots=B, max_text_tokens=64, max_steps=frames // 2 + 64,
        chunk_schedule=(32,), min_steps=8, stop_threshold=2.0,
        dtype=dtype, fused_step=fused)
    eng = TTSEngine(params, cfg, voc_params, voc, ecfg)

    rng = np.random.default_rng(0)
    sink = lambda a: None

    def fill():
        while eng.n_active + len(eng._pending) < B:
            ids = rng.integers(2, cfg.vocab_size, size=32).astype(np.int32)
            spk = rng.standard_normal(cfg.speaker_embedding_dim).astype(
                np.float32)
            eng.start_session(ids, spk, sink, max_frames=frames)

    t0 = time.monotonic()
    fill()
    eng.step()  # compile
    compile_s = time.monotonic() - t0
    # steady state
    times = []
    for _ in range(ticks):
        fill()
        t = time.monotonic()
        eng.step()
        times.append(time.monotonic() - t)
    while eng.step():
        pass
    times.sort()
    p50 = times[len(times) // 2]
    p95 = times[int(0.95 * len(times))]
    return {"tick_p50_ms": round(p50 * 1e3, 2),
            "tick_p95_ms": round(p95 * 1e3, 2),
            "compile_s": round(compile_s, 1)}


def main() -> None:
    enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=24)
    ap.add_argument("--ticks", type=int, default=60)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--only", choices=["fused", "xla", "both"],
                    default="both")
    a = ap.parse_args()
    out = {}
    if a.only in ("xla", "both"):
        out["xla"] = run_mode(False, a.slots, a.ticks, a.frames)
    if a.only in ("fused", "both"):
        out["fused"] = run_mode(True, a.slots, a.ticks, a.frames)
    if len(out) == 2:
        out["speedup_p50"] = round(
            out["xla"]["tick_p50_ms"] / max(out["fused"]["tick_p50_ms"],
                                            1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
