"""TTS paced-calls benchmark body (moved from bench.py; bench.py
now orchestrates this + the LT ramp as subprocesses).

The north-star metric (BASELINE.md) is denominated in **concurrent paced
calls** -- each consuming audio at exactly 1x real time through a 20 ms
pacer -- not aggregate audio-sec/wall-sec.  This bench drives N simulated
calls through the streaming engine with utterance-level slot multiplexing
and sentence-done flow control (the reference's ``tts_say_done`` protocol),
ramping N until the SLA breaks: p95 utterance TTFB < 200 ms and zero pacer
underruns.

Prints ONE JSON line:
  {"metric": "tts_paced_concurrent_calls_per_chip", "value": N, ...}
vs_baseline: the reference bench drives 50 concurrent sessions per GPU
(HelloSippyRTPipeTest.py:103); >1.0 means more live calls than that.

Set BENCH_MODE=streams for the round-1 throughput-equivalent metric.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compilation cache (env vars are too late: the axon
# sitecustomize pre-imports jax, so set it through jax.config)
from infernos_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()


def build_engine(on_tpu: bool, B: int, chunk_schedule, max_steps: int):
    from infernos_tpu.models import speecht5 as st5
    from infernos_tpu.models import hifigan as hfg
    from infernos_tpu.serving.tts_engine import TTSEngine, TTSEngineConfig

    # Full-size SpeechT5 + HiFi-GAN dims (microsoft/speecht5_tts class);
    # random weights -- the bench measures serving compute, not audio quality.
    cfg = st5.SpeechT5Config()
    voc = hfg.HifiGanConfig()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # Weight VALUES are irrelevant to serving throughput; zero-init compiles
    # and allocates in milliseconds where random-init of full-size models
    # costs minutes of RNG-graph compilation.
    def zeros_like_init(init_fn):
        shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
        return jax.jit(lambda: jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, dtype), shapes))()

    params = zeros_like_init(lambda k: st5.init_params(k, cfg))
    voc_params = zeros_like_init(lambda k: hfg.init_params(k, voc))
    if os.environ.get("BENCH_INT8"):
        from infernos_tpu.models import quant

        params = jax.jit(lambda p: quant.quantize_params(p))(params)

    ecfg = TTSEngineConfig(
        batch_slots=B,
        max_text_tokens=64,
        max_steps=max_steps,
        pre_frames=4,
        chunk_schedule=chunk_schedule,
        min_steps=8,
        stop_threshold=2.0,  # random weights: run to max_frames deterministically
        dtype=dtype,
        # deliver each tick's audio the moment the device finishes it
        # (~1 tick less TTFB than the sync one-tick pipeline)
        async_harvest=True,
        max_inflight_ticks=int(os.environ.get("BENCH_INFLIGHT", "1")),
    )
    return TTSEngine(params, cfg, voc_params, voc, ecfg), cfg


def probe_throughput(eng, cfg, seconds: float, utter_frames: int) -> float:
    """Aggregate audio-sec/wall-sec with slots kept full (upper bound)."""
    rng = np.random.default_rng(42)
    B = eng.ecfg.batch_slots
    samples = [0]

    def start_one():
        ids = rng.integers(2, cfg.vocab_size,
                           size=int(rng.integers(16, 48))).astype(np.int32)
        spk = rng.standard_normal(cfg.speaker_embedding_dim).astype(np.float32)
        eng.start_session(
            ids, spk,
            lambda a: samples.__setitem__(0, samples[0] + (len(a) if a is not None else 0)),
            max_frames=utter_frames)

    t0 = time.monotonic()
    while time.monotonic() - t0 < seconds:
        # keep queued+active at the slot count (joins are deferred+batched,
        # so pending entries are in-flight work, not overload)
        while eng.n_active + len(eng._pending) < B:
            start_one()
        eng.step()
    while eng.step():
        pass
    wall = time.monotonic() - t0
    return samples[0] / eng.ecfg.sample_rate / wall


def main() -> None:
    from infernos_tpu.bench.paced_calls import PacedCallConfig, run_paced

    try:
        dev = jax.devices()[0]
    except RuntimeError:
        # axon tunnel unavailable; record a CPU-fallback measurement rather
        # than no measurement at all
        jax.config.update("jax_platforms", "cpu")
        dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    B = int(os.environ.get("BENCH_SLOTS", "24"))
    utter_frames = int(os.environ.get("BENCH_UTTER", "96"))  # ~1.5 s audio
    duty = 0.5  # LT calls: TTS speaks <= half the time
    # Fixed 32-frame ticks: under continuous utterance churn an adaptive
    # (8,...,32) schedule degenerates to all-8-frame ticks for every slot,
    # and per-dispatch overhead then dominates (measured: 61 vs 150 streams).
    # With 32-frame ticks TTFB is still ~2 ticks = ~100 ms.
    eng, cfg = build_engine(on_tpu, B, chunk_schedule=(32,),
                            max_steps=utter_frames // 2 + 32)

    # -- warmup: compile everything -------------------------------------------
    t_compile = time.monotonic()
    eng.warmup()
    compile_s = time.monotonic() - t_compile

    # -- probe aggregate throughput (sets the candidate ladder) ---------------
    T = probe_throughput(eng, cfg, seconds=8.0, utter_frames=utter_frames)

    if os.environ.get("BENCH_MODE") == "streams":
        result = {
            "metric": "tts_concurrent_realtime_streams_per_chip",
            "value": round(T, 2),
            "unit": "streams (16kHz audio-sec/wall-sec)",
            "vs_baseline": round(T / 50.0, 3),
            "detail": {"platform": dev.platform, "device": str(dev),
                       "batch_slots": B,
                       "first_steps_incl_compile_s": round(compile_s, 1)},
        }
        print(json.dumps(result))
        return

    # -- ramp paced calls until the SLA breaks ---------------------------------
    ceiling = T / duty  # service capacity in calls at this duty cycle
    measure_s = float(os.environ.get("BENCH_SECONDS", "20"))
    base = PacedCallConfig(utterance_frames=utter_frames, duty=duty,
                           sla_ttfb_s=0.2, measure_s=measure_s, seed=42)
    best = None
    levels = []

    def run_level(n: int):
        from infernos_tpu.utils.metrics import metrics

        r = run_paced(eng, dataclasses.replace(base, n_calls=n))
        snap = metrics.snapshot()
        levels.append({
            "n_calls": r.n_calls, "ttfb_p50_s": round(r.ttfb_p50, 3),
            "ttfb_p95_s": round(r.ttfb_p95, 3), "underruns": r.underruns,
            "utterances": r.utterances,
            "streams_equiv": round(r.audio_s / r.wall_s, 1),
            "tick_p50_s": round(snap.get("tts.tick_s.p50", 0.0), 4),
            "tick_p95_s": round(snap.get("tts.tick_s.p95", 0.0), 4),
            "ok": r.ok,
        })
        return r

    # ramp up from 60% of the probe ceiling; if even that fails (the axon
    # tunnel's per-dispatch latency fluctuates ~2x between runs), back off
    # so a slow-tunnel run still reports the level it CAN serve
    failed_at = None
    for f in (0.6, 0.75, 0.9, 0.95, 1.0):
        n = max(1, int(ceiling * f))
        r = run_level(n)
        if not r.ok:
            # tunnel latency fluctuates ~2x run-to-run: one retry before
            # concluding the level is beyond capacity
            r = run_level(n)
        if r.ok:
            best = r
        else:
            failed_at = n
            break
    if best is not None and failed_at is not None:
        # refine the capacity boundary once at the midpoint
        mid = (best.n_calls + failed_at) // 2
        if mid > best.n_calls + 2:
            r = run_level(mid)
            if r.ok:
                best = r
    if best is None:
        for f in (0.45, 0.3, 0.15):
            r = run_level(max(1, int(ceiling * f)))
            if r.ok:
                best = r
                break
        if best is not None and failed_at is not None:
            # climb back toward the failed level once
            mid = (best.n_calls + failed_at) // 2
            if mid > best.n_calls + 2:
                r = run_level(mid)
                if r.ok:
                    best = r

    value = best.n_calls if best else 0
    result = {
        "metric": "tts_paced_concurrent_calls_per_chip",
        "value": value,
        "unit": "paced 1x-realtime calls (p95 TTFB<200ms, 0 underruns, duty 0.5)",
        "vs_baseline": round(value / 50.0, 3),
        "detail": {
            "platform": dev.platform,
            "device": str(dev),
            "batch_slots": B,
            "utterance_frames": utter_frames,
            "duty": duty,
            "throughput_streams_probe": round(T, 1),
            "levels": levels,
            "best_ttfb_p95_s": round(best.ttfb_p95, 3) if best else None,
            "best_ttfb_p50_s": round(best.ttfb_p50, 3) if best else None,
            "first_steps_incl_compile_s": round(compile_s, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
