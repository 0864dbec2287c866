"""AIAttendant multi-call LLM benchmark (BASELINE.md config 5).

N concurrent callers dial the attendant over real SIP; each speaks an
utterance and waits for the spoken LLM reply.  Measured per turn: **reply
latency** -- end-of-speech to the first reply packet on the caller's leg
(VAD + 2 s utterance flush + STT + LLM + TTS first frame + pacing).

Usage:  python -m infernos_tpu.bench.aiabench [--calls 4] [--turns 2] [--full]
"""

from __future__ import annotations

import dataclasses
import json
import threading
import time
from typing import List

import numpy as np

from .ltbench import _utterance
from .phone import FakePhone


@dataclasses.dataclass
class AIABenchResult:
    n_calls: int
    answered: int
    turns: int
    reply_p50_s: float
    reply_p95_s: float
    failures: int


def run_aia_bench(sip_bind, n_calls: int = 4, turns: int = 2,
                  utter_s: float = 1.4, turn_timeout: float = 90.0,
                  seed: int = 42, utter_fn=None) -> AIABenchResult:
    phones: List[FakePhone] = []
    try:
        for i in range(n_calls):
            p = FakePhone()
            try:
                p.call(sip_bind)
                phones.append(p)
            except Exception:
                p.close()
        answered = len(phones)
        latencies: List[float] = []
        failures = 0
        lock = threading.Lock()

        def run_call(pi: int, phone: FakePhone):
            nonlocal failures
            crng = np.random.default_rng(seed + 2000 + pi)
            for turn in range(turns):
                if utter_fn is not None:
                    utter = utter_fn(crng)
                    dur = len(utter) / 8000.0
                else:
                    utter = _utterance(crng, utter_s)
                    dur = utter_s
                n_before = len(phone.rx_packets)
                phone.stream_bg(utter, then_silence=True)  # silence: 2s flush
                t_eos = time.monotonic() + dur
                got = None
                deadline = t_eos + turn_timeout
                while time.monotonic() < deadline:
                    for (t, _d) in phone.rx_packets[n_before:]:
                        if t >= t_eos:
                            got = t
                            break
                    if got:
                        break
                    time.sleep(0.05)
                phone.stop_streaming()
                with lock:
                    if got is None:
                        failures += 1
                    else:
                        latencies.append(got - t_eos)
                time.sleep(1.0 + 0.3 * crng.random())

        thrs = [threading.Thread(target=run_call, args=(i, p), daemon=True)
                for i, p in enumerate(phones)]
        for t in thrs:
            t.start()
            time.sleep(0.15)
        for t in thrs:
            t.join(timeout=turns * (turn_timeout + utter_s + 3))
        for p in phones:
            try:
                p.hangup()
            except Exception:
                pass
        lat = sorted(latencies)
        p = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else 0.0
        return AIABenchResult(
            n_calls=n_calls, answered=answered, turns=len(lat),
            reply_p50_s=round(p(0.5), 3), reply_p95_s=round(p(0.95), 3),
            failures=failures)
    finally:
        for p in phones:
            p.close()


def main() -> None:
    import argparse
    import tempfile
    import textwrap

    from ..cluster.actors import stop_all
    from ..config import InfernConfig
    from ..main import build_cluster
    from ..utils.compile_cache import enable

    enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--turns", type=int, default=2)
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--tiny-real", action="store_true",
                    help="serve the in-repo-trained tiny STT/LLM/TTS trio "
                         "and speak real speechlang intents")
    args = ap.parse_args()
    if args.tiny_real:
        import os

        os.environ["INFERNOS_MODEL_MODE"] = "tiny-real"

    cfg_text = textwrap.dedent("""
        sip:
          settings:
            bind: 127.0.0.1:15992
          profiles:
            inbound:
              sink: apps/ai_attendant/bench
        rtp:
          settings:
            min_port: 31000
            max_port: 32000
        apps:
          ai_attendant:
            profiles:
              bench:
                stt_lang: en
                tts_lang: en
                llm_prompt: "You are a phone attendant. Be brief."
    """)
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(cfg_text)
        path = f.name
    iconf = InfernConfig(path)
    stt_actr = None
    if args.full:
        # colocated attendant: the chip also carries the 7B-int8 LLM and
        # full TTS, so the STT engine runs a smaller footprint (8 slots,
        # <=16 s buckets: cross cache 0.4 GB instead of 2.9 GB)
        import jax.numpy as jnp

        from ..cluster.actors import spawn
        from ..cluster.model_actors import STTActor
        from ..serving.stt_engine import STTEngineConfig

        stt_actr = spawn(STTActor, tiny=False,
                         ecfg=STTEngineConfig(batch_slots=8, buckets_s=(8, 16),
                                              dtype=jnp.bfloat16),
                         name="stt:aia-bench")
        stt_actr.ask_sync("start", timeout=1800)
    build_cluster(iconf, tiny=not args.full, bind_ip="127.0.0.1",
                  stt_actr=stt_actr)
    try:
        from .ltbench import speechlang_utterance

        r = run_aia_bench(iconf.sip_conf.bind, n_calls=args.calls,
                          turns=args.turns,
                          utter_fn=(speechlang_utterance if args.tiny_real
                                    else None))
        print(json.dumps(dataclasses.asdict(r)))
    finally:
        stop_all()


if __name__ == "__main__":
    main()
