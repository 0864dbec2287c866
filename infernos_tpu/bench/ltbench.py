"""LiveTranslator two-leg multi-call benchmark (BASELINE.md config 4).

N concurrent callers (Alice_i) dial the LT profile over REAL SIP; the
framework dials a far-end (Bob_i) for each; every Alice speaks synthetic
utterances separated by listening gaps.  Measured per utterance: **turn
latency** -- Alice's end-of-speech to the first translated-TTS packet on
the matching Bob leg (VAD hangover + STT + translate + TTS first frame +
pacing), the conversational figure the north star is denominated in.

Usage:  python -m infernos_tpu.bench.ltbench [--calls 4] [--turns 3] [--full]
"""

from __future__ import annotations

import asyncio
import dataclasses
import json
import threading
import time
from typing import Dict, List, Optional

import numpy as np

from ..audio.codecs import G711Codec
from ..media.rtp import RTPPacket
from ..media.udp import UdpServer
from ..sip.stack import SIPStack
from ..sip.ua import UAS
from .phone import FakePhone


class MultiFarEnd:
    """Auto-answering callee with a FRESH RTP socket per inbound call, so
    each bridged call's B-leg audio is separable."""

    def __init__(self, port: int = 15990):
        self.codec = G711Codec()
        self.port = port
        self.calls: List[Dict] = []  # {"rx": [(t, bytes)], "sock": UdpServer}
        self._lock = threading.Lock()
        self.loop = asyncio.new_event_loop()
        self._ready = threading.Event()
        self._thr = threading.Thread(target=self._run, daemon=True)
        self._thr.start()
        self._ready.wait(5.0)

    def _run(self):
        asyncio.set_event_loop(self.loop)

        async def boot():
            self.stack = SIPStack(("127.0.0.1", self.port))
            await self.stack.start()

            def on_invite(msg, addr):
                entry = {"rx": [], "t_answer": time.monotonic()}

                def rx(data, a, rt, entry=entry):
                    try:
                        RTPPacket.parse(data)
                        entry["rx"].append((time.monotonic(), data))
                    except Exception:
                        pass

                sock = UdpServer(("127.0.0.1", 0), rx)
                entry["sock"] = sock
                uas = UAS(self.stack, msg, addr)
                params = uas.negotiate()
                uas.accept(sock.laddr, params.codec)
                with self._lock:
                    self.calls.append(entry)

            self.stack.on_invite = on_invite
            self._ready.set()

        self.loop.run_until_complete(boot())
        self.loop.run_forever()

    def n_calls(self) -> int:
        with self._lock:
            return len(self.calls)

    def close(self):
        with self._lock:
            for c in self.calls:
                c["sock"].shutdown()
        self.loop.call_soon_threadsafe(self.loop.stop)


def _utterance(rng: np.random.Generator, seconds: float) -> np.ndarray:
    """Speech-like audio the trained VAD fires on."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    try:
        from tools.synth_speech import synth_speech

        sp, _ = synth_speech(rng, seconds)
        return (0.4 * sp).astype(np.float32)
    except Exception:  # tools/ not shipped: modulated tone fallback
        t = np.arange(int(8000 * seconds)) / 8000
        return (0.35 * np.sin(2 * np.pi * 280 * t)
                * (1 + 0.2 * rng.standard_normal(len(t)))).astype(np.float32)


@dataclasses.dataclass
class LTBenchResult:
    n_calls: int
    answered: int
    turns: int
    turn_p50_s: float
    turn_p95_s: float
    failures: int  # turns with no reply within timeout


def run_lt_bench(sip_bind, far_end: MultiFarEnd, n_calls: int = 4,
                 turns: int = 3, utter_s: float = 1.6,
                 turn_timeout: float = 60.0, seed: int = 42) -> LTBenchResult:
    """Drive ``n_calls`` concurrent LT calls; ``turns`` utterances each."""
    rng = np.random.default_rng(seed)
    phones: List[FakePhone] = []
    call_slot: Dict[int, int] = {}  # phone idx -> far-end call idx
    try:
        for i in range(n_calls):
            before = far_end.n_calls()
            p = FakePhone()
            p.call(sip_bind)
            # wait for the matching B leg (arrival-order pairing)
            deadline = time.monotonic() + 30.0
            while far_end.n_calls() <= before and time.monotonic() < deadline:
                time.sleep(0.05)
            if far_end.n_calls() <= before:
                p.close()
                continue
            call_slot[len(phones)] = before
            phones.append(p)

        answered = len(phones)
        latencies: List[float] = []
        failures = 0

        def run_call(pi: int, phone: FakePhone):
            nonlocal failures
            crng = np.random.default_rng(seed + 1000 + pi)
            entry = far_end.calls[call_slot[pi]]
            for turn in range(turns):
                # wait for B-leg quiescence (previous reply fully played)
                # so 'first packet after end-of-speech' measures THIS turn
                q_deadline = time.monotonic() + turn_timeout
                while time.monotonic() < q_deadline:
                    last = entry["rx"][-1][0] if entry["rx"] else 0.0
                    if time.monotonic() - last > 0.6:
                        break
                    time.sleep(0.1)
                utter = _utterance(crng, utter_s)
                n_before = len(entry["rx"])
                phone.stream_bg(utter, then_silence=True)
                t_eos = time.monotonic() + utter_s  # end of speech
                # wait for first NEW B-leg packet after end-of-speech
                got = None
                deadline = t_eos + turn_timeout
                while time.monotonic() < deadline:
                    new = entry["rx"][n_before:]
                    for (t, _d) in new:
                        if t >= t_eos:
                            got = t
                            break
                    if got:
                        break
                    time.sleep(0.05)
                phone.stop_streaming()
                if got is None:
                    failures += 1
                else:
                    latencies.append(got - t_eos)
                time.sleep(0.5 + 0.2 * crng.random())  # listening gap

        thrs = [threading.Thread(target=run_call, args=(i, p), daemon=True)
                for i, p in enumerate(phones)]
        for t in thrs:
            t.start()
            time.sleep(0.15)  # stagger
        for t in thrs:
            t.join(timeout=turns * (turn_timeout + utter_s + 2))

        for p in phones:
            try:
                p.hangup()
            except Exception:
                pass
        lat = sorted(latencies)
        p = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else 0.0
        return LTBenchResult(
            n_calls=n_calls, answered=answered, turns=len(lat),
            turn_p50_s=round(p(0.5), 3), turn_p95_s=round(p(0.95), 3),
            failures=failures)
    finally:
        for p in phones:
            p.close()


def main() -> None:
    import argparse
    import textwrap

    from ..cluster.actors import stop_all
    from ..config import InfernConfig
    from ..main import build_cluster
    from ..utils.compile_cache import enable

    enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--turns", type=int, default=3)
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    far = MultiFarEnd(port=15990)
    import tempfile

    cfg_text = textwrap.dedent("""
        sip:
          settings:
            bind: 127.0.0.1:15991
          profiles:
            inbound:
              sink: apps/live_translator/bench
            bob:
              sip_server: 127.0.0.1:15990
        rtp:
          settings:
            min_port: 30000
            max_port: 31000
        apps:
          live_translator:
            profiles:
              bench:
                stt_langs: ['en', 'pt']
                tts_langs: ['pt', 'en']
                outbound: sip/bob;cld=900
    """)
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(cfg_text)
        path = f.name
    iconf = InfernConfig(path)
    build_cluster(iconf, tiny=not args.full, bind_ip="127.0.0.1")
    try:
        r = run_lt_bench(iconf.sip_conf.bind, far, n_calls=args.calls,
                         turns=args.turns)
        print(json.dumps(dataclasses.asdict(r)))
    finally:
        stop_all()
        far.close()


if __name__ == "__main__":
    main()
