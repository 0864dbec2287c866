"""Batched STT benchmark over prerecorded G.711 chunks.

One of the BASELINE.json benchmark configs: "Batched Whisper STT over
prerecorded G.711 wav chunks".  Synthesizes (or loads) G.711 mu-law audio,
decodes it through the media-plane codec (as a real call would), and drives
the STT engine at full slot occupancy; reports aggregate realtime factor and
per-utterance latency percentiles.
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional

import numpy as np

from ..audio.codecs import G711Codec
from ..serving.stt_engine import STTEngine, STTEngineConfig, STTRequest


def make_g711_corpus(n: int = 32, min_s: float = 2.0, max_s: float = 8.0,
                     seed: int = 42) -> List[bytes]:
    """Deterministic synthetic 'speech' corpus already on the G.711 wire."""
    rng = np.random.default_rng(seed)
    codec = G711Codec()
    out = []
    for _ in range(n):
        dur = float(rng.uniform(min_s, max_s))
        t = np.arange(int(8000 * dur)) / 8000.0
        f0 = float(rng.uniform(120, 260))
        sig = (0.3 * np.sin(2 * np.pi * f0 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
               + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        out.append(codec.encode(sig))
    return out


def run_bench(engine: STTEngine, corpus: Optional[List[bytes]] = None,
              lang: str = "en") -> Dict[str, float]:
    codec = G711Codec()
    corpus = corpus or make_g711_corpus()
    results: List = []
    audio_s = [0.0]

    def cb(r):
        audio_s[0] += r.duration
        results.append(r)

    from ..audio.chunk import AudioChunk

    pending = list(corpus)
    t0 = time.monotonic()
    while pending or engine.n_active:
        while pending and engine.free_slots():
            payload = pending.pop(0)
            audio8k = codec.decode(payload)
            audio = AudioChunk(audio8k, 8000).resample(16000).audio
            engine.submit(STTRequest(audio=audio, text_cb=cb, lang=lang))
        if not engine.step() and not pending:
            break
    wall = time.monotonic() - t0
    lat = sorted(r.inf_time for r in results)
    return {
        "utterances": len(results),
        "audio_s": round(audio_s[0], 1),
        "wall_s": round(wall, 2),
        "realtime_factor": round(audio_s[0] / wall, 2),
        "inf_p50_s": round(lat[len(lat) // 2], 3) if lat else 0.0,
        "inf_p95_s": round(lat[int(0.95 * len(lat))], 3) if lat else 0.0,
    }


if __name__ == "__main__":
    import sys

    import jax

    from ..models import presets, whisper as wsp
    from ..utils.platform import ensure_backend_or_degrade

    # bounded probe: a dead axon relay makes the first in-process device
    # touch block FOREVER (round-3 outage); degrade to CPU instead of hanging
    ensure_backend_or_degrade()
    tiny = "--full" not in sys.argv
    cfg = presets.WHISPER_TINY_TEST if tiny else presets.WHISPER_LARGE_V3
    params = wsp.init_params(jax.random.PRNGKey(0), cfg)
    ecfg = (STTEngineConfig(batch_slots=4, buckets_s=(2, 8), max_new_tokens=8,
                            max_prompt_tokens=8, lang_tokens={"en": 10},
                            task_transcribe=12, task_translate=13,
                            no_timestamps=14, no_speech=4)
            if tiny else STTEngineConfig())
    eng = STTEngine(params, cfg, ecfg)
    eng.warmup()
    print(json.dumps(run_bench(eng), indent=2))
