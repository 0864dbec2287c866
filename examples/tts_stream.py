"""Streaming TTS demo: speak sentences concurrently, write WAVs, print timing.

The single-file equivalent of the reference's
``HelloSippyTTSRT/HelloSippyRTPipeTest.py`` demo loop.

Run: PYTHONPATH=. python examples/tts_stream.py "text to speak" [--full] [--out DIR]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    import jax
    import numpy as np

    from infernos_tpu.utils.platform import ensure_backend

    platform = ensure_backend()
    from infernos_tpu.audio.chunk import AudioChunk
    from infernos_tpu.models import hifigan as hfg
    from infernos_tpu.models import presets
    from infernos_tpu.models import speecht5 as st5
    from infernos_tpu.models.tokenizers import CharTokenizer
    from infernos_tpu.serving.speakers import SpeakerBank
    from infernos_tpu.serving.tts_engine import TTSEngine, TTSEngineConfig

    argv = sys.argv[1:]
    tiny = "--full" not in argv
    out_dir = "."
    if "--out" in argv:
        i = argv.index("--out")
        out_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    texts = [a for a in argv if not a.startswith("--")]
    texts = texts or ["Hello from the TPU native framework.",
                      "This stream renders twenty millisecond chunks."]

    cfg = presets.SPEECHT5_TINY if tiny else presets.SPEECHT5_FULL
    voc = presets.HIFIGAN_TINY if tiny else presets.HIFIGAN_FULL
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    eng = TTSEngine(
        st5.init_params(k1, cfg), cfg, hfg.init_params(k2, voc), voc,
        TTSEngineConfig(batch_slots=min(8, len(texts) + 1),
                        max_steps=128, chunk_schedule=(8, 16, 32),
                        stop_threshold=2.0),
    )
    print(f"platform={platform} tiny={tiny}; warming up...")
    eng.warmup()

    tok = CharTokenizer()
    bank = SpeakerBank.synthetic(dim=cfg.speaker_embedding_dim)
    sr = eng.ecfg.sample_rate
    state = {}

    for i, text in enumerate(texts):
        st = state[i] = {"t0": time.monotonic(), "first": None, "chunks": []}

        def cb(audio, i=i):
            s = state[i]
            if audio is None:
                wall = time.monotonic() - s["t0"]
                total = np.concatenate(s["chunks"]) if s["chunks"] else np.zeros(0)
                AudioChunk(total, sr).save_wav(f"{out_dir}/out_{i}.wav")
                print(f"[{i}] ttfb={s['first'] - s['t0']:.3f}s "
                      f"total={wall:.2f}s audio={len(total) / sr:.2f}s "
                      f"rtr={len(total) / sr / wall:.2f} -> out_{i}.wav")
                return
            if s["first"] is None:
                s["first"] = time.monotonic()
            s["chunks"].append(audio)

        eng.start_session(tok(text), bank.get(i * 7), cb, max_frames=96)

    while eng.step():
        pass


if __name__ == "__main__":
    main()
