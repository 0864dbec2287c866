"""Post-retrain check: the tiny-real pair handles BOTH lexicon sides.

Run after ``train_tiny_stt.py`` / ``train_tiny_tts.py`` on the bilingual
speechlang corpus:

    python tools/check_bilingual.py

Reports, per language side: (a) STT word accuracy on rendered speech,
(b) TTS->STT loopback word accuracy (the LT pt-leg round trip).  The
en-only round-3 checkpoints scored 0% on (a) for pt words (decoder
vocabulary collapse, PERF.md); the gate below requires >=80% on both
sides before new checkpoints should be committed.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def word_acc(refs, hyps) -> float:
    ok = tot = 0
    for r, h in zip(refs, hyps):
        rw, hw = r.split(), h.split()
        tot += len(rw)
        ok += sum(a == b for a, b in zip(rw, hw))
    return ok / max(tot, 1)


def main() -> int:
    from speechlang import Speaker, render_text

    from infernos_tpu.models import tiny_real
    from infernos_tpu.serving.stt_engine import STTEngine, STTRequest
    from infernos_tpu.t2t.lexicon import EN_PT

    params, cfg, tok, ecfg = tiny_real.load_tiny_stt()
    eng = STTEngine(params, cfg, ecfg)
    rng = np.random.default_rng(123)

    en_words = sorted(EN_PT)
    corpora = {
        "en": [" ".join(rng.choice(en_words, size=rng.integers(2, 5)))
               for _ in range(12)],
        "pt": [" ".join(EN_PT[w] for w in rng.choice(en_words,
                                                     size=rng.integers(2, 5)))
               for _ in range(12)],
    }

    failed = False
    for side, texts in corpora.items():
        out = {}
        for i, t in enumerate(texts):
            audio = render_text(rng, t, Speaker.random(rng))
            eng.submit(STTRequest(
                audio=audio,
                text_cb=(lambda i: lambda r: out.__setitem__(i, r))(i),
                lang=side))
        for _ in range(200):
            if not eng.step():
                break
        hyps = [tok.decode(out[i].tokens).strip() if i in out else ""
                for i in range(len(texts))]
        acc = word_acc(texts, hyps)
        print(f"STT {side}-side word acc: {acc:.2%}")
        for r, h in list(zip(texts, hyps))[:3]:
            print(f"  ref {r!r} hyp {h!r}")
        if acc < 0.8:
            failed = True

    # TTS -> STT loopback on the pt side (the LT far-leg round trip)
    if tiny_real.have_tiny_tts():
        from infernos_tpu.serving.tts_engine import TTSEngine

        tparams, tcfg, vparams, vcfg, ttok, table = tiny_real.load_tiny_tts()
        from infernos_tpu.serving.tts_engine import TTSEngineConfig

        teng = TTSEngine(tparams, tcfg, vparams, vcfg,
                         TTSEngineConfig(batch_slots=4, max_text_tokens=48,
                                         max_steps=170, stop_threshold=0.5))
        texts = corpora["pt"][:6]
        hyps = []
        for t in texts:
            chunks = []
            done = []
            ids = ttok(t)
            teng.start_session(np.asarray(ids, np.int32),
                               table[0] if hasattr(table, "__getitem__")
                               else np.zeros(tcfg.speaker_embedding_dim,
                                             np.float32),
                               lambda a: done.append(1) if a is None
                               else chunks.append(a))
            for _ in range(200):
                teng.step()
                if done:
                    break
            audio = (np.concatenate(chunks).astype(np.float32)
                     if chunks else np.zeros(1600, np.float32))
            got = {}
            eng.submit(STTRequest(
                audio=audio, text_cb=lambda r: got.__setitem__(0, r),
                lang="pt"))
            for _ in range(100):
                if not eng.step():
                    break
            hyps.append(tok.decode(got[0].tokens).strip() if got else "")
        acc = word_acc(texts, hyps)
        print(f"TTS->STT pt-side loopback word acc: {acc:.2%}")
        for r, h in list(zip(texts, hyps))[:3]:
            print(f"  ref {r!r} hyp {h!r}")
        if acc < 0.8:
            failed = True

    print("BILINGUAL CHECK", "FAILED" if failed else "PASSED")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
