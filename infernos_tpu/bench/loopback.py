"""Loopback QA: TTS speaks a prompt, STT transcribes it, similarity scores
each speaker voice -- a self-contained integration test needing no human
listener.

Capability parity with ``Cluster/InfernBenchActor.py:34-60,205-331``: the
reference feeds TTS output through a ``SoundPreBatcher`` into STT and scores
prompt-vs-transcript with BERT-embedding cosine similarity per speaker,
checkpointing results per speaker across generations.  Here:

- audio flows TTS engine -> (16 kHz) -> STT engine;
- similarity is pluggable: default is a character-level ratio (works
  offline); pass an embedding callback for BERT-class scoring with real
  checkpoints;
- per-speaker scores persist as JSON for resumable generational runs.
"""

from __future__ import annotations

import difflib
import json
import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import numpy as np


@dataclass
class SpeakerScore:
    speaker_id: int
    similarity: float
    prompt: str
    transcript: str
    audio_s: float


def text_similarity(a: str, b: str) -> float:
    """Default offline similarity (the reference uses BERT cosine)."""
    return difflib.SequenceMatcher(None, a.lower(), b.lower()).ratio()


class LoopbackQA:
    def __init__(self, tts_engine, stt_engine, tokenize, detokenize=None,
                 similarity: Callable[[str, str], float] = text_similarity,
                 checkpoint_path: Optional[str] = None):
        self.tts = tts_engine
        self.stt = stt_engine
        self.tokenize = tokenize
        self.detok = detokenize
        self.similarity = similarity
        self.checkpoint_path = checkpoint_path
        self.scores: Dict[int, float] = {}
        if checkpoint_path and os.path.exists(checkpoint_path):
            with open(checkpoint_path) as f:
                self.scores = {int(k): v for k, v in json.load(f).items()}

    def _speak(self, prompt: str, speaker, max_frames: int = 128) -> np.ndarray:
        chunks: List[np.ndarray] = []
        done = []
        self.tts.start_session(self.tokenize(prompt), speaker,
                               lambda a: done.append(1) if a is None
                               else chunks.append(a),
                               max_frames=max_frames)
        while self.tts.step():
            pass
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    def _transcribe(self, audio: np.ndarray, lang: str = "en") -> str:
        from ..serving.stt_engine import STTRequest

        out: List = []
        self.stt.submit(STTRequest(audio=audio, text_cb=out.append, lang=lang))
        while self.stt.step():
            pass
        return out[0].text if out else ""

    def score_speaker(self, speaker_id: int, speaker_vec, prompt: str) -> SpeakerScore:
        audio = self._speak(prompt, speaker_vec)
        # TTS engine emits at its sample_rate; STT expects 16 kHz
        sr = self.tts.ecfg.sample_rate
        if sr != 16000:
            from ..audio.chunk import AudioChunk

            audio = AudioChunk(audio, sr).resample(16000).audio
        transcript = self._transcribe(audio)
        sim = self.similarity(prompt, transcript)
        self.scores[speaker_id] = sim
        return SpeakerScore(speaker_id, sim, prompt, transcript,
                            len(audio) / 16000.0)

    def run_generation(self, bank, speaker_ids, prompts) -> List[SpeakerScore]:
        out = []
        for i, sid in enumerate(speaker_ids):
            out.append(self.score_speaker(sid, bank.get(sid),
                                          prompts[i % len(prompts)]))
        if self.checkpoint_path:
            with open(self.checkpoint_path, "w") as f:
                json.dump(self.scores, f)
        return out

    def top_speakers(self, n: int = 50) -> List[int]:
        return [sid for sid, _ in sorted(self.scores.items(),
                                         key=lambda kv: -kv[1])[:n]]


def main() -> None:
    """Loopback QA over the in-repo-trained tiny pair (VERDICT r2 item 2
    'Done' criterion: similarity > 0.8 on trained-model round trips).

    Usage: python -m infernos_tpu.bench.loopback [--speakers 8] [--prompts 2]
    """
    import argparse
    import sys
    from pathlib import Path

    from ..models import tiny_real
    from ..serving.stt_engine import STTEngine
    from ..serving.tts_engine import TTSEngine, TTSEngineConfig
    from ..utils.compile_cache import enable

    enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--speakers", type=int, default=8)
    ap.add_argument("--prompts", type=int, default=2)
    a = ap.parse_args()

    if not (tiny_real.have_tiny_stt() and tiny_real.have_tiny_tts()):
        print(json.dumps({"metric": "loopback_similarity", "value": 0,
                          "error": "tiny trained pair not present"}))
        return

    t5, tcfg, voc, vcfg, ttok, table = tiny_real.load_tiny_tts()
    sparams, scfg, stok, secfg = tiny_real.load_tiny_stt()
    tts = TTSEngine(t5, tcfg, voc, vcfg, TTSEngineConfig(
        batch_slots=4, max_text_tokens=48, max_steps=170,
        stop_threshold=0.5))
    stt = STTEngine(sparams, scfg, secfg, detokenize=stok.detokenize)

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from tools.speechlang import checkpoint_words, transcript_corpus

    # sample the vocabulary the SERVING checkpoint was trained on (the
    # trainers' WORDS went bilingual ahead of the bilingual checkpoints)
    prompts = transcript_corpus(a.prompts, seed=555,
                                words=checkpoint_words("tiny_stt"))
    qa = LoopbackQA(tts, stt, tokenize=ttok)

    class _Bank:
        def get(self, sid):
            return table[sid % len(table)]

    scores = qa.run_generation(_Bank(), list(range(a.speakers)),
                               prompts * a.speakers)
    sims = [s.similarity for s in scores]
    out = {
        "metric": "loopback_similarity",
        "value": round(float(np.mean(sims)), 3),
        "unit": "char-level prompt<->transcript similarity (ref: BERT "
                "cosine, Cluster/InfernBenchActor.py:76-86)",
        "detail": {
            "median": round(float(np.median(sims)), 3),
            "frac_above_0.8": round(float(np.mean(
                [s > 0.8 for s in sims])), 3),
            "samples": [
                {"speaker": s.speaker_id, "sim": round(s.similarity, 3),
                 "prompt": s.prompt, "transcript": s.transcript}
                for s in scores[:4]],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
