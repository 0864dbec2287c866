"""A compositional synthetic spoken language with exact transcripts.

The real checkpoints the reference serves (whisper-large-v3, SpeechT5)
cannot be fetched under zero egress (PERF.md round-2 availability
statement).  To make every end-to-end number meaningful anyway -- real EOS
behavior, real transcripts, real loopback similarity -- this module defines
a deterministic audio code for text: each letter renders as a vowel-like
formant gesture (harmonic glottal source filtered by a letter-specific
(F1, F2) resonator pair), words are letter sequences, utterances are word
sequences with pauses.  It IS formant speech (the in-repo VAD accepts it),
it is compositional (models trained on it generalize to unseen words), and
its transcript labels are exact by construction.

Speaker variation: f0 (90-260 Hz), speaking rate, per-letter duration
jitter, formant jitter, amplitude envelope, additive noise -- so STT must
learn the letter code, not memorize waveforms.

Rendered at 16 kHz (pipeline-native TTS rate); downsample to 8 k for RTP.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

SR = 16000
LETTER_DUR = 0.095   # seconds per letter gesture (before rate scaling)
LETTER_GAP = 0.012
WORD_GAP = 0.11

ALPHABET = "abcdefghijklmnopqrstuvwxyz"

# (F1, F2) grid: 5 F1 x 6 F2 = 30 slots, telephone-band safe.  F1 spacing
# (150 Hz) is ~2x the resonator bandwidth and close to the speaker f0
# ceiling, so adjacent slots stay separable; vibrato (below) smears
# harmonics across the resonance so the formant, not the harmonic comb,
# dominates the time-averaged spectrum.
_F1S = [280, 420, 560, 700, 840]
_F2S = [1250, 1600, 2000, 2450, 2950, 3300]


def letter_formants(ch: str) -> Tuple[float, float]:
    i = ALPHABET.index(ch)
    return float(_F1S[i % 5]), float(_F2S[i // 5])


@dataclass
class Speaker:
    f0: float
    rate: float       # duration multiplier
    breathiness: float
    tilt: float       # spectral tilt factor

    @classmethod
    def random(cls, rng: np.random.Generator) -> "Speaker":
        # f0 capped at 170 Hz: harmonics must sample each 120 Hz-spaced F1
        # slot (higher f0 quantizes formant peaks to the harmonic comb and
        # letters become ambiguous)
        return cls(f0=float(rng.uniform(85, 170)),
                   rate=float(rng.uniform(0.85, 1.2)),
                   breathiness=float(rng.uniform(0.0, 0.08)),
                   tilt=float(rng.uniform(0.7, 1.0)))


def _resonator(freq: float, bw: float, sr: int = SR):
    r = np.exp(-np.pi * bw / sr)
    theta = 2 * np.pi * freq / sr
    return [1.0 - r], [1.0, -2 * r * np.cos(theta), r * r]


def _filt(b, a, x):
    from scipy import signal as sig

    return sig.lfilter(b, a, x).astype(np.float32)


def render_letter(rng: np.random.Generator, ch: str, spk: Speaker
                  ) -> np.ndarray:
    """One vowel-like gesture for a letter."""
    dur = LETTER_DUR * spk.rate * rng.uniform(0.9, 1.12)
    n = int(dur * SR)
    # glottal source: decaying harmonics at f0 with jitter + 5 Hz vibrato
    # (vibrato sweeps harmonics through the resonances, so the time-averaged
    # spectrum shows the FORMANT, not the harmonic comb)
    f0 = spk.f0 * rng.uniform(0.96, 1.04)
    t = np.arange(n) / SR
    vib = 1.0 + 0.03 * np.sin(2 * np.pi * 5.0 * t + rng.uniform(0, 6.28))
    drift = 1.0 + 0.01 * np.cumsum(rng.standard_normal(n)) / np.sqrt(n)
    phase = np.cumsum(2 * np.pi * f0 * vib * drift / SR)
    src = np.zeros(n, np.float32)
    for h in range(1, 10):
        src += (spk.tilt ** (h - 1)) * np.sin(h * phase).astype(np.float32) / h
    src += spk.breathiness * rng.standard_normal(n).astype(np.float32)
    f1, f2 = letter_formants(ch)
    jit = rng.uniform(0.985, 1.015, size=2)
    out = _filt(*_resonator(f1 * jit[0], 60.0), src)
    out = out + _filt(*_resonator(f2 * jit[1], 100.0), src)
    out = out + 0.25 * _filt(*_resonator(2900.0, 250.0), src)
    # 8 ms raised-cosine edges
    e = max(2, int(0.008 * SR))
    env = np.ones(n, np.float32)
    ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(e) / e)
    env[:e] = ramp
    env[-e:] = ramp[::-1]
    out *= env
    peak = np.abs(out).max() + 1e-9
    return (out / peak).astype(np.float32)


def render_text(rng: np.random.Generator, text: str,
                spk: Optional[Speaker] = None,
                snr_db: Optional[float] = None) -> np.ndarray:
    """Text (lowercase a-z + spaces) -> 16 kHz waveform."""
    if spk is None:
        spk = Speaker.random(rng)
    gap = np.zeros(int(LETTER_GAP * spk.rate * SR), np.float32)
    wgap = np.zeros(int(WORD_GAP * spk.rate * SR), np.float32)
    parts: List[np.ndarray] = []
    for w, word in enumerate(text.split()):
        if w:
            parts.append(wgap)
        for i, ch in enumerate(word):
            if ch not in ALPHABET:
                continue
            if i:
                parts.append(gap)
            parts.append(render_letter(rng, ch, spk))
    if not parts:
        return np.zeros(SR // 10, np.float32)
    audio = np.concatenate(parts)
    if snr_db is None:
        snr_db = float(rng.uniform(14, 40))
    sp = np.sqrt(np.mean(audio ** 2) + 1e-12)
    noise = rng.standard_normal(len(audio)).astype(np.float32)
    audio = audio + noise * sp * 10 ** (-snr_db / 20)
    peak = np.abs(audio).max() + 1e-9
    return (0.9 * audio / peak).astype(np.float32)


# -- corpus -------------------------------------------------------------------

EN_WORDS = (
    "zero one two three four five six seven eight nine "
    "call the to my for please yes no hello thanks goodbye "
    "transfer billing sales support agent line hold wait back "
    "account number order status open close check pay card "
    "help now today monday friday morning evening new old "
    "can you me speak with from name is this that what when "
    "where need want have will get department service team "
    "manager office phone time date confirm cancel repeat"
).split()

# Bilingual corpus: the LiveTranslator's pt leg speaks the lexicon
# counterparts (infernos_tpu/t2t/lexicon.py), so STT/TTS training must
# see BOTH vocabularies -- a seq2seq decoder trained on one closed
# vocabulary snaps unseen words to trained ones (measured: 0% word
# accuracy on pt-side words with the en-only round-3 checkpoint).
def _pt_words():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from infernos_tpu.t2t.lexicon import EN_PT

    # full pt side (what the LT pt leg can actually say), and the subset
    # not already in EN_WORDS (identity translations like "zero") for the
    # deduplicated mixed corpus
    full = [EN_PT[w] for w in EN_WORDS if w in EN_PT]
    new = [w for w in full if w not in EN_WORDS]
    return full, new


PT_WORDS, _PT_NEW = _pt_words()
WORDS = EN_WORDS + _PT_NEW

_LANG_VOCABS = {None: None, "en": EN_WORDS, "pt": PT_WORDS}


def make_utterance(rng: np.random.Generator, n_words: Tuple[int, int] = (2, 6),
                   spk: Optional[Speaker] = None,
                   words: Optional[List[str]] = None,
                   lang: Optional[str] = None) -> Tuple[np.ndarray, str]:
    """Random utterance -> (16 kHz audio, transcript).

    ``lang`` picks a language-pure vocabulary ('en'/'pt'; None = the full
    mixed corpus) -- used by the language-conditioned STT training
    (whisper's per-language token design, the real model's
    ``<|en|>``/``<|pt|>``)."""
    vocab = words if words is not None else _LANG_VOCABS[lang]
    if vocab is None:
        vocab = WORDS
    k = int(rng.integers(n_words[0], n_words[1] + 1))
    picked = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(k)]
    text = " ".join(picked)
    return render_text(rng, text, spk), text


def transcript_corpus(n: int, seed: int = 0,
                      words: Optional[List[str]] = None) -> List[str]:
    vocab = WORDS if words is None else words
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        k = int(rng.integers(2, 7))
        out.append(" ".join(vocab[int(rng.integers(0, len(vocab)))]
                            for _ in range(k)))
    return out


def checkpoint_words(name: str = "tiny_stt") -> List[str]:
    """Vocabulary a committed tiny-real checkpoint was TRAINED on.

    Serving benches must sample from the serving model's corpus, not the
    trainers' (WORDS went bilingual before any bilingual checkpoint
    landed; drawing pt words against the en-only round-3 checkpoint
    collapses half the bench corpus to garbage).  Trainers record
    ``corpus.json`` next to the weights; absent one, the round-3
    checkpoints mean EN_WORDS.
    """
    import json

    from infernos_tpu.models.npz_io import data_path

    path = os.path.join(data_path(name), "corpus.json")
    try:
        with open(path) as f:
            return list(json.load(f)["words"])
    except (OSError, KeyError, ValueError):
        return list(EN_WORDS)
