"""Speaker-embedding bank for TTS voices.

Capability parity: the reference loads 7931 CMU-Arctic xvectors from a HF
dataset (``HelloSippyTTSRT/HelloSippyRTPipe.py:181-183``) and picks voices by
index, including a curated best-voices list from benchmark checkpoints
(``Apps/LiveTranslator/LTSession.py:25-42``) and a random-voice API
(``Cluster/InfernTTSActor.py:50-52``).

Offline behaviour: if a local ``.npz`` bank is available it is used;
otherwise a deterministic synthetic bank of unit-norm vectors is generated
(seeded), which keeps every voice-selection code path exercised with random
model weights.  ``load_hf_xvectors`` ports the real bank when the dataset is
reachable/cached.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

DEFAULT_N_SPEAKERS = 7931  # CMU-Arctic xvector count in the reference bank


class SpeakerBank:
    def __init__(self, vectors: np.ndarray):
        assert vectors.ndim == 2
        self.vectors = vectors.astype(np.float32)
        self._rng = np.random.default_rng(0)

    # -- constructors -------------------------------------------------------
    @classmethod
    def synthetic(cls, dim: int = 512, n: int = DEFAULT_N_SPEAKERS,
                  seed: int = 42) -> "SpeakerBank":
        rng = np.random.default_rng(seed)
        v = rng.standard_normal((n, dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return cls(v)

    @classmethod
    def from_npz(cls, path: str) -> "SpeakerBank":
        data = np.load(path)
        return cls(data["xvectors"])

    @classmethod
    def load(cls, path: Optional[str] = None, dim: int = 512) -> "SpeakerBank":
        if path and os.path.exists(path):
            return cls.from_npz(path)
        return cls.synthetic(dim=dim)

    @staticmethod
    def load_hf_xvectors(out_path: str) -> None:
        """Fetch + cache the CMU-Arctic xvector bank (needs network once)."""
        from datasets import load_dataset  # type: ignore

        ds = load_dataset("Matthijs/cmu-arctic-xvectors", split="validation")
        vecs = np.stack([np.asarray(r["xvector"], np.float32) for r in ds])
        np.savez_compressed(out_path, xvectors=vecs)

    # -- access -------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.vectors)

    def get(self, idx: int) -> np.ndarray:
        return self.vectors[idx % len(self.vectors)]

    def rand_id(self) -> int:
        return int(self._rng.integers(0, len(self.vectors)))

    def top_speakers(self, lang: str, n: int = 50) -> List[int]:
        """Curated best voices per language.  With no QA checkpoints yet,
        fall back to a deterministic language-keyed sample (the loopback-QA
        bench, ``bench/loopback.py``, produces real rankings)."""
        rng = np.random.default_rng(abs(hash(lang)) % (2**32))
        return list(rng.choice(len(self.vectors), size=min(n, len(self.vectors)),
                               replace=False))
