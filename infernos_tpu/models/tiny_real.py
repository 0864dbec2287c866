"""Loaders for the in-repo-trained tiny-but-real STT/TTS pair.

``tools/train_tiny_stt.py`` / ``tools/train_tiny_tts.py`` train small
Whisper/SpeechT5+HiFi-GAN configs on the synthetic spoken language
(tools/speechlang.py) until transcripts round-trip.  Serving them makes
every e2e number meaningful -- EOS fires from data, loopback similarity is
real, turn latency is measured (VERDICT r2 item 2) -- while the real
checkpoints (whisper-large-v3 etc., unfetchable offline) stay a data-only
port away (``tools/port_checkpoints.py``).

Set ``INFERNOS_MODEL_MODE=tiny-real`` to make the model actors serve these
(``cluster/model_actors.py``).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from .npz_io import data_path, load_params

# Contract with tools/train_tiny_stt.py: byte alphabet 0..255, then these
# specials in order (a fresh save also writes special_tokens.json).
STT_SPECIALS = ["<|sot|>", "<|eos|>", "<|nospeech|>", "<|pad|>",
                "<|lang_en|>", "<|transcribe|>", "<|notimestamps|>",
                "<|startofprev|>"]


def have_tiny_stt() -> bool:
    return os.path.exists(os.path.join(data_path("tiny_stt"), "params.npz"))


def have_tiny_tts() -> bool:
    return os.path.exists(os.path.join(data_path("tiny_tts"),
                                       "t5_params.npz"))


def _load_cfg(directory: str, cls, name: str = "config.json"):
    with open(os.path.join(directory, name)) as f:
        d = json.load(f)
    fields = {f.name for f in cls.__dataclass_fields__.values()} \
        if hasattr(cls, "__dataclass_fields__") else set(d)
    kw = {}
    for k, v in d.items():
        if k in fields:
            kw[k] = tuple(v) if isinstance(v, list) else v
    # nested tuples (hifigan resblock_dilation_sizes)
    for k, v in kw.items():
        if isinstance(v, tuple) and v and isinstance(v[0], list):
            kw[k] = tuple(tuple(x) for x in v)
    return cls(**kw)


def load_tiny_stt():
    """-> (params, WhisperConfig, tokenizer, STTEngineConfig)."""
    from ..serving.stt_engine import STTEngineConfig
    from .bpe import ByteLevelBPE
    from .whisper import WhisperConfig

    d = data_path("tiny_stt")
    cfg = _load_cfg(d, WhisperConfig)
    params = load_params(os.path.join(d, "params.npz"))
    sp_path = os.path.join(d, "special_tokens.json")
    if os.path.exists(sp_path):
        with open(sp_path) as f:
            specials = json.load(f)
    else:
        specials = {t: 256 + i for i, t in enumerate(STT_SPECIALS)}
    tok = ByteLevelBPE.from_files(
        os.path.join(d, "tokenizer", "vocab.json"),
        os.path.join(d, "tokenizer", "merges.txt"),
        special_tokens=specials)
    ecfg = STTEngineConfig(
        batch_slots=8,
        buckets_s=(2, 5),  # model trained on <=5 s utterances
        max_new_tokens=40,
        max_prompt_tokens=16,
        context_tokens=10,
        lang_tokens={"en": specials["<|lang_en|>"],
                     # language-conditioned checkpoints (round 4+) carry a
                     # true pt token; older en-only ones route pt -> en
                     "pt": specials.get("<|lang_pt|>",
                                        specials["<|lang_en|>"])},
        task_transcribe=specials["<|transcribe|>"],
        task_translate=specials["<|transcribe|>"],  # translate untrained
        no_timestamps=specials["<|notimestamps|>"],
        no_speech=specials["<|nospeech|>"],
        sot_prev=specials["<|startofprev|>"],
        suppress_tokens=(), begin_suppress_tokens=(),
        cross_kv_int8=False,
        # the tiny model trains on renders starting at t=0; VAD pre-roll
        # silence garbles it (round-5 finding, see STTEngineConfig)
        trim_lead_silence=3e-3,
    )
    return params, cfg, tok, ecfg


def have_tiny_llm() -> bool:
    return os.path.exists(os.path.join(data_path("tiny_llm"), "params.npz"))


def load_tiny_llm():
    """-> (params, QwenConfig).

    Trained by ``tools/train_tiny_llm.py`` on the attendant-policy dialogue
    task; serving tokenizer is the plain :class:`ByteTokenizer` (the
    trainer encodes ChatML with it, so no tokenizer files are needed).
    """
    from .qwen import QwenConfig

    d = data_path("tiny_llm")
    cfg = _load_cfg(d, QwenConfig)
    params = load_params(os.path.join(d, "params.npz"))
    return params, cfg


def load_tiny_tts(vocoder: str = None):
    """-> (t5_params, SpeechT5Config, voc_params, voc_cfg,
    tokenizer, speaker_table [N, spk_dim]).

    ``vocoder`` (or ``INFERNOS_TTS_VOCODER``): ``"gl"`` (default) serves
    the deterministic Griffin-Lim mel inverter -- the in-repo GAN-less
    HiFi-GAN destroys formant content (copy-synthesis intelligibility 0.34
    vs 0.97, round-3 diagnostic); ``"hifigan"`` serves the trained
    checkpoint (the path real ported weights use).
    """
    from ..audio import griffinlim as gl
    from .hifigan import HifiGanConfig
    from .speecht5 import SpeechT5Config
    from .spm import load_spm_model

    d = data_path("tiny_tts")
    cfg = _load_cfg(d, SpeechT5Config)
    params = load_params(os.path.join(d, "t5_params.npz"))
    tok = load_spm_model(os.path.join(d, "tokenizer", "spiece.model"))
    table = np.load(os.path.join(d, "speakers.npz"))["table"]
    if vocoder is None:
        vocoder = os.environ.get("INFERNOS_TTS_VOCODER", "gl")
    if vocoder == "gl":
        vcfg = gl.GriffinLimConfig(n_mels=cfg.num_mel_bins)
        voc_params = gl.init_params(vcfg)
    else:
        vcfg = _load_cfg(d, HifiGanConfig, "voc_config.json")
        voc_params = load_params(os.path.join(d, "voc_params.npz"))
    return params, cfg, voc_params, vcfg, tok, table
