"""TTS bench harness, loopback QA, and checkpoint round-trip tests."""

import numpy as np
import pytest

import jax

from infernos_tpu.bench.loopback import LoopbackQA, text_similarity
from infernos_tpu.bench.ttsbench import run_bench, summarize
from infernos_tpu.models import checkpoint as ckpt
from infernos_tpu.models import hifigan as hfg
from infernos_tpu.models import presets
from infernos_tpu.models import speecht5 as st5
from infernos_tpu.models import whisper as wsp
from infernos_tpu.models.tokenizers import CharTokenizer
from infernos_tpu.serving.speakers import SpeakerBank
from infernos_tpu.serving.stt_engine import STTEngine, STTEngineConfig
from infernos_tpu.serving.tts_engine import TTSEngine, TTSEngineConfig


def _tts_engine(seed=0):
    cfg, voc = presets.SPEECHT5_TINY, presets.HIFIGAN_TINY
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return TTSEngine(
        st5.init_params(k1, cfg), cfg, hfg.init_params(k2, voc), voc,
        TTSEngineConfig(batch_slots=4, max_text_tokens=64, max_steps=24,
                        chunk_schedule=(8, 16), stop_threshold=2.0),
    )


def test_ttsbench_reports():
    reps = run_bench(n_sessions=6, engine=_tts_engine(), max_frames=32)
    assert len(reps) == 6
    for r in reps:
        assert r.frames >= 0
        assert r.time_to_first_frame <= r.time_to_last_frame
        assert r.rtr > 0
    s = summarize(reps)
    assert s["sessions"] == 6
    assert s["ttff_p50"] <= s["ttff_p95"]


def test_ttsbench_deterministic_frames():
    a = run_bench(n_sessions=4, engine=_tts_engine(seed=1), max_frames=32)
    b = run_bench(n_sessions=4, engine=_tts_engine(seed=1), max_frames=32)
    assert [r.frames for r in a] == [r.frames for r in b]


def test_loopback_qa_scores_speakers(tmp_path):
    tts = _tts_engine(seed=2)
    stt = STTEngine(
        wsp.init_params(jax.random.PRNGKey(0), presets.WHISPER_TINY_TEST),
        presets.WHISPER_TINY_TEST,
        STTEngineConfig(batch_slots=2, buckets_s=(2,), max_new_tokens=6,
                        max_prompt_tokens=8, lang_tokens={"en": 10},
                        task_transcribe=12, task_translate=13,
                        no_timestamps=14, no_speech=4),
    )
    bank = SpeakerBank.synthetic(dim=presets.SPEECHT5_TINY.speaker_embedding_dim,
                                 n=8)
    qa = LoopbackQA(tts, stt, tokenize=CharTokenizer(),
                    checkpoint_path=str(tmp_path / "qa.json"))
    scores = qa.run_generation(bank, [0, 3, 5], ["hello world test."])
    assert len(scores) == 3
    for s in scores:
        assert 0.0 <= s.similarity <= 1.0
        assert s.audio_s > 0
    top = qa.top_speakers(2)
    assert len(top) == 2
    # resumable: a new QA object reloads the persisted scores
    qa2 = LoopbackQA(tts, stt, tokenize=CharTokenizer(),
                     checkpoint_path=str(tmp_path / "qa.json"))
    assert qa2.scores == qa.scores


def test_loopback_bank_sweep_resumes(tmp_path):
    """run_bank: every (voice, prompt) cell scored; per-voice means in
    .scores; an interrupted sweep resumes from the cell checkpoint without
    re-scoring completed cells (VERDICT r3 item 6: whole-bank QA)."""
    tts = _tts_engine(seed=3)
    stt = STTEngine(
        wsp.init_params(jax.random.PRNGKey(0), presets.WHISPER_TINY_TEST),
        presets.WHISPER_TINY_TEST,
        STTEngineConfig(batch_slots=2, buckets_s=(2,), max_new_tokens=6,
                        max_prompt_tokens=8, lang_tokens={"en": 10},
                        task_transcribe=12, task_translate=13,
                        no_timestamps=14, no_speech=4),
    )
    bank = SpeakerBank.synthetic(dim=presets.SPEECHT5_TINY.speaker_embedding_dim,
                                 n=4)
    ckpt_p = str(tmp_path / "cells.json")
    prompts = ["hello world.", "test prompt."]
    qa = LoopbackQA(tts, stt, tokenize=CharTokenizer(), checkpoint_path=ckpt_p)
    done = []
    pv = qa.run_bank(bank, [0, 1], prompts,
                     on_voice_done=lambda sid, _: done.append(sid))
    assert done == [0, 1]
    assert set(pv) == {0, 1}
    assert all(len(rows) == 2 for rows in pv.values())
    assert set(qa.scores) == {0, 1}
    import json as _json

    cells = _json.loads(open(ckpt_p).read())
    assert set(cells) == {"0:0", "0:1", "1:0", "1:1"}
    # resume: a fresh sweep over a SUPERSET of voices reuses the cells
    # (dict cells carry the transcript through the resume, ADVICE r4) and
    # only scores voice 2
    qa2 = LoopbackQA(tts, stt, tokenize=CharTokenizer(), checkpoint_path=ckpt_p)
    pv2 = qa2.run_bank(bank, [0, 1, 2], prompts)
    assert ([r.transcript for r in pv2[0] + pv2[1]]
            == [r.transcript for r in pv[0] + pv[1]])
    assert [r.similarity for r in pv2[0]] == [r.similarity for r in pv[0]]
    assert set(qa2.scores) == {0, 1, 2}
    # legacy bare-float cells (pre-r5 checkpoints) still resume, with the
    # transcript lost but the similarity preserved
    legacy = {k: (v["sim"] if isinstance(v, dict) else v)
              for k, v in _json.loads(open(ckpt_p).read()).items()
              if ":" in k}
    open(ckpt_p, "w").write(_json.dumps(legacy))
    qa3 = LoopbackQA(tts, stt, tokenize=CharTokenizer(), checkpoint_path=ckpt_p)
    pv3 = qa3.run_bank(bank, [0, 1], prompts)
    assert all(r.transcript == "" for r in pv3[0] + pv3[1])
    assert [r.similarity for r in pv3[0]] == [r.similarity for r in pv[0]]


def test_text_similarity():
    assert text_similarity("hello world", "hello world") == 1.0
    assert text_similarity("hello", "goodbye") < 0.5


def test_checkpoint_roundtrip(tmp_path):
    cfg = presets.QWEN_TINY
    from infernos_tpu.models import qwen

    params = qwen.init_params(jax.random.PRNGKey(0), cfg)
    ckpt.save(str(tmp_path / "m"), params, config=cfg)
    like = qwen.init_params(jax.random.PRNGKey(1), cfg)  # different values
    loaded = ckpt.load(str(tmp_path / "m"), like)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cfg2 = ckpt.load_config(str(tmp_path / "m"), type(cfg))
    assert cfg2.hidden_size == cfg.hidden_size
