"""Submission paths must not starve behind a saturated engine driver.

Round-4 ramp postmortem (PERF.md): at 8 concurrent LT calls the TTS
engine was continuously busy, so its driver thread re-acquired the
engine-state lock in a hot ``while step()`` loop.  Python locks are
unfair -- the actor mailbox's ``start_session`` waited MINUTES for the
lock, wedging the TTS actor and cascading 30 s ``ask_sync`` timeouts
through the app layer (the reference never hits this because its worker
queues are the only cross-thread seam, ``Cluster/InfernBatchedWorker.py``).

The fix: engine submission paths (TTS ``start_session``/``cancel``,
STT ``submit``, LLM ``submit``) go through a dedicated small lock and
defer device work to the driver thread.  These tests drive each engine
from a hot driver thread while submitting from another thread and bound
the submit latency.
"""

import threading
import time

import numpy as np
import pytest

import jax

from infernos_tpu.serving.llm_engine import LLMEngine, LLMEngineConfig, LLMRequest
from infernos_tpu.serving.stt_engine import STTEngine, STTEngineConfig, STTRequest
from infernos_tpu.serving.tts_engine import TTSEngine, TTSEngineConfig

from tests.test_llm_engine import TINY as LLM_TINY
from tests.test_stt_engine import TINY as STT_TINY
from tests.test_tts_engine import TINY as TTS_TINY, VOC

from infernos_tpu.models import hifigan as hfg
from infernos_tpu.models import qwen
from infernos_tpu.models import speecht5 as st5
from infernos_tpu.models import whisper as wsp

# generous on a loaded 1-core CI host; the pre-fix behavior waits until
# the engine IDLES (unboundedly long under sustained load)
SUBMIT_BUDGET_S = 3.0


class _HotDriver:
    """Hot-loops engine.step() like serving.driver.EngineDriver at load."""

    def __init__(self, engine):
        self.engine = engine
        self.stop = threading.Event()
        self.thr = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self.stop.is_set():
            self.engine.step()

    def __enter__(self):
        self.thr.start()
        return self

    def __exit__(self, *exc):
        self.stop.set()
        self.thr.join(timeout=10.0)


def _saturate_tts(eng, n):
    for i in range(n):
        eng.start_session(np.arange(2, 8, dtype=np.int32),
                          np.zeros(TTS_TINY.speaker_embedding_dim, np.float32),
                          lambda a: None, max_frames=10_000)


def test_tts_start_session_never_starves():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = st5.init_params(k1, TTS_TINY)
    voc_params = hfg.init_params(k2, VOC)
    ecfg = TTSEngineConfig(batch_slots=4, max_text_tokens=16, max_steps=4096,
                           pre_frames=4, chunk_schedule=(8,), min_steps=2,
                           stop_threshold=2.0)  # never stops: stays saturated
    eng = TTSEngine(params, TTS_TINY, voc_params, VOC, ecfg)
    _saturate_tts(eng, 4)  # all slots busy forever
    with _HotDriver(eng):
        time.sleep(0.3)  # let the driver saturate the engine lock
        for _ in range(5):
            t0 = time.monotonic()
            sid = eng.start_session(
                np.arange(2, 6, dtype=np.int32),
                np.zeros(TTS_TINY.speaker_embedding_dim, np.float32),
                lambda a: None)
            dt = time.monotonic() - t0
            assert dt < SUBMIT_BUDGET_S, f"start_session starved: {dt:.1f}s"
            t0 = time.monotonic()
            eng.cancel_session(sid)  # queued -> immediate EOS
            dt = time.monotonic() - t0
            assert dt < SUBMIT_BUDGET_S, f"cancel_session starved: {dt:.1f}s"


def test_stt_submit_never_starves():
    params = wsp.init_params(jax.random.PRNGKey(0), STT_TINY)
    ecfg = STTEngineConfig(
        batch_slots=2, buckets_s=(1,), max_new_tokens=200,
        max_prompt_tokens=8,
        lang_tokens={"en": 10}, task_transcribe=12, task_translate=13,
        no_timestamps=14, no_speech=4)
    eng = STTEngine(params, STT_TINY, ecfg)
    results = []
    # long decode budget + random weights that rarely emit EOS keeps the
    # driver busy; queue more than the slots hold
    for i in range(4):
        eng.submit(STTRequest(
            audio=np.random.default_rng(i).standard_normal(8000)
            .astype(np.float32), text_cb=results.append))
    with _HotDriver(eng):
        time.sleep(0.3)
        for i in range(5):
            t0 = time.monotonic()
            eng.submit(STTRequest(
                audio=np.zeros(4000, np.float32), text_cb=results.append))
            dt = time.monotonic() - t0
            assert dt < SUBMIT_BUDGET_S, f"stt submit starved: {dt:.1f}s"


def test_llm_submit_never_starves():
    params = qwen.init_params(jax.random.PRNGKey(0), LLM_TINY)
    ecfg = LLMEngineConfig(batch_slots=2, prompt_buckets=(16,),
                           max_total_tokens=220, max_new_tokens=200)
    eng = LLMEngine(params, LLM_TINY, ecfg)
    eng.warmup()
    sink = lambda s, f: None
    for i in range(3):
        eng.submit(LLMRequest(np.arange(3, 10, dtype=np.int32), sink))
    with _HotDriver(eng):
        time.sleep(0.3)
        for i in range(5):
            t0 = time.monotonic()
            eng.submit(LLMRequest(np.arange(3, 10, dtype=np.int32), sink))
            dt = time.monotonic() - t0
            assert dt < SUBMIT_BUDGET_S, f"llm submit starved: {dt:.1f}s"


def test_stt_deferred_submit_completes():
    """submit() is now deferred to the driver; a manual step loop must
    still flush and complete queued requests (engine-level contract)."""
    params = wsp.init_params(jax.random.PRNGKey(0), STT_TINY)
    ecfg = STTEngineConfig(
        batch_slots=2, buckets_s=(1,), max_new_tokens=4,
        max_prompt_tokens=8,
        lang_tokens={"en": 10}, task_transcribe=12, task_translate=13,
        no_timestamps=14, no_speech=4)
    eng = STTEngine(params, STT_TINY, ecfg)
    outs = []
    for i in range(3):
        eng.submit(STTRequest(audio=np.zeros(4000, np.float32),
                              text_cb=outs.append))
    while eng.step():
        pass
    assert len(outs) == 3
