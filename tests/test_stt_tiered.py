"""Tiered STT engine: routing, combined stepping, supervision surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infernos_tpu.serving.stt_engine import STTEngineConfig, STTRequest
from infernos_tpu.serving.stt_tiered import TieredSTTConfig, TieredSTTEngine
from infernos_tpu.models import whisper as wsp

from test_stt_engine import TINY


@pytest.fixture(scope="module")
def eng():
    params = wsp.init_params(jax.random.PRNGKey(0), TINY)
    base = STTEngineConfig(
        batch_slots=2, buckets_s=(1, 2), sample_rate=16000,
        max_new_tokens=6, max_prompt_tokens=8,
        lang_tokens={"en": 10}, task_transcribe=12, task_translate=13,
        no_timestamps=14, no_speech=4)
    tcfg = TieredSTTConfig(short_max_s=1, short_slots=3, long_slots=2,
                           base=base)
    return TieredSTTEngine(params, TINY, tcfg)


def _audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(int(16000 * seconds))).astype(np.float32)


def test_routes_by_length_and_decodes_both(eng):
    out = []
    eng.submit(STTRequest(audio=_audio(0.5, 1), text_cb=out.append))   # short
    eng.submit(STTRequest(audio=_audio(1.7, 2), text_cb=out.append))   # long
    eng.step()  # submits are deferred; the first step joins them
    assert eng.short.n_active == 1 and eng.long.n_active == 1
    while eng.step():
        pass
    assert len(out) == 2
    durs = sorted(r.duration for r in out)
    assert durs == [0.5, 1.7]


def test_results_match_untiered(eng):
    """A short utterance must transcribe identically through either tier
    (same weights, same 1 s bucket)."""
    from infernos_tpu.serving.stt_engine import STTEngine

    got_t, got_u = [], []
    eng.submit(STTRequest(audio=_audio(0.6, 5), text_cb=got_t.append))
    while eng.step():
        pass
    solo = STTEngine(eng.short.params, TINY, eng.short.ecfg)
    solo.submit(STTRequest(audio=_audio(0.6, 5), text_cb=got_u.append))
    while solo.step():
        pass
    assert got_t[0].tokens == got_u[0].tokens


def test_abort_flushes_both_tiers(eng):
    out = []
    eng.submit(STTRequest(audio=_audio(0.5, 7), text_cb=out.append))
    eng.submit(STTRequest(audio=_audio(1.9, 8), text_cb=out.append))
    eng.abort_all("test")
    assert len(out) == 2
    assert eng.n_active == 0
