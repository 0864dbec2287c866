"""Paced concurrent-call bench harness tests (tiny engine, CPU)."""

import numpy as np
import pytest

import jax

from infernos_tpu.bench.paced_calls import (
    PacedCallConfig, _Call, find_max_calls, run_paced,
)
from infernos_tpu.models import hifigan as hfg
from infernos_tpu.models import speecht5 as st5
from infernos_tpu.serving.tts_engine import TTSEngine, TTSEngineConfig

TINY = st5.SpeechT5Config(
    vocab_size=64, hidden_size=64, encoder_layers=2,
    encoder_attention_heads=4, encoder_ffn_dim=128, decoder_layers=2,
    decoder_attention_heads=4, decoder_ffn_dim=128, num_mel_bins=20,
    speech_decoder_prenet_units=32, speech_decoder_prenet_layers=2,
    speech_decoder_postnet_units=32, speech_decoder_postnet_layers=2,
    reduction_factor=2, speaker_embedding_dim=16, max_text_positions=64,
    max_speech_positions=640, encoder_max_relative_position=16,
)
VOC = hfg.HifiGanConfig(
    model_in_dim=20, upsample_initial_channel=32, upsample_rates=(4, 4),
    upsample_kernel_sizes=(8, 8), resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


@pytest.fixture(scope="module")
def engine():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    eng = TTSEngine(
        st5.init_params(k1, TINY), TINY, hfg.init_params(k2, VOC), VOC,
        TTSEngineConfig(batch_slots=4, max_text_tokens=16, max_steps=64,
                        pre_frames=4, chunk_schedule=(8, 16), min_steps=2,
                        stop_threshold=2.0),
    )
    eng.warmup()
    return eng


def test_paced_calls_complete_and_measure(engine):
    cfg = PacedCallConfig(n_calls=6, utterance_frames=16, duty=0.9,
                          measure_s=4.0, sla_ttfb_s=10.0)
    res = run_paced(engine, cfg)
    assert res.utterances >= 6  # every call spoke at least once
    assert res.audio_s > 0
    assert res.ttfb_p95 > 0
    # flow control: a call never buffers more than one utterance of audio;
    # aggregate audio is bounded by n_calls * duty * wall (+ slack for the
    # utterance granularity)
    assert res.audio_s <= cfg.n_calls * res.wall_s

    # the tiny 16-frame utterance on the tiny model must satisfy a loose SLA
    assert res.ok, (res.ttfb_p95, res.underruns)


def test_underrun_detection_clock():
    """_Call counts a chunk as underrun when it arrives after its play time."""
    import time as _time

    cfg = PacedCallConfig(grace_s=0.0)
    c = _Call(0, cfg, 0.0)
    c.state = "synth"
    c.utter_t0 = _time.monotonic()
    sr = cfg.sample_rate
    c.on_chunk(np.zeros(sr // 100, np.float32))  # 10 ms: starts playback
    assert len(c.ttfbs) == 1 and c.underruns == 0
    _time.sleep(0.05)  # playback outran the 10 ms buffer
    c.on_chunk(np.zeros(sr // 100, np.float32))
    assert c.underruns == 1
    c.on_chunk(None)
    assert c.state == "idle" and c.utterances == 1
    assert c.next_request_at > 0


def test_find_max_calls_stops_on_failure(engine):
    base = PacedCallConfig(utterance_frames=16, duty=0.9, measure_s=2.0,
                           sla_ttfb_s=10.0)
    best, results = find_max_calls(engine, base, [2, 4])
    assert best is not None
    assert best.n_calls in (2, 4)
    assert len(results) <= 2


@pytest.fixture(scope="module")
def async_engine():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    eng = TTSEngine(
        st5.init_params(k1, TINY), TINY, hfg.init_params(k2, VOC), VOC,
        TTSEngineConfig(batch_slots=4, max_text_tokens=16, max_steps=64,
                        pre_frames=4, chunk_schedule=(8, 16), min_steps=2,
                        stop_threshold=2.0, async_harvest=True),
    )
    eng.warmup()
    yield eng
    eng.close()


def test_async_harvest_paced_calls(async_engine):
    """Async-harvest mode serves paced calls and matches sync totals."""
    cfg = PacedCallConfig(n_calls=6, utterance_frames=16, duty=0.9,
                          measure_s=4.0, sla_ttfb_s=10.0)
    # real-time SLA on a shared single-core CI box: a concurrent process
    # stealing the core mid-window shows up as underruns unrelated to the
    # engine -- one retry before declaring failure
    res = run_paced(async_engine, cfg)
    if not res.ok:
        res = run_paced(async_engine, cfg)
    assert res.utterances >= 6
    assert res.ok, (res.ttfb_p95, res.underruns)


def test_async_harvest_session_completes_exactly(async_engine):
    got, done = [], []
    async_engine.start_session(
        np.asarray([3, 4, 5], np.int32), np.zeros(16, np.float32),
        lambda a: done.append(True) if a is None else got.append(len(a)),
        max_frames=24)
    while async_engine.step():
        pass
    assert done == [True]
    fs = async_engine.voc_cfg.total_upsample
    assert sum(got) == 24 * fs
