"""Streaming TTS engine tests: slot join/leave, chunked emission, EOS, barge-in."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infernos_tpu.models import speecht5 as st5
from infernos_tpu.models import hifigan as hfg
from infernos_tpu.serving.tts_engine import TTSEngine, TTSEngineConfig

TINY = st5.SpeechT5Config(
    vocab_size=40,
    hidden_size=32,
    encoder_layers=1,
    encoder_attention_heads=2,
    encoder_ffn_dim=64,
    decoder_layers=1,
    decoder_attention_heads=2,
    decoder_ffn_dim=64,
    num_mel_bins=16,
    speech_decoder_prenet_units=16,
    speech_decoder_prenet_layers=1,
    speech_decoder_prenet_dropout=0.5,
    speech_decoder_postnet_units=16,
    speech_decoder_postnet_layers=2,
    reduction_factor=2,
    speaker_embedding_dim=8,
    max_text_positions=64,
    max_speech_positions=256,
    encoder_max_relative_position=16,
)
VOC = hfg.HifiGanConfig(
    model_in_dim=16,
    upsample_initial_channel=16,
    upsample_rates=(4, 4),
    upsample_kernel_sizes=(8, 8),
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


@pytest.fixture(scope="module")
def engine():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = st5.init_params(k1, TINY)
    voc_params = hfg.init_params(k2, VOC)
    ecfg = TTSEngineConfig(
        batch_slots=4, max_text_tokens=16, max_steps=32,
        pre_frames=4, chunk_schedule=(8, 16), min_steps=2,
        stop_threshold=2.0,  # sigmoid can't exceed 1 -> never stops; we bound by max_frames
    )
    return TTSEngine(params, TINY, voc_params, VOC, ecfg)


def _collect_session(engine, ids, max_frames=24):
    chunks = []
    done = []
    rng = np.random.default_rng(0)
    engine.start_session(
        np.asarray(ids, np.int32),
        rng.standard_normal(TINY.speaker_embedding_dim).astype(np.float32),
        lambda a: done.append(True) if a is None else chunks.append(a),
        max_frames=max_frames,
    )
    while engine.step():
        pass
    return chunks, done


def test_single_session_emits_and_ends(engine):
    chunks, done = _collect_session(engine, [5, 6, 7, 8])
    assert done == [True]
    total = sum(len(c) for c in chunks)
    fs = VOC.total_upsample
    assert total == 24 * fs  # max_frames * samples-per-frame
    # first chunk honors the 8-frame first-emission schedule
    assert len(chunks[0]) == 8 * fs
    for c in chunks:
        assert np.isfinite(c).all() and np.abs(c).max() <= 1.0


def test_two_sessions_staggered_join(engine):
    """Continuous batching: session B joins while A is mid-stream."""
    got = {"a": [], "b": []}
    ended = {"a": False, "b": False}

    def cb(key):
        def f(audio):
            if audio is None:
                ended[key] = True
            else:
                got[key].append(len(audio))
        return f

    rng = np.random.default_rng(1)
    spk = rng.standard_normal(TINY.speaker_embedding_dim).astype(np.float32)
    engine.start_session(np.array([3, 4, 5], np.int32), spk, cb("a"), max_frames=32)
    engine.step()  # dispatch A's first chunk
    engine.step()  # pipelined harvest delivers it
    assert got["a"] and not got["b"]
    engine.start_session(np.array([6, 7], np.int32), spk, cb("b"), max_frames=16)
    while engine.step():
        pass
    fs = VOC.total_upsample
    assert sum(got["a"]) == 32 * fs
    assert sum(got["b"]) == 16 * fs
    assert ended["a"] and ended["b"]
    assert engine.n_active == 0


def test_cancel_session(engine):
    """Barge-in: cancelling mid-stream emits EOS and frees the slot."""
    chunks, done = [], []
    rng = np.random.default_rng(2)
    sid = engine.start_session(
        np.array([9, 10], np.int32),
        rng.standard_normal(TINY.speaker_embedding_dim).astype(np.float32),
        lambda a: done.append(True) if a is None else chunks.append(a),
        max_frames=32,
    )
    engine.step()
    engine.step()  # harvest (one-tick pipeline)
    n_before = len(chunks)
    engine.cancel_session(sid)
    engine.step()
    engine.step()
    assert done == [True]
    assert len(chunks) == n_before  # no audio after cancel
    while engine.step():
        pass  # drain any inflight tick
    assert engine.n_active == 0


def test_slots_exhausted_queues(engine):
    """A 5th session beyond the 4 slots queues and plays once a slot frees."""
    rng = np.random.default_rng(3)
    spk = rng.standard_normal(TINY.speaker_embedding_dim).astype(np.float32)
    cbs = []
    for i in range(5):
        cbs.append([])
        engine.start_session(np.array([2 + i], np.int32), spk,
                             cbs[-1].append, max_frames=8)
    # joins are deferred+batched: all 5 queue, the first step joins 4 (the
    # slot count) and the 5th waits for a free slot
    assert len(engine._pending) == 5
    engine.step()
    assert len(engine._pending) == 1
    while engine.step():
        pass
    for got in cbs:
        assert got and got[-1] is None  # all five delivered EOS
    assert engine.n_active == 0 and not engine._pending


def test_pause_resume_flow_control(engine):
    """A paused session emits nothing and does not end; after resume it
    completes with exactly max_frames frames (state-transparent pause)."""
    rng = np.random.default_rng(7)
    spk = rng.standard_normal(TINY.speaker_embedding_dim).astype(np.float32)
    chunks, done = [], []
    sid = engine.start_session(
        np.asarray([5, 6, 7, 8], np.int32), spk,
        lambda a: done.append(True) if a is None else chunks.append(a),
        max_frames=24,
    )
    engine.step()  # dispatch tick 1
    engine.step()  # harvest tick 1 (one-tick pipeline)
    got_before = sum(len(c) for c in chunks)
    assert got_before > 0 and not done

    engine.pause_session(sid)
    engine.step()  # drain the already-dispatched tick
    drained = sum(len(c) for c in chunks)
    for _ in range(4):  # paused: no dispatches deliver audio, no EOS
        engine.step()
    assert sum(len(c) for c in chunks) == drained
    assert not done
    assert engine.n_active == 1

    engine.resume_session(sid)
    while engine.step():
        pass
    assert done == [True]
    fs = engine.voc_cfg.total_upsample
    assert sum(len(c) for c in chunks) == 24 * fs


def test_pause_does_not_block_other_sessions(engine):
    rng = np.random.default_rng(8)
    spk = rng.standard_normal(TINY.speaker_embedding_dim).astype(np.float32)
    a_chunks, a_done, b_done = [], [], []
    sid_a = engine.start_session(
        np.asarray([5, 6], np.int32), spk,
        lambda x: a_done.append(True) if x is None else a_chunks.append(x),
        max_frames=64,
    )
    engine.pause_session(sid_a)
    engine.start_session(
        np.asarray([9, 10, 11], np.int32), spk,
        lambda x: b_done.append(True) if x is None else None,
        max_frames=16,
    )
    # b runs to completion while a is paused
    for _ in range(64):
        engine.step()
        if b_done:
            break
    assert b_done == [True]
    assert not a_done
    engine.cancel_session(sid_a)
    while engine.step():
        pass
    assert a_done == [True]


def test_trained_amendnet_beats_identity_on_boundary_artifacts():
    """Weak item 4: the chunk smoother must actually smooth.  Held-out
    synthetic chunk artifacts (gain steps / DC / clicks): the trained
    declicker (tools/train_amendnet.py) must reduce L1 vs passing the
    corrupted chunk through."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from infernos_tpu.models import amendnet as amd

    params = amd.load_pretrained()
    if params is None:
        pytest.skip("no trained amendnet checkpoint")
    from tools.train_amendnet import make_batch

    cfg = amd.AmendNetConfig()
    rng = np.random.default_rng(20260817)  # held-out seed
    mel, dirty, clean = make_batch(rng, 48, cfg)
    out = np.asarray(amd.apply(params, cfg, jnp.asarray(mel), jnp.asarray(dirty)))
    fs, pre, ck = cfg.frame_size, cfg.pre_frames, cfg.chunk_frames
    ident = dirty[:, pre * fs:(pre + ck) * fs]
    l1_net = float(np.abs(out - clean).mean())
    l1_id = float(np.abs(ident - clean).mean())
    assert l1_net < 0.8 * l1_id, (l1_net, l1_id)
