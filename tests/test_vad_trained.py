"""Trained NeuralVAD quality tests (weak item 5: the default VAD must not
be an energy heuristic).

The checkpoint is trained in-repo by ``tools/train_vad.py`` on synthetic
telephone audio (``tools/synth_speech.py``) -- the zero-egress substitute
for the reference's downloaded Silero weights (``Core/VAD/SileroVAD.py:44``).
These tests evaluate on HELD-OUT synthesis seeds.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from infernos_tpu.models import vad as vad_m

params = vad_m.load_pretrained()
pytestmark = pytest.mark.skipif(params is None,
                                reason="no trained VAD checkpoint")


def _windows(audio, cfg):
    n = len(audio) // cfg.window
    return audio[: n * cfg.window].reshape(n, cfg.window)


def _labels(mask, cfg, n):
    return mask[: n * cfg.window].reshape(n, cfg.window).mean(1) >= 0.5


def _run_model(model, cfg, audio):
    ws = _windows(audio, cfg)
    out = []
    for t in range(len(ws)):
        out.append(model(ws[t][None])[0])
    return np.array(out)


def test_default_factory_prefers_trained_neural():
    from infernos_tpu.media.ingest import default_vad_factory

    m = default_vad_factory(4)
    # host-side numpy inference of the trained net (never a device dispatch
    # on the 96 ms media tick)
    assert isinstance(m, vad_m.NumpyVAD)


def test_trained_vad_beats_energy_on_held_out_mixtures():
    from tools.synth_speech import make_example

    cfg = vad_m.VADConfig()
    rng = np.random.default_rng(20260816)  # held-out seed
    n_seq, seconds = 24, 2.3
    accs_n, accs_e = [], []
    for _ in range(n_seq):
        audio, labels = make_example(rng, seconds, cfg.window)
        n = len(audio) // cfg.window
        nv = vad_m.NeuralVAD(params, cfg, batch=1)
        pn = _run_model(nv, cfg, audio) > 0.5
        ev = vad_m.EnergyVAD(1)
        pe = _run_model(ev, cfg, audio) > 0.5
        accs_n.append((pn == labels[:n].astype(bool)).mean())
        accs_e.append((pe == labels[:n].astype(bool)).mean())
    acc_n, acc_e = float(np.mean(accs_n)), float(np.mean(accs_e))
    assert acc_n > 0.9, acc_n
    assert acc_n > acc_e + 0.1, (acc_n, acc_e)


def test_trained_vad_rejects_stationary_noise_energy_fires_on():
    """A loud tone is 'speech' to an energy gate; the neural model knows
    better -- the exact failure mode that motivates Silero in the reference."""
    from tools.synth_speech import synth_noise

    cfg = vad_m.VADConfig()
    rng = np.random.default_rng(7)
    tone = 0.3 * synth_noise(rng, 2.0, kind="tone")
    nv = vad_m.NeuralVAD(params, cfg, batch=1)
    pn = _run_model(nv, cfg, tone)
    assert pn.mean() < 0.3, pn

    ev = vad_m.EnergyVAD(1)
    pe = _run_model(ev, cfg, tone)
    assert pe.mean() > 0.5  # energy gate fooled (documented contrast)


def test_trained_vad_state_is_per_channel():
    """Slot-batched inference: resetting one channel must not disturb the
    other (explicit [B, ...] state, SURVEY section 2.5 design note)."""
    from tools.synth_speech import synth_speech

    cfg = vad_m.VADConfig()
    sp, _ = synth_speech(np.random.default_rng(3), 1.0)
    ws = _windows(0.35 * sp, cfg)
    nv = vad_m.NeuralVAD(params, cfg, batch=2)
    outs = []
    for t in range(len(ws)):
        both = np.stack([ws[t], ws[t]])
        outs.append(nv(both))
        if t == 1:
            nv.reset_channel(1)  # channel 0 unaffected
    outs = np.array(outs)
    # after the reset, channel 0 keeps its warmed-up trajectory
    assert outs.shape[1] == 2
    assert np.all(outs[:, 0] >= 0) and np.all(outs[:, 0] <= 1)


def test_numpy_vad_matches_jax():
    """The media-plane numpy inference must match the JAX forward (the
    trained weights are shared; numerics parity within float tolerance)."""
    from tools.synth_speech import make_example

    cfg = vad_m.VADConfig()
    rng = np.random.default_rng(99)
    audio, _ = make_example(rng, 2.0, cfg.window)
    n = len(audio) // cfg.window
    ws = audio[: n * cfg.window].reshape(n, cfg.window)

    nv = vad_m.NeuralVAD(params, cfg, batch=2)
    npv = vad_m.NumpyVAD(params, cfg, batch=2)
    for t in range(n):
        both = np.stack([ws[t], ws[t] * 0.5])
        pj = np.asarray(nv(both))
        pn = npv(both)
        assert np.abs(pj - pn).max() < 1e-3, (t, pj, pn)


def test_numpy_vad_is_fast_enough_for_the_tick():
    """One [8, 768] forward must run well inside the 96 ms media tick."""
    import time

    cfg = vad_m.VADConfig()
    npv = vad_m.NumpyVAD(params, cfg, batch=8)
    w = np.random.default_rng(0).standard_normal((8, cfg.window)).astype(np.float32)
    npv(w)  # warm numpy caches
    t0 = time.monotonic()
    for _ in range(20):
        npv(w)
    per_tick_ms = (time.monotonic() - t0) / 20 * 1000
    assert per_tick_ms < 30.0, per_tick_ms
