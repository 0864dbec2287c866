"""Bilingual LiveTranslator e2e: BOTH directions produce verified real
translations through real SIP/RTP calls (VERDICT r3 item 3 done criterion).

Requires the bilingual tiny-real checkpoints (trained on the full a-z
speechlang corpus incl. the pt lexicon words); skips while the committed
checkpoint is the en-only round-3 one.  Verification is loopback-grade:
the caller speaks a rendered speechlang utterance, and the audio that
reaches the OTHER leg is transcribed with the tiny STT and compared
word-for-word against the lexicon ground truth
(reference translation chain: ``Core/T2T/Translator.py:19-56``).
"""

import json
import os
import textwrap
import time

import numpy as np
import pytest

from infernos_tpu.cluster.actors import stop_all
from infernos_tpu.config import InfernConfig
from infernos_tpu.main import build_cluster
from infernos_tpu.models.npz_io import data_path

from test_e2e_calls import FakePhone
from infernos_tpu.bench.phone import FarEnd


def _bilingual_ready() -> bool:
    try:
        with open(os.path.join(data_path("tiny_stt"), "corpus.json")) as f:
            words = set(json.load(f)["words"])
    except (OSError, KeyError, ValueError):
        return False
    return {"quatro", "ajuda"} <= words


def _render(text: str, seed: int = 0) -> np.ndarray:
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from speechlang import Speaker, render_text

    rng = np.random.default_rng(seed)
    a16 = render_text(rng, text, Speaker.random(rng))
    # calls carry 8 kHz G.711; downsample like a real phone would
    from infernos_tpu.audio.chunk import AudioChunk

    return AudioChunk(a16, 16000).resample(8000).audio


def _transcribe(audio8k: np.ndarray, lang: str) -> str:
    from infernos_tpu.audio.chunk import AudioChunk
    from infernos_tpu.models import tiny_real
    from infernos_tpu.serving.stt_engine import STTEngine, STTRequest

    params, cfg, tok, ecfg = tiny_real.load_tiny_stt()
    eng = STTEngine(params, cfg, ecfg, detokenize=tok.detokenize)
    out = []
    a16 = AudioChunk(audio8k, 8000).resample(16000).audio
    eng.submit(STTRequest(audio=a16, text_cb=out.append, lang=lang))
    while eng.step():
        pass
    return out[0].text if out else ""


def _word_acc(ref: str, hyp: str) -> float:
    rw, hw = ref.split(), hyp.split()
    return sum(a == b for a, b in zip(rw, hw)) / max(len(rw), 1)


def _active_region(audio: np.ndarray, thresh: float = 1e-3,
                   margin: int = 800) -> np.ndarray:
    """Trim leading/trailing silence: the capture spans the whole call
    (the pacer fills silence from t=0) while the STT clips at its longest
    bucket -- feeding the raw capture hands the model only leading hiss."""
    idx = np.flatnonzero(np.abs(audio) > thresh)
    if idx.size == 0:
        return audio[:0]
    return audio[max(0, idx[0] - margin): idx[-1] + margin]


@pytest.mark.e2e
@pytest.mark.skipif(not _bilingual_ready(),
                    reason="bilingual tiny-real checkpoints not promoted yet")
def test_lt_translates_both_directions(tmp_path, monkeypatch):
    monkeypatch.setenv("INFERNOS_MODEL_MODE", "tiny-real")
    cfg_text = textwrap.dedent("""
        sip:
          settings:
            bind: 127.0.0.1:15875
          profiles:
            inbound:
              sink: apps/live_translator/c1
            bob:
              sip_server: 127.0.0.1:15885
        rtp:
          settings:
            min_port: 29500
            max_port: 29900
        apps:
          live_translator:
            profiles:
              c1:
                stt_langs: ['en', 'pt']
                tts_langs: ['pt', 'en']
                outbound: sip/bob;cld=900
    """)
    p = tmp_path / "lt.yaml"
    p.write_text(cfg_text)
    iconf = InfernConfig(str(p))
    build_cluster(iconf, tiny=True, bind_ip="127.0.0.1")
    bob = FarEnd(port=15885)
    alice = FakePhone()
    try:
        alice.call(iconf.sip_conf.bind)
        assert alice.uac.connected
        assert bob.answered.wait(20.0)

        # -- en -> pt: Alice speaks English; Bob must hear the lexicon's
        # Portuguese rendition
        en_text = "please help now"
        pt_expect = "favor ajuda agora"
        alice.stream_bg(_render(en_text, seed=5), then_silence=True)
        # wait for a REAL burst then trailing quiet: the output pacer sends
        # silence frames from t=0, so "line is quiet" alone trips ~0.5 s in,
        # long before the pipeline's first TTS audio
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            audio = bob.rx_audio()
            if (len(audio) > 4000 and np.abs(audio).max() > 1e-3
                    and np.abs(audio[-2400:]).max() < 1e-3):
                break  # got a burst and the line went quiet again
            time.sleep(0.5)
        alice.stop_streaming()
        pt_hyp = _transcribe(_active_region(bob.rx_audio()), "pt")
        acc_pt = _word_acc(pt_expect, pt_hyp)

        # -- pt -> en: Bob speaks Portuguese; Alice must hear English.
        # Bob's FarEnd records the framework's media address from the
        # received RTP; stream back to it.
        assert bob.rx_packets, "no framework media seen on Bob's leg"
        n_before = len(alice.rx_packets)
        pt_text = "quero ajuda hoje"
        en_expect = "want help today"
        fw_addr = bob.last_rtp_src
        bob.stream_bg(_render(pt_text, seed=7), fw_addr)
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            audio = alice.rx_audio_since(n_before)
            if (len(audio) > 4000 and np.abs(audio).max() > 1e-3
                    and np.abs(audio[-2400:]).max() < 1e-3):
                break
            time.sleep(0.5)
        bob.stop_streaming()
        en_hyp = _transcribe(_active_region(alice.rx_audio_since(n_before)),
                             "en")
        acc_en = _word_acc(en_expect, en_hyp)

        assert acc_pt >= 0.6, f"en->pt leg: expected {pt_expect!r}, got {pt_hyp!r}"
        assert acc_en >= 0.6, f"pt->en leg: expected {en_expect!r}, got {en_hyp!r}"
        alice.hangup()
    finally:
        alice.close()
        bob.close()
