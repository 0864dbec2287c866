"""Session-layer tests: STT chunk-merge/sentinel semantics, TTS say queue."""

import numpy as np
import pytest

import jax

from infernos_tpu.audio.chunk import AudioChunk, VadAudioChunk
from infernos_tpu.audio.markers import ASMarkerNewSent, ASMarkerSentDoneCB
from infernos_tpu.models import hifigan as hfg
from infernos_tpu.models import speecht5 as st5
from infernos_tpu.models import whisper as wsp
from infernos_tpu.serving.sessions import (
    STTRequest,
    STTSentinel,
    STTSession,
    TTSRequest,
    TTSSession,
)
from infernos_tpu.serving.speakers import SpeakerBank
from infernos_tpu.serving.stt_engine import STTEngine, STTEngineConfig
from infernos_tpu.serving.tts_engine import TTSEngine, TTSEngineConfig
from tests.test_stt_engine import TINY as WHISPER_TINY
from tests.test_tts_engine import TINY as TTS_TINY, VOC


class InlineSTTEngine(STTEngine):
    """Engine that completes each submission synchronously (for tests)."""

    def submit(self, req):
        slot = super().submit(req)
        while self.step():
            pass
        return slot


@pytest.fixture(scope="module")
def stt_session_engine():
    params = wsp.init_params(jax.random.PRNGKey(0), WHISPER_TINY)
    ecfg = STTEngineConfig(
        batch_slots=2, buckets_s=(1, 2), max_new_tokens=4, max_prompt_tokens=8,
        lang_tokens={"en": 10}, task_transcribe=12, task_translate=13,
        no_timestamps=14, no_speech=4,
    )
    return InlineSTTEngine(params, WHISPER_TINY, ecfg)


class _StubEngine:
    """Capture-only engine: records requests, completes on demand."""

    class _ECfg:
        context_tokens = 224

    ecfg = _ECfg()

    def __init__(self):
        self.reqs = []

    def submit(self, req):
        self.reqs.append(req)


def test_stt_session_merges_vad_chunks():
    eng = _StubEngine()
    sess = STTSession(eng, keep_context=False)
    results = []
    sr = 16000
    c1 = VadAudioChunk(np.zeros(sr // 2, np.float32), sr, ipos=0)
    c2 = VadAudioChunk(np.zeros(sr // 2, np.float32), sr, ipos=sr // 2 + sr // 5)
    c3 = VadAudioChunk(np.zeros(sr // 4, np.float32), sr, ipos=2 * sr)
    r1 = STTRequest(chunk=c1, text_cb=results.append)
    sess.soundin(r1)
    assert len(eng.reqs) == 1  # first request goes straight to the engine
    sess.soundin(STTRequest(chunk=c2, text_cb=results.append))
    sess.soundin(STTRequest(chunk=c3, text_cb=results.append))
    # complete the first: the two queued VAD chunks must merge into one
    from infernos_tpu.serving.stt_engine import STTResult

    eng.reqs[0].text_cb(STTResult(tokens=[1], no_speech_prob=0.0,
                                  duration=0.5, inf_time=0.0))
    assert len(eng.reqs) == 2
    merged = len(eng.reqs[1].audio)
    # c2 (0.5 s) + gap to c3 + c3 (0.25 s), gap zero-filled from ipos math
    assert merged == (2 * sr + sr // 4) - (sr // 2 + sr // 5)
    assert len(results) == 1


def test_stt_session_sentinel_flush(stt_session_engine):
    sess = STTSession(stt_session_engine)
    seen = []
    sess.soundin(STTSentinel("flush", text_cb=lambda s: seen.append(s.signal)))
    assert seen == ["flush"]  # queue empty -> delivered immediately


def test_stt_session_request_then_result(stt_session_engine):
    sess = STTSession(stt_session_engine, keep_context=True)
    results = []
    chunk = AudioChunk(np.zeros(8000, np.float32), 16000)
    sess.soundin(STTRequest(chunk=chunk, text_cb=results.append))
    assert len(results) == 1
    assert results[0].duration == 0.5
    assert sess.context is not None  # rolling context captured


def test_tts_session_say_queue_and_markers():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    eng = TTSEngine(
        st5.init_params(k1, TTS_TINY), TTS_TINY,
        hfg.init_params(k2, VOC), VOC,
        TTSEngineConfig(batch_slots=2, max_text_tokens=16, max_steps=16,
                        chunk_schedule=(8,), min_steps=2, stop_threshold=2.0),
    )
    bank = SpeakerBank.synthetic(dim=TTS_TINY.speaker_embedding_dim, n=16)
    sess = TTSSession(eng, tokenize=lambda t: np.frombuffer(
        t.encode()[:8], np.uint8).astype(np.int32) % 32 + 2, speaker_bank=bank)
    out = []
    done = []
    processed = [0]

    def soundout(item):
        out.append(item)

    sess.start(soundout)
    sess.say(TTSRequest(["first sentence.", "second one."],
                        done_cb=lambda: done.append(True)))
    # drive engine + simulate the pacer reaching markers (fires on_proc,
    # which chains the next sentence -- reference EOS-through-audio-queue
    # protocol, Cluster/TTSSession.py:70-85)
    for _ in range(60):
        eng.step()
        while processed[0] < len(out):
            item = out[processed[0]]
            processed[0] += 1
            if isinstance(item, ASMarkerSentDoneCB):
                item.on_proc()
        if done:
            break
    kinds = [type(x).__name__ for x in out]
    assert "AudioChunk" in kinds
    # two sentences -> two end markers, both carrying chaining/done callbacks
    assert kinds.count("ASMarkerSentDoneCB") == 2
    assert done == [True]


def test_tts_session_stop_saying():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    eng = TTSEngine(
        st5.init_params(k1, TTS_TINY), TTS_TINY,
        hfg.init_params(k2, VOC), VOC,
        TTSEngineConfig(batch_slots=2, max_text_tokens=16, max_steps=32,
                        chunk_schedule=(8,), min_steps=2, stop_threshold=2.0),
    )
    sess = TTSSession(eng, tokenize=lambda t: np.array([5, 6, 7], np.int32))
    out = []
    sess.start(out.append)
    say_id = sess.say(TTSRequest("long sentence"))
    eng.step()
    n_audio = sum(1 for x in out if isinstance(x, AudioChunk))
    assert sess.stop_saying(say_id)
    eng.step()
    # no more audio after cancel; end marker was emitted
    assert sum(1 for x in out if isinstance(x, AudioChunk)) == n_audio
    assert any(isinstance(x, ASMarkerNewSent) for x in out)
    assert not sess.stop_saying(say_id)  # already gone


def test_tts_dispatch_output_norm_rms():
    """Loudness normalization for random-weights stand-ins (round-5 e2e
    regression): random tiny TTS synthesizes ~3e-5 peak, which G.711 mu-law
    quantizes to EXACT digital silence; output_norm_rms locks a per-say gain
    on the first energetic chunk so a PCMU leg carries audible audio."""
    from infernos_tpu.audio.codecs import G711Codec
    from infernos_tpu.serving.sessions import TTSSoundDispatch

    # the floor itself: a 3e-5-peak signal round-trips G.711 to all-zeros
    tiny_sig = (3e-5 * np.sin(np.linspace(0, 40, 160))).astype(np.float32)
    g711 = G711Codec()
    assert np.abs(g711.decode(g711.encode(tiny_sig))).max() == 0.0

    out = []
    disp = TTSSoundDispatch(out.append, 16000, done_cb=None, norm_rms=0.05)
    lead_silence = np.zeros(64, np.float32)
    disp(lead_silence)            # gain must not lock on silence
    disp(tiny_sig)                # locks gain here
    disp(tiny_sig * 0.5)          # same gain applies to later chunks
    assert np.abs(out[0].audio).max() == 0.0
    rms1 = float(np.sqrt(np.mean(out[1].audio ** 2)))
    assert abs(rms1 - 0.05) < 1e-3
    # second chunk scaled by the SAME locked gain (half the amplitude)
    assert np.allclose(out[2].audio, out[1].audio * 0.5, atol=1e-6)
    # and the normalized audio survives a G.711 round-trip audibly
    assert np.abs(g711.decode(g711.encode(out[1].audio))).max() > 1e-3
    # norm off (default) leaves audio untouched
    out2 = []
    disp_off = TTSSoundDispatch(out2.append, 16000, done_cb=None)
    disp_off(tiny_sig)
    assert np.array_equal(out2[0].audio, tiny_sig)
