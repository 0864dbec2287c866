"""Golden tests for G.711 (vs stdlib audioop) and G.722 (roundtrip SNR)."""

import audioop

import numpy as np
import pytest

from infernos_tpu.audio.codecs import G711Codec, G711ACodec, G722Codec
from infernos_tpu.audio.codecs.g711 import (
    _lin2ulaw,
    _ulaw2lin,
    _lin2alaw,
    _alaw2lin,
)


ALL_I16 = np.arange(-32768, 32768, dtype=np.int16)


def test_ulaw_encode_matches_audioop():
    got = _lin2ulaw(ALL_I16)
    want = np.frombuffer(audioop.lin2ulaw(ALL_I16.tobytes(), 2), np.uint8)
    np.testing.assert_array_equal(got, want)


def test_ulaw_decode_matches_audioop():
    codes = np.arange(256, dtype=np.uint8)
    got = _ulaw2lin(codes)
    want = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), "<i2")
    np.testing.assert_array_equal(got, want)


def test_alaw_encode_matches_audioop():
    got = _lin2alaw(ALL_I16)
    want = np.frombuffer(audioop.lin2alaw(ALL_I16.tobytes(), 2), np.uint8)
    np.testing.assert_array_equal(got, want)


def test_alaw_decode_matches_audioop():
    codes = np.arange(256, dtype=np.uint8)
    got = _alaw2lin(codes)
    want = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), "<i2")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("cls", [G711Codec, G711ACodec])
def test_g711_roundtrip(cls):
    codec = cls()
    t = np.arange(1600) / 8000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    payload = codec.encode(x)
    assert len(payload) == len(x)
    y = codec.decode(payload)
    # mu-law/A-law SNR on a mid-level sine should be well above 30 dB
    snr = 10 * np.log10(np.sum(x**2) / np.sum((x - y) ** 2))
    assert snr > 30, snr


def test_g711_silence():
    codec = G711Codec()
    s = codec.silence(160)
    assert s == b"\xff" * 160
    out = codec.decode(s)
    assert np.abs(out).max() < 1e-4


def test_g722_roundtrip_snr():
    codec = G722Codec()
    t = np.arange(16000) / 16000.0
    # Band-limited speech-like signal (two tones under 3.4 kHz)
    x = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1320 * t)).astype(
        np.float32
    )
    payload = codec.encode(x)
    assert len(payload) == len(x) // 2  # 64 kbps: 1 byte / 2 samples @ 16 kHz
    y = codec.decode(payload)
    assert len(y) == len(x)
    # Discard codec adaptation + QMF delay, align by cross-correlation
    d = 22  #
    best = max(range(30), key=lambda k: float(np.dot(x[: len(x) - 30], y[k : len(x) - 30 + k])))
    xx, yy = x[: len(x) - 30], y[best : len(x) - 30 + best]
    xx, yy = xx[2000:], yy[2000:]
    snr = 10 * np.log10(np.sum(xx**2) / np.sum((xx - yy) ** 2))
    assert snr > 20, (snr, best)


def test_g722_silence_roundtrip():
    enc = G722Codec()
    payload = enc.silence(160)
    assert len(payload) == 160
    out = G722Codec().decode(payload)
    assert len(out) == 320
    assert np.abs(out[100:]).max() < 0.01


def test_g722_frame_math():
    codec = G722Codec()
    # 20 ms packet = 160 encoded octets = 320 samples @ 16 kHz
    assert codec.e2d_frames(160) == 320
    assert codec.d2e_frames(320) == 160
    assert codec.e2d_frames(160, out_srate=8000) == 160
