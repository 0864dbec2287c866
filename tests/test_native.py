"""Cross-check the C++ media engine against the Python oracles."""

import audioop

import numpy as np
import pytest

from infernos_tpu.media import native
from infernos_tpu.media.jitter import JitterBuffer, RTPFrameType
from infernos_tpu.media.rtp import RTPPacket, RTPPacketizer

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain / build failed")


ALL_I16 = np.arange(-32768, 32768, dtype=np.int16)


def test_native_g711_matches_audioop():
    got = np.frombuffer(native.ulaw_encode(ALL_I16), np.uint8)
    want = np.frombuffer(audioop.lin2ulaw(ALL_I16.tobytes(), 2), np.uint8)
    np.testing.assert_array_equal(got, want)
    codes = bytes(range(256))
    np.testing.assert_array_equal(
        native.ulaw_decode(codes),
        np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2"))
    got = np.frombuffer(native.alaw_encode(ALL_I16), np.uint8)
    want = np.frombuffer(audioop.lin2alaw(ALL_I16.tobytes(), 2), np.uint8)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        native.alaw_decode(codes),
        np.frombuffer(audioop.alaw2lin(codes, 2), "<i2"))


def test_native_g722_matches_python():
    from infernos_tpu.audio.codecs.g722 import G722State

    rng = np.random.default_rng(0)
    t = np.arange(8000) / 16000.0
    pcm = (12000 * np.sin(2 * np.pi * 440 * t)
           + 500 * rng.standard_normal(len(t))).astype(np.int16)
    py_enc = G722State()
    want_wire = py_enc.encode(pcm)
    c = native.NativeG722()
    got_wire = c.encode(pcm)
    assert got_wire == want_wire  # bit-exact wire format
    py_dec = G722State()
    want_pcm = py_dec.decode(want_wire)
    d = native.NativeG722()
    got_pcm = d.decode(got_wire)
    np.testing.assert_array_equal(got_pcm, want_pcm)


def test_native_packetizer_matches_python():
    py = RTPPacketizer(8000, 20, ssrc=0xABCD1234, seq0=7)
    py.ts = 1000
    c = native.NativePacketizer(8000, 20, ssrc=0xABCD1234, seq0=7, ts0=1000)
    for i in range(5):
        if i == 3:
            py.skip(2)
            c.skip(2)
        payload = bytes([i]) * 160
        assert c.next_pkt(160, 0, payload) == py.next_pkt(160, 0, payload)


def _mk_pkts(n, seq0=0, ssrc=7):
    return [RTPPacket(2, False, 0, (seq0 + i) & 0xFFFF, 160 * i, ssrc,
                      bytes([i % 251]) * 160).build() for i in range(n)]


@pytest.mark.parametrize("scenario", ["inorder", "reorder", "loss", "dup", "wrap"])
def test_native_jitter_matches_python(scenario):
    pkts = _mk_pkts(24, seq0=0xFFF8 if scenario == "wrap" else 0)
    order = list(range(24))
    if scenario == "reorder":
        order[3], order[4] = order[4], order[3]
        order[10], order[12] = order[12], order[10]
    elif scenario == "loss":
        order = [i for i in order if i not in (5, 6, 15)]
    elif scenario == "dup":
        order = order[:8] + [4, 5] + order[8:]

    py = JitterBuffer(4)
    cj = native.NativeJitterBuffer(4)
    py_frames, c_frames = [], []
    for i in order:
        py_frames.extend(py.udp_in(pkts[i]))
        c_frames.extend(cj.udp_in(pkts[i]))
    assert len(py_frames) == len(c_frames)
    for pf, cf in zip(py_frames, c_frames):
        assert pf.type == cf.type
        assert pf.lseq == cf.lseq
        if pf.type == RTPFrameType.AUDIO:
            assert pf.rtp_data == cf.rtp_data
        else:
            assert (pf.lseq_start, pf.lseq_end, pf.ts_diff) == (
                cf.lseq_start, cf.lseq_end, cf.ts_diff)


def test_native_jitter_parse_error():
    from infernos_tpu.media.rtp import RTPParseError

    cj = native.NativeJitterBuffer(4)
    with pytest.raises(RTPParseError):
        cj.udp_in(b"short")


def test_native_g722_speed():
    """The native codec should beat Python by a wide margin (hot path)."""
    import time

    from infernos_tpu.audio.codecs.g722 import G722State

    pcm = (np.sin(np.arange(16000) * 0.1) * 10000).astype(np.int16)
    c = native.NativeG722()
    t0 = time.monotonic()
    c.encode(pcm)
    t_native = time.monotonic() - t0
    py = G722State()
    t0 = time.monotonic()
    py.encode(pcm)
    t_py = time.monotonic() - t0
    assert t_native < t_py / 10, (t_native, t_py)
