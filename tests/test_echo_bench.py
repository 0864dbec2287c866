"""Echo-loop bench test: RTP -> VAD -> STT -> TTS -> RTP on tiny models."""

import pytest

from infernos_tpu.bench.echo import run_echo
from infernos_tpu.cluster.actors import stop_all


@pytest.mark.e2e
def test_echo_loop_round_trip():
    try:
        rep = run_echo(tiny=True, utterances=2, speech_s=1.0, gap_s=2.5)
    finally:
        stop_all()
    # every utterance produced an STT result and echoed audio came back
    assert len(rep.stt_latency_s) == 2, rep
    assert len(rep.echo_latency_s) >= 1, rep
    assert rep.rx_audio_s > 0.1
    # latency sanity: steady-state turns complete within the silence gap
    # (the FIRST turn may include jit compiles of cold bucket shapes)
    assert all(t > 0.0 for t in rep.echo_latency_s), rep.echo_latency_s
    assert rep.echo_latency_s[-1] < 2.5, rep.echo_latency_s
