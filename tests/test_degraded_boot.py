"""Degraded-boot e2e: dead accelerator relay -> daemon boots on CPU and serves.

The 2026-08-17 relay outage showed that a remote-attached accelerator can
make ``jax.devices()`` block forever; the daemon's answer is a bounded
subprocess probe followed by a forced-CPU boot (``main.py`` via
``utils.platform.ensure_backend_or_degrade``).  Unit tests cover the probe;
this test covers the full promise: with the accelerator UNREACHABLE, a real
``python -m infernos_tpu`` process must come up degraded and complete one
real AI-attendant call (reference analogue: the device fallback chains at
actor init, ``Cluster/InfernSTTActor.py:24-31``, ``InfernRTPActor.py:85-96``
-- except the reference never tested them end-to-end; SURVEY.md section 4).
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

from test_e2e_calls import FakePhone, _speechy

SIP_PORT = 15873


@pytest.mark.e2e
def test_degraded_boot_serves_call(tmp_path):
    cfg = tmp_path / "aia.yaml"
    cfg.write_text(textwrap.dedent("""
        sip:
          settings:
            bind: 127.0.0.1:%d
          profiles:
            inbound:
              sink: apps/ai_attendant/a1
        rtp:
          settings:
            min_port: 29100
            max_port: 29400
        apps:
          ai_attendant:
            profiles:
              a1:
                stt_lang: en
                tts_lang: en
                llm_prompt: "You are a phone attendant. Be brief."
    """ % SIP_PORT))
    logf = tmp_path / "daemon.log"

    env = dict(os.environ)
    # Simulate the outage: an accelerator-configured process whose relay is
    # unreachable (127.9.9.9:8082 is loopback-routed, nothing listens ->
    # instant connection-refused, the fast flavor of "relay dead").
    env["JAX_PLATFORMS"] = "axon"
    env["PALLAS_AXON_POOL_IPS"] = "127.9.9.9"
    env["INFERNOS_PROBE_TIMEOUT_S"] = "15"
    env["INFERNOS_CLAIM_RETRY_S"] = "1"
    env.pop("INFERNOS_REQUIRE_ACCEL", None)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")

    with open(logf, "w") as sink:
        proc = subprocess.Popen(
            [sys.executable, "-m", "infernos_tpu", "-f", "-t", str(cfg)],
            stdout=sink, stderr=subprocess.STDOUT, env=env,
            start_new_session=True)
    phone = None
    try:
        # Boot = probe timeout + CPU compile of the tiny cluster.
        deadline = time.monotonic() + 420
        while time.monotonic() < deadline:
            txt = logf.read_text()
            if "infernos_tpu up" in txt:
                break
            assert proc.poll() is None, f"daemon died during boot:\n{txt}"
            time.sleep(1.0)
        else:
            pytest.fail(f"daemon never came up:\n{logf.read_text()}")
        txt = logf.read_text()
        assert "DEGRADED" in txt or "compute platform: cpu" in txt, (
            "boot did not go through the degrade path:\n" + txt)

        phone = FakePhone()
        phone.call(("127.0.0.1", SIP_PORT))
        assert phone.uac.connected
        phone.stream_bg(_speechy(1.2), then_silence=True)
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            audio = phone.rx_audio()
            if len(audio) > 800 and np.abs(audio).max() > 1e-3:
                break
            time.sleep(0.25)
        phone.stop_streaming()
        audio = phone.rx_audio()
        assert len(audio) > 800, "degraded daemon produced no reply audio"
        assert np.abs(audio).max() > 1e-3, "reply audio is silent"
        phone.hangup()
    finally:
        if phone is not None:
            phone.close()
        if proc.poll() is None:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(20)
            except subprocess.TimeoutExpired:
                proc.kill()
