"""Cross-process actor transport tests (the multi-host plane).

VERDICT round-1 item 7: ActorHandle.call/ask remoting with mailbox
semantics; a two-process test on localhost moving an LT call's STT leg
out-of-process.
"""

import os
import subprocess
import sys
import textwrap
import threading
import time

import numpy as np
import pytest

from infernos_tpu.cluster import remote
from infernos_tpu.cluster.actors import Actor, spawn, stop_all

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD_SRC = r"""
import sys
from infernos_tpu.cluster import remote

srv = remote.ActorServer(("127.0.0.1", 0))
print(f"PORT {srv.laddr[1]}", flush=True)
sys.stdin.readline()  # parent closes stdin to stop us
"""


class _ChildProc:
    """A peer process exposing an ActorServer; actors spawn on demand."""

    def __init__(self):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        self.proc = subprocess.Popen(
            [sys.executable, "-c", CHILD_SRC], env=env, cwd=REPO,
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True)
        line = self.proc.stdout.readline()
        assert line.startswith("PORT "), line
        self.port = int(line.split()[1])
        # heartbeat off: the 1-core CI host starves this process for
        # >dead_after_s during model compiles (production keeps it on)
        self.conn = remote.connect(("127.0.0.1", self.port),
                                   heartbeat_s=0)

    def close(self):
        self.conn.close()
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=10)
        except Exception:
            self.proc.kill()


@pytest.fixture
def child():
    c = _ChildProc()
    yield c
    c.close()


class Pong(Actor):
    def __init__(self):
        self.got = []

    def ping(self, x):
        self.got.append(x)
        return x * 2

    def call_me_back(self, cb, value):
        cb(value + 1)

    def poke_actor(self, handle, tag):
        # a proxied ActorHandle argument: call back into the peer's actor
        handle.call("ping", tag)


def test_remote_ask_call_roundtrip(child):
    h = child.conn.spawn_remote("tests.test_remote:Pong", name="pong")
    assert h.ask_sync("ping", 21) == 42
    h.call("ping", 7)  # fire-and-forget
    time.sleep(0.3)
    assert h.ask_sync("ping", 1) == 2


def test_remote_callback_crosses_back(child):
    h = child.conn.spawn_remote("tests.test_remote:Pong", name="pong2")
    got = []
    evt = threading.Event()
    h.call("call_me_back", lambda v: (got.append(v), evt.set()), 41)
    assert evt.wait(10.0)
    assert got == [42]


def test_remote_actor_handle_proxying(child):
    """Passing a LOCAL ActorHandle to a remote actor lets the remote side
    call back into this process's actor."""
    local = spawn(Pong, name="local-pong")
    try:
        h = child.conn.spawn_remote("tests.test_remote:Pong", name="pong3")
        h.call("poke_actor", local, "hello")
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            if local.ask_sync("ping", 0) == 0 and local._actor.got[:-1]:
                break
            time.sleep(0.1)
        assert "hello" in local._actor.got
    finally:
        stop_all()


def test_remote_unknown_actor_errors(child):
    h = remote.RemoteActorHandle(child.conn, "nope")
    with pytest.raises(RuntimeError):
        h.ask_sync("x", timeout=10.0)


@pytest.mark.e2e
def test_lt_call_with_remote_stt(child, tmp_path):
    """The full LT two-leg bridge with the STT actor living in ANOTHER
    process: Alice speaks, the remote STT transcribes, Bob hears TTS."""
    from tests.test_e2e_calls import FakePhone, FarEnd, _speechy
    from infernos_tpu.config import InfernConfig
    from infernos_tpu.main import build_cluster

    stt = child.conn.spawn_remote(
        "infernos_tpu.cluster.model_actors:STTActor", True, name="stt-far")
    stt.ask_sync("start", timeout=600.0)

    cfg_text = textwrap.dedent("""
        sip:
          settings:
            bind: 127.0.0.1:15890
          profiles:
            inbound:
              sink: apps/live_translator/l1
            bob:
              sip_server: 127.0.0.1:15892
        rtp:
          settings:
            min_port: 29000
            max_port: 29400
        apps:
          live_translator:
            profiles:
              l1:
                stt_langs: ['en', 'pt']
                tts_langs: ['pt', 'en']
                outbound: sip/bob;cld=900
    """)
    p = tmp_path / "lt.yaml"
    p.write_text(cfg_text)
    iconf = InfernConfig(str(p))
    bob = FarEnd(port=15892)
    alice = None
    try:
        handles = build_cluster(iconf, tiny=True, bind_ip="127.0.0.1",
                                stt_actr=stt)
        alice = FakePhone()
        alice.call(iconf.sip_conf.bind)
        assert alice.uac.connected
        assert bob.answered.wait(20.0), "outbound leg never reached Bob"
        alice.stream_bg(_speechy(1.2, seed=7), then_silence=True)
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            audio = bob.rx_audio()
            if len(audio) > 800 and np.abs(audio).max() > 1e-3:
                break
            time.sleep(0.25)
        alice.stop_streaming()
        audio = bob.rx_audio()
        assert len(audio) > 800, "no TTS audio reached Bob via remote STT"
        alice.hangup()
    finally:
        if alice:
            alice.close()
        bob.close()
        stop_all()


class Sleeper(Actor):
    def nap(self, seconds):
        time.sleep(seconds)
        return "rested"


def test_link_death_fails_futures_fast(child):
    """VERDICT r2 item 8 'Done': kill the TCP link mid-call; in-flight
    asks fail fast with ConnectionError, not hang."""
    h = child.conn.spawn_remote("tests.test_remote:Sleeper", name="sleeper")
    fut = h.ask("nap", 30.0)
    time.sleep(0.2)
    t0 = time.monotonic()
    child.conn.close()
    with pytest.raises((ConnectionError, RuntimeError)):
        fut.result(timeout=5.0)
    assert time.monotonic() - t0 < 2.0, "future did not fail fast"
    # sends on the dead link raise immediately instead of silently dropping
    with pytest.raises(ConnectionError):
        h.call("nap", 0.0)


def test_peerlink_reconnects_and_reregisters(child):
    """Kill and restore the link mid-call: on_down fires (owner EOSes),
    the link redials, on_up re-registers, and calls flow again."""
    ups, downs = [], []
    up_evt = threading.Event()

    def on_up(link):
        ups.append(time.monotonic())
        up_evt.set()

    link = remote.PeerLink(("127.0.0.1", child.port), on_up=on_up,
                           on_down=lambda l: downs.append(time.monotonic()),
                           retry_min_s=0.1)
    try:
        assert len(ups) == 1  # initial connect counts as up
        h = link.handle("pong-rl")
        link.conn().spawn_remote("tests.test_remote:Pong", name="pong-rl")
        assert h.ask_sync("ping", 5) == 10

        # sever the link (simulates a network blip; server side survives)
        up_evt.clear()
        link.conn().sock.shutdown(2)
        deadline = time.monotonic() + 10
        while not downs and time.monotonic() < deadline:
            time.sleep(0.05)
        assert downs, "on_down never fired"
        # during downtime: fail fast, not hang
        t0 = time.monotonic()
        try:
            h.ask_sync("ping", 1, timeout=5.0)
        except (ConnectionError, RuntimeError):
            pass
        assert time.monotonic() - t0 < 3.0

        assert up_evt.wait(10.0), "link did not reconnect"
        assert len(ups) == 2
        # re-registered surface works on the NEW connection
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            try:
                assert h.ask_sync("ping", 3, timeout=5.0) == 6
                break
            except (ConnectionError, RuntimeError):
                time.sleep(0.1)
        else:
            raise AssertionError("calls never recovered after reconnect")
    finally:
        link.close()


def test_send_backpressure_closes_stuck_link():
    """A peer that never drains trips the bounded queue -> ConnectionError,
    and the link is closed (undrainable == dead for real-time traffic)."""
    import socket as _socket

    srv = _socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    cli = _socket.create_connection(srv.getsockname())
    peer, _ = srv.accept()  # never reads
    conn = remote.Connection(cli, name="stuck", send_queue=4,
                             send_timeout=0.3, heartbeat_s=0)
    try:
        big = b"x" * (1 << 20)
        with pytest.raises(ConnectionError):
            for _ in range(200):  # fill socket buffer + queue
                conn._send({"op": "call", "actor": "x", "method": "m",
                            "args": (big,), "kw": {}})
        assert conn.closed.is_set()
    finally:
        conn.close()
        peer.close()
        srv.close()


def test_heartbeat_detects_dead_peer():
    """A peer that stops responding is declared dead within dead_after_s."""
    import socket as _socket

    srv = _socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    cli = _socket.create_connection(srv.getsockname())
    peer, _ = srv.accept()  # accepts but never answers pings
    conn = remote.Connection(cli, name="mute", heartbeat_s=0.2,
                             dead_after_s=0.8)
    try:
        assert conn.closed.wait(5.0), "dead peer not detected"
    finally:
        conn.close()
        peer.close()
        srv.close()


def test_heartbeat_legacy_grace(monkeypatch):
    """INFERNOS_HB_LEGACY_GRACE: a never-ponged (legacy-revision) peer is
    NOT torn down on rx silence during a mixed-version rollout window."""
    import socket as _socket

    monkeypatch.setenv("INFERNOS_HB_LEGACY_GRACE", "1")
    srv = _socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    cli = _socket.create_connection(srv.getsockname())
    peer, _ = srv.accept()  # legacy peer: silent but TCP-alive
    conn = remote.Connection(cli, name="legacy", heartbeat_s=0.2,
                             dead_after_s=0.6)
    try:
        assert not conn.closed.wait(2.0), "legacy peer torn down under grace"
    finally:
        conn.close()
        peer.close()
        srv.close()
