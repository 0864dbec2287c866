"""Utility tests: metrics registry, worker thread FSM, platform fallback."""

import time

from infernos_tpu.utils.metrics import Metrics
from infernos_tpu.utils.threads import WrkState, WrkThread


def test_metrics_counters_gauges():
    m = Metrics()
    m.inc("calls")
    m.inc("calls", 2)
    m.set("active", 7)
    snap = m.snapshot()
    assert snap["calls"] == 3
    assert snap["active"] == 7


def test_metrics_histogram_percentiles():
    m = Metrics()
    for v in range(100):
        m.observe("lat", v / 100.0)
    snap = m.snapshot()
    assert abs(snap["lat.p50"] - 0.5) < 0.05
    assert abs(snap["lat.p95"] - 0.95) < 0.05
    assert snap["lat.count"] == 100
    assert abs(snap["lat.mean"] - 0.495) < 0.01


def test_metrics_timer():
    m = Metrics()
    with m.timer("op"):
        time.sleep(0.02)
    snap = m.snapshot()
    assert snap["op.count"] == 1
    assert 0.01 < snap["op.mean"] < 0.5


def test_metrics_reservoir_bound():
    m = Metrics()
    for v in range(10000):
        m.observe("big", float(v))
    h = m.hists["big"]
    assert len(h.values) <= h.maxlen
    assert h.count == 10000


def test_wrk_thread_lifecycle():
    ticks = []

    class T(WrkThread):
        def run(self):
            while self.should_run():
                ticks.append(1)
                time.sleep(0.005)

    t = T(name="t")
    assert t._state == WrkState.INIT
    t.start()
    time.sleep(0.05)
    t.stop()
    assert t._state == WrkState.STOPPED
    assert ticks
    n = len(ticks)
    time.sleep(0.03)
    assert len(ticks) == n  # actually stopped
    # double stop is safe
    t.stop()


def test_probe_backend_bounded_cpu():
    from infernos_tpu.utils.platform import probe_backend_bounded

    assert probe_backend_bounded(120.0)


def test_ensure_backend_or_degrade_require_accel(monkeypatch):
    from infernos_tpu.utils import platform as plat

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("INFERNOS_REQUIRE_ACCEL", "1")
    monkeypatch.setattr(plat, "probe_backend_bounded", lambda t: False)
    import pytest

    with pytest.raises(RuntimeError, match="INFERNOS_REQUIRE_ACCEL"):
        plat.ensure_backend_or_degrade(1.0)
