"""JAX platform selection with graceful fallback.

The serving daemon prefers the TPU backend but must come up (degraded) when
the accelerator is unreachable -- the analogue of the reference's device
fallback chains at actor init (``Cluster/InfernSTTActor.py:24-31``,
``InfernRTPActor.py:85-96``: xpu -> cuda -> cpu).
"""

from __future__ import annotations

from .logging import get_logger

log = get_logger("utils.platform")


def model_start_timeout() -> float:
    """Per-model-actor start timeout (seconds).

    A full-dims engine start pays the XLA compile wall on a cold cache
    (three fused-kernel chunk variants + prefill/join/vocoder programs can
    exceed 20 min on first compile); with a warm persistent cache it
    replays in seconds.  The default must cover the cold path -- a daemon
    that times out mid-compile and aborts is strictly worse than a slow
    first boot.  Override with ``INFERNOS_START_TIMEOUT``.
    """
    import os

    return float(os.environ.get("INFERNOS_START_TIMEOUT", "3600"))


def ensure_backend() -> str:
    """Initialize a usable JAX backend; returns its platform name."""
    import jax

    try:
        dev = jax.devices()[0]
        return dev.platform
    except RuntimeError as e:
        log.warning("preferred JAX backend unavailable (%s); falling back to CPU",
                    str(e).split("\n")[0])
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()[0].platform


def probe_backend_bounded(timeout_s: float = 90.0) -> bool:
    """True iff the configured accelerator grants a device claim within
    ``timeout_s``, probed in a THROWAWAY subprocess.

    Remote-attached backends can hang ``jax.devices()`` FOREVER when the
    device service is down (observed 2026-08-17: ~hours where the claim
    blocked server-side with no error), and a hung backend init cannot be
    recovered in-process.  Probe before the first in-process device touch;
    on failure the daemon can drop to CPU (degraded-but-up, the analogue
    of the reference's xpu->cuda->cpu chains at actor init,
    ``Cluster/InfernSTTActor.py:24-31``) instead of hanging boot.
    """
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp;"
            "print('BACKEND_OK', (jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0, 0])")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    return "BACKEND_OK" in proc.stdout


def ensure_backend_or_degrade(probe_timeout_s: float = 90.0) -> str:
    """Boot-time backend selection with a bounded probe.

    CPU-configured processes skip the probe (nothing to hang).  When the
    accelerator probe fails and ``INFERNOS_REQUIRE_ACCEL`` is set, raise
    (operators who prefer crash-and-restart over degraded service); else
    force the CPU backend and serve degraded.  Returns the platform name.
    """
    import os

    import jax

    probe_timeout_s = float(
        os.environ.get("INFERNOS_PROBE_TIMEOUT_S", probe_timeout_s))
    if os.environ.get("JAX_PLATFORMS", "") in ("cpu",):
        return ensure_backend()
    if probe_backend_bounded(probe_timeout_s):
        # the probe's subprocess held a claim moments ago; backends with a
        # claim cooldown (axon: ~90 s between process claims) can refuse
        # the immediate in-process re-claim -- retry through the cooldown
        # rather than silently degrading a HEALTHY accelerator to CPU
        import time

        import jax

        retry_s = float(os.environ.get("INFERNOS_CLAIM_RETRY_S", "95"))
        for attempt in range(3):
            try:
                return jax.devices()[0].platform
            except RuntimeError as e:
                log.warning("in-process claim attempt %d failed (%s); "
                            "retrying in %.0fs", attempt + 1,
                            str(e).split("\n")[0], retry_s)
                time.sleep(retry_s)
        # fall through to the degrade/require decision below
    if os.environ.get("INFERNOS_REQUIRE_ACCEL"):
        raise RuntimeError(
            "accelerator probe failed (device claim not granted within "
            f"{probe_timeout_s}s) and INFERNOS_REQUIRE_ACCEL is set")
    log.error("accelerator probe failed (claim not granted in %.0fs); "
              "serving DEGRADED on the CPU backend", probe_timeout_s)
    jax.config.update("jax_platforms", "cpu")
    return ensure_backend()
