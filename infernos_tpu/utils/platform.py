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
