"""Persistent XLA compilation cache enablement.

Cold-start at whisper/speecht5 scale is minutes of XLA compilation; with the
persistent cache a warm daemon start replays executables from disk in
seconds.  Must be configured through ``jax.config`` (env vars are too late
in environments where ``sitecustomize`` pre-imports jax), and BEFORE the
first compilation -- call this at process entry (the CLI daemon, benches,
and the graft entry all do).
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: Optional[str] = None,
           min_compile_secs: float = 1.0) -> str:
    """Idempotently enable the persistent compilation cache."""
    import jax

    cache_dir = cache_dir or os.environ.get("INFERNOS_COMPILE_CACHE", _DEFAULT)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
