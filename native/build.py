"""Build the native media engine: g++ -> librtpengine.so.

Invoked automatically by ``infernos_tpu.media.native`` on first import (and
cached); can also be run directly: ``python native/build.py``.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "rtp_engine.cpp")
OUT = os.path.join(HERE, "librtpengine.so")


def build(force: bool = False) -> str:
    """Compile if missing/stale; returns the .so path."""
    if (not force and os.path.exists(OUT)
            and os.path.getmtime(OUT) >= os.path.getmtime(SRC)):
        return OUT
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-o", OUT, SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return OUT


if __name__ == "__main__":
    print(build(force="-f" in sys.argv))
