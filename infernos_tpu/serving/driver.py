"""Engine driver: steps a slot-batched engine while work is pending.

The serving engines (TTS/STT/LLM) expose ``step() -> bool`` and are driven
from exactly one thread.  The driver parks when idle and wakes on ``kick()``
(called after submissions), so at zero load the device is untouched and at
any load the engine free-runs -- the analogue of the reference's
queue-blocking batched worker loop (``Cluster/InfernBatchedWorker.py:17-28``)
for slot-based engines.
"""

from __future__ import annotations

import threading

from ..utils.threads import WrkThread


class EngineDriver(WrkThread):
    def __init__(self, engine, name: str = "engine"):
        super().__init__(name=f"drv:{name}")
        self.engine = engine
        self._wake = threading.Event()

    def kick(self) -> None:
        self._wake.set()

    def run(self) -> None:
        while self.should_run():
            busy = self.engine.step()
            if not busy:
                self._wake.wait(timeout=0.1)
                self._wake.clear()

    def on_stop(self) -> None:
        self._wake.set()
