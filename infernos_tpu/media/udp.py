"""UDP transport + RTP port allocation.

Capability parity: replaces sippy's ``Udp_server`` (used at
``RTP/InfernRTPEPoint.py:31-35`` with ``nworkers=1, direct_dispatch=True``)
and ``RTP_port_allocator`` (``RTP/InfernRTPConf.py:5-19``).  One receiver
thread per socket, direct dispatch into the ingest queue; the C++ engine
replaces this with a single epoll loop for thousands of sockets.
"""

from __future__ import annotations

import random
import socket
import threading
import time
from typing import Callable, Tuple


class UdpServer:
    """Bound UDP socket with a receive thread and direct dispatch."""

    def __init__(self, laddr: Tuple[str, int],
                 data_cb: Callable[[bytes, Tuple[str, int], float], None]):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(laddr)
        self.laddr = self.sock.getsockname()
        self.data_cb = data_cb
        self._run = True
        self._thr = threading.Thread(target=self._loop, daemon=True,
                                     name=f"udp:{self.laddr[1]}")
        self._thr.start()

    def _loop(self) -> None:
        self.sock.settimeout(0.25)
        while self._run:
            try:
                data, addr = self.sock.recvfrom(4096)
            except socket.timeout:
                continue
            except OSError:
                break
            self.data_cb(data, addr, time.monotonic())

    def send_to(self, data: bytes, addr: Tuple[str, int]) -> None:
        try:
            self.sock.sendto(data, addr)
        except OSError:
            pass

    def shutdown(self) -> None:
        self._run = False
        try:
            self.sock.close()
        except OSError:
            pass
        self._thr.join(timeout=1.0)


class RTPPortAllocator:
    """Even-port allocator in [min_port, max_port] (RTP convention)."""

    def __init__(self, min_port: int = 18000, max_port: int = 22000):
        assert min_port % 2 == 0
        self.min_port, self.max_port = min_port, max_port
        self._lock = threading.Lock()
        self._used: set = set()

    def alloc(self) -> int:
        with self._lock:
            ports = list(range(self.min_port, self.max_port, 2))
            random.shuffle(ports)
            for p in ports:
                if p not in self._used:
                    self._used.add(p)
                    return p
        raise RuntimeError("RTP port range exhausted")

    def release(self, port: int) -> None:
        with self._lock:
            self._used.discard(port)

    def bind_server(self, ip: str, data_cb) -> "UdpServer":
        """Allocate a port and bind, retrying on collision with the OS."""
        for _ in range(64):
            port = self.alloc()
            try:
                return UdpServer((ip, port), data_cb)
            except OSError:
                self.release(port)
        raise RuntimeError("could not bind any RTP port")
