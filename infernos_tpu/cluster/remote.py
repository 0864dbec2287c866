"""Cross-process actor transport: the multi-host plane.

The reference scales across hosts with Ray's gRPC actor RPC (SURVEY.md
section 2.9 "Distributed communication backend"); this module provides the
same calling conventions over a length-prefixed pickle protocol on TCP:

- :class:`ActorServer` exposes this process's actor registry
  (``cluster.actors.lookup``) to peers;
- :class:`RemoteActorHandle` mirrors :class:`ActorHandle`'s surface
  (``call`` fire-and-forget / ``ask`` Future / ``ask_sync`` / ``stop``);
- **callbacks cross the wire**: any callable inside the message (e.g.
  ``STTRequest.text_cb``, ``AudioInput.vad_chunk_in``) is replaced during
  pickling with a stub that, when invoked remotely, sends an ``op=cb``
  frame back over the same connection and runs the original callable in
  its home process -- the pattern Ray gets from serialized partials
  (``SIP/RemoteSession.py:8-17``);
- :class:`ActorHandle` arguments are proxied the same way, so a remote
  actor can call back into its peer's actors transparently.

Trust model: the plane is an intra-cluster transport (DCN between TPU
hosts), like Ray's; it must only be bound to cluster-internal interfaces.
Pickle is used deliberately for parity with Ray's cloudpickle semantics.
"""

from __future__ import annotations

import io
import pickle
import socket
import struct
import threading
from concurrent.futures import Future
from typing import Any, Callable, Dict, Optional, Tuple

from ..utils.logging import get_logger
from .actors import ActorHandle, lookup, spawn

log = get_logger("cluster.remote")

_MAX_CALLBACKS = 65536


class _Pickler(pickle.Pickler):
    def __init__(self, buf, conn: "Connection"):
        super().__init__(buf, protocol=pickle.HIGHEST_PROTOCOL)
        self.conn = conn

    def persistent_id(self, obj):
        if isinstance(obj, ActorHandle):
            return ("actor", obj.name)
        if isinstance(obj, RemoteActorHandle):
            # a proxied handle going back to (or through) a peer: address it
            # by name; the receiving side resolves locally first
            return ("actor", obj.name)
        if callable(obj) and not isinstance(obj, type):
            import functools
            import types

            # Pickle's own machinery serializes reconstructor FUNCTIONS
            # (e.g. numpy._reconstruct) -- those must pass through by
            # reference, NOT become callback stubs.  Proxy only stateful /
            # unpicklable callables, where by-value copies would also be
            # semantically wrong for callbacks (mutations lost):
            if isinstance(obj, (types.MethodType, functools.partial)):
                return ("cb", self.conn._register_callback(obj))
            if isinstance(obj, types.FunctionType):
                if obj.__name__ == "<lambda>" or "<locals>" in obj.__qualname__:
                    return ("cb", self.conn._register_callback(obj))
                return None  # importable module-level function
            if isinstance(obj, (types.BuiltinFunctionType,
                                types.BuiltinMethodType)):
                return None
            # instances with __call__ are callbacks with state: proxy
            return ("cb", self.conn._register_callback(obj))
        return None


class _Unpickler(pickle.Unpickler):
    def __init__(self, buf, conn: "Connection"):
        super().__init__(buf)
        self.conn = conn

    def persistent_load(self, pid):
        kind, ref = pid
        if kind == "actor":
            local = lookup(ref)
            if local is not None:
                return local
            return RemoteActorHandle(self.conn, ref)
        if kind == "cb":
            conn, cb_id = self.conn, ref
            return lambda *a, **kw: conn._send({"op": "cb", "cb": cb_id,
                                                "args": a, "kw": kw})
        raise pickle.UnpicklingError(f"unknown pid {pid!r}")


class Connection:
    """One bidirectional peer link: framing, callback tables, dispatch."""

    def __init__(self, sock: socket.socket, name: str = "peer"):
        self.sock = sock
        self.name = name
        self._wlock = threading.Lock()
        self._cbs: Dict[int, Callable] = {}
        self._cb_next = 1
        self._cb_lock = threading.Lock()
        self._futures: Dict[int, Future] = {}
        self._fut_next = 1
        self._fut_lock = threading.Lock()
        self.closed = threading.Event()
        self._reader = threading.Thread(target=self._read_loop, daemon=True,
                                        name=f"remote:{name}")
        self._reader.start()

    # -- callback table ---------------------------------------------------------
    def _register_callback(self, fn: Callable) -> int:
        with self._cb_lock:
            cb_id = self._cb_next
            self._cb_next += 1
            self._cbs[cb_id] = fn
            if len(self._cbs) > _MAX_CALLBACKS:
                # evict oldest (bounded table; a dropped stale callback logs
                # on invocation instead of leaking forever)
                oldest = min(self._cbs)
                del self._cbs[oldest]
        return cb_id

    # -- framing -----------------------------------------------------------------
    def _send(self, msg: Dict[str, Any]) -> None:
        buf = io.BytesIO()
        _Pickler(buf, self).dump(msg)
        data = buf.getvalue()
        try:
            with self._wlock:
                self.sock.sendall(struct.pack("!I", len(data)) + data)
        except OSError:
            self.closed.set()

    def _recv_exact(self, n: int) -> Optional[bytes]:
        out = b""
        while len(out) < n:
            try:
                chunk = self.sock.recv(n - len(out))
            except OSError:
                return None
            if not chunk:
                return None
            out += chunk
        return out

    def _read_loop(self) -> None:
        while not self.closed.is_set():
            hdr = self._recv_exact(4)
            if hdr is None:
                break
            size = struct.unpack("!I", hdr)[0]
            data = self._recv_exact(size)
            if data is None:
                break
            try:
                msg = _Unpickler(io.BytesIO(data), self).load()
                self._dispatch(msg)
            except Exception:
                log.exception("remote dispatch failed on %s", self.name)
        self.closed.set()
        with self._fut_lock:
            futs = list(self._futures.values())
            self._futures.clear()
        for f in futs:
            if not f.done():
                f.set_exception(ConnectionError("peer closed"))

    # -- dispatch ----------------------------------------------------------------
    def _dispatch(self, msg: Dict[str, Any]) -> None:
        op = msg["op"]
        if op == "call":
            h = lookup(msg["actor"])
            if h is None:
                log.warning("call to unknown actor %r", msg["actor"])
                return
            h.call(msg["method"], *msg["args"], **msg["kw"])
        elif op == "ask":
            h = lookup(msg["actor"])
            rid = msg["id"]
            if h is None:
                self._send({"op": "result", "id": rid, "ok": False,
                            "error": f"unknown actor {msg['actor']!r}"})
                return
            fut = h.ask(msg["method"], *msg["args"], **msg["kw"])

            def done(f, rid=rid):
                try:
                    self._send({"op": "result", "id": rid, "ok": True,
                                "value": f.result()})
                except Exception as e:
                    self._send({"op": "result", "id": rid, "ok": False,
                                "error": repr(e)})

            fut.add_done_callback(done)
        elif op == "result":
            with self._fut_lock:
                fut = self._futures.pop(msg["id"], None)
            if fut is not None:
                if msg["ok"]:
                    fut.set_result(msg["value"])
                else:
                    fut.set_exception(RuntimeError(msg["error"]))
        elif op == "cb":
            fn = self._cbs.get(msg["cb"])
            if fn is None:
                log.warning("remote callback %d expired", msg["cb"])
                return
            try:
                fn(*msg["args"], **msg["kw"])
            except Exception:
                log.exception("remote callback failed")
        elif op == "spawn":
            import importlib

            mod, cls = msg["cls"].rsplit(":", 1)
            h = spawn(getattr(importlib.import_module(mod), cls),
                      *msg["args"], name=msg["name"], **msg["kw"])
            self._send({"op": "result", "id": msg["id"], "ok": True,
                        "value": h.name})
        elif op == "stop_actor":
            h = lookup(msg["actor"])
            if h is not None:
                h.stop()

    # -- client surface ------------------------------------------------------------
    def new_future(self) -> Tuple[int, Future]:
        with self._fut_lock:
            rid = self._fut_next
            self._fut_next += 1
            fut: Future = Future()
            self._futures[rid] = fut
        return rid, fut

    def spawn_remote(self, cls_path: str, *args, name: str,
                     timeout: float = 300.0, **kw) -> "RemoteActorHandle":
        rid, fut = self.new_future()
        self._send({"op": "spawn", "id": rid, "cls": cls_path, "name": name,
                    "args": args, "kw": kw})
        return RemoteActorHandle(self, fut.result(timeout))

    def close(self) -> None:
        self.closed.set()
        try:
            self.sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self.sock.close()


class RemoteActorHandle:
    """ActorHandle surface over a :class:`Connection`."""

    def __init__(self, conn: Connection, name: str):
        self._conn = conn
        self.name = name

    def call(self, method: str, *args, **kw) -> None:
        self._conn._send({"op": "call", "actor": self.name, "method": method,
                          "args": args, "kw": kw})

    def ask(self, method: str, *args, **kw) -> Future:
        rid, fut = self._conn.new_future()
        self._conn._send({"op": "ask", "id": rid, "actor": self.name,
                          "method": method, "args": args, "kw": kw})
        return fut

    def ask_sync(self, method: str, *args, timeout: Optional[float] = 30.0,
                 **kw):
        return self.ask(method, *args, **kw).result(timeout)

    def stop(self) -> None:
        self._conn._send({"op": "stop_actor", "actor": self.name})


class ActorServer:
    """Expose this process's actors to peers (one Connection per peer)."""

    def __init__(self, bind: Tuple[str, int] = ("127.0.0.1", 0)):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(bind)
        self.sock.listen(16)
        self.laddr = self.sock.getsockname()
        self.conns: list = []
        self._run = True
        self._thr = threading.Thread(target=self._accept_loop, daemon=True,
                                     name=f"actor-server:{self.laddr[1]}")
        self._thr.start()

    def _accept_loop(self) -> None:
        while self._run:
            try:
                sock, addr = self.sock.accept()
            except OSError:
                break
            sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self.conns.append(Connection(sock, name=f"{addr[0]}:{addr[1]}"))

    def close(self) -> None:
        self._run = False
        try:
            self.sock.close()
        except OSError:
            pass
        for c in self.conns:
            c.close()


def connect(addr: Tuple[str, int], timeout: float = 10.0) -> Connection:
    sock = socket.create_connection(addr, timeout=timeout)
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    sock.settimeout(None)
    return Connection(sock, name=f"{addr[0]}:{addr[1]}")
