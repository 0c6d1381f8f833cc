"""Multi-host serving: driver/follower engine replication.

The ggml-rpc replacement (SURVEY.md §2.4; reference
ggml/src/ggml-rpc/ggml-rpc.cpp + examples/rpc): under multi-controller JAX,
every process must execute the same jitted program in lockstep, but only one
process talks HTTP. Rank 0 (the driver) runs the real server/scheduler and
broadcasts every engine-mutating call over a TCP side channel; ranks > 0
(followers) replay the identical call sequence on their local Context, so
the global SPMD collectives inside each jitted step line up.

Determinism contract: BlockManager allocation and seq-id assignment are pure
functions of the call sequence, so driver and follower block tables stay
byte-identical without ever being exchanged.

Serving currently requires dp == 1 on multi-host meshes (logits replicated
via the tp all-gather, so every process can read them; dp-sharded batches
would leave rows addressable only on remote hosts).

Wire format: length-prefixed pickle of (method_name, args, kwargs) with
SeqStates replaced by their seq_id (int). "__stop__" ends the follower loop.
"""
from __future__ import annotations

import pickle
import socket
import struct
import threading
from typing import Any

from ..runtime.engine import Context, SeqState

# Context methods broadcast to followers. Every entry mutates device pools,
# the block manager, or sequence state; anything not listed is driver-local.
REPLICATED = (
    "new_seq", "free_seq", "fork_seq", "prefill", "decode", "decode_window",
    "draft_window", "prefill_batch", "truncate_seq", "shift_context",
    "self_extend", "embed", "decode_greedy_loop", "prefill_nll",
)


def _send_msg(sock: socket.socket, obj: Any) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(struct.pack("<Q", len(data)) + data)


def _recv_msg(sock: socket.socket) -> Any:
    hdr = b""
    while len(hdr) < 8:
        chunk = sock.recv(8 - len(hdr))
        if not chunk:
            raise ConnectionError("driver closed")
        hdr += chunk
    (n,) = struct.unpack("<Q", hdr)
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("driver closed mid-message")
        buf += chunk
    return pickle.loads(bytes(buf))


def _encode_args(args, kwargs):
    """SeqState -> seq_id (recursing into lists for batched calls)."""
    def enc(v):
        if isinstance(v, SeqState):
            return ("__seq__", v.seq_id)
        if isinstance(v, (list, tuple)):
            return type(v)(enc(x) for x in v)
        return v
    return [enc(a) for a in args], {k: enc(v) for k, v in kwargs.items()}


def _decode_args(ctx: Context, args, kwargs):
    def dec(v):
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "__seq__":
            return ctx.seqs[v[1]]
        if isinstance(v, (list, tuple)):
            return type(v)(dec(x) for x in v)
        return v
    return [dec(a) for a in args], {k: dec(v) for k, v in kwargs.items()}


class DriverContext(Context):
    """Context that broadcasts every replicated call to follower processes
    before executing it locally. Drop-in for Scheduler/LlamaServer.

    `followers` is a LIST REFERENCE that may still be empty at construction
    and be filled (serve_followers) afterwards: Context init runs collective
    device work that every rank must enter concurrently, so the socket
    accept/connect handshake has to happen AFTER all ranks build their
    contexts (accept-before-init deadlocks: the follower can't connect
    until its own init finishes, which needs the driver's participation)."""

    def __init__(self, *args, followers: list[socket.socket], **kwargs):
        self._followers = followers
        self._lock = threading.Lock()
        super().__init__(*args, **kwargs)

    def _bcast(self, method: str, args, kwargs) -> None:
        eargs, ekw = _encode_args(args, kwargs)
        with self._lock:
            for sock in self._followers:
                _send_msg(sock, (method, eargs, ekw))

    def close(self) -> None:
        with self._lock:
            for sock in self._followers:
                try:
                    _send_msg(sock, ("__stop__", [], {}))
                    sock.close()
                except OSError:
                    pass


def _wrap(method: str):
    def fn(self, *args, **kwargs):
        self._bcast(method, args, kwargs)
        return getattr(Context, method)(self, *args, **kwargs)
    fn.__name__ = method
    return fn


for _m in REPLICATED:
    setattr(DriverContext, _m, _wrap(_m))


def serve_followers(port: int, n_followers: int,
                    host: str = "0.0.0.0") -> list[socket.socket]:
    """Driver side: accept one connection per follower rank."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(n_followers)
    socks = []
    for _ in range(n_followers):
        conn, _ = srv.accept()
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        socks.append(conn)
    srv.close()
    return socks


def follower_loop(ctx: Context, driver_host: str, port: int,
                  timeout: float | None = None) -> None:
    """Follower side: connect to the driver and replay its engine calls
    until __stop__ or disconnect. Return values are discarded — the point
    is executing the same jitted programs so global collectives match."""
    import time as _time

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    deadline = None if timeout is None else _time.time() + timeout
    while True:
        try:
            sock.connect((driver_host, port))
            break
        except OSError:
            if deadline is not None and _time.time() > deadline:
                raise
            _time.sleep(0.1)
    sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    try:
        while True:
            method, args, kwargs = _recv_msg(sock)
            if method == "__stop__":
                return
            dargs, dkw = _decode_args(ctx, args, kwargs)
            getattr(ctx, method)(*dargs, **dkw)
    except ConnectionError:
        return
    finally:
        sock.close()


def command_port(coordinator: str) -> int:
    """Side-channel port derived from the jax.distributed coordinator."""
    return int(coordinator.rsplit(":", 1)[1]) + 1000
