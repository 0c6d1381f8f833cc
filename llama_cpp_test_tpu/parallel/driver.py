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

Wire format: length-prefixed JSON of (method_name, args, kwargs) with typed
tags for tuples/dicts/SeqStates/SamplerParams — deliberately NOT pickle:
deserializing peer bytes must never execute code. "__stop__" ends the
follower loop.

Security: connections are authenticated with an HMAC-SHA256
challenge-response keyed by LLAMA_TPU_CLUSTER_SECRET (set it to a shared
random value in production; the default key only repels port scanners and
accidental connections). Like the reference's rpc-server (which documents
"never expose to an open network", examples/rpc/README.md), the side
channel assumes a trusted cluster network — the payload is engine control
traffic, so run it on the same isolated fabric as jax.distributed itself.
An unauthenticated peer is dropped without consuming a follower slot.
"""
from __future__ import annotations

import dataclasses
import hmac
import hashlib
import json
import os
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
    "compact_reuse",
)


def _secret() -> bytes:
    return os.environ.get(
        "LLAMA_TPU_CLUSTER_SECRET", "llama-tpu-cluster").encode()


def _authenticate_server(conn: socket.socket) -> bool:
    """Driver side: nonce challenge, verify the HMAC response."""
    nonce = os.urandom(16)
    try:
        conn.sendall(nonce)
        resp = _recv_exact(conn, 32)
    except (ConnectionError, OSError):
        return False
    want = hmac.new(_secret(), nonce, hashlib.sha256).digest()
    if not hmac.compare_digest(resp, want):
        return False
    conn.sendall(b"OK")
    return True


def _authenticate_client(sock: socket.socket) -> None:
    nonce = _recv_exact(sock, 16)
    sock.sendall(hmac.new(_secret(), nonce, hashlib.sha256).digest())
    if _recv_exact(sock, 2) != b"OK":
        raise ConnectionError("driver rejected handshake")


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return bytes(buf)


# -- typed-JSON value codec (no pickle: peer bytes never execute code) -------


def _enc_val(v):
    from ..runtime.engine import WindowHandle

    if isinstance(v, WindowHandle):
        # chained-window carry: device arrays can't ride the wire — each
        # rank substitutes ITS OWN last dispatched (un-discarded) handle,
        # which holds the equivalent per-rank device state
        return {"W": 0}
    if isinstance(v, SeqState):
        return {"S": v.seq_id}
    if dataclasses.is_dataclass(v) and type(v).__name__ == "SamplerParams":
        return {"P": {f.name: _enc_val(getattr(v, f.name))
                      for f in dataclasses.fields(v)}}
    if isinstance(v, dict):
        return {"D": [[_enc_val(k), _enc_val(x)] for k, x in v.items()]}
    if isinstance(v, tuple):
        return {"T": [_enc_val(x) for x in v]}
    if isinstance(v, list):
        return {"L": [_enc_val(x) for x in v]}
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        return v.item()  # numpy scalars
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    raise TypeError(f"driver wire: unsupported type {type(v).__name__}")


# marker the follower replaces with its own pending WindowHandle
_CARRY_SENTINEL = object()


def _dec_val(ctx: Context, v):
    if isinstance(v, dict):
        (tag, payload), = v.items()
        if tag == "W":
            return _CARRY_SENTINEL
        if tag == "S":
            return ctx.seqs[payload]
        if tag == "P":
            from ..runtime.sampling import SamplerParams

            return SamplerParams(**{k: _dec_val(ctx, x)
                                    for k, x in payload.items()})
        if tag == "D":
            return {_dec_val(ctx, k): _dec_val(ctx, x) for k, x in payload}
        if tag == "T":
            return tuple(_dec_val(ctx, x) for x in payload)
        if tag == "L":
            return [_dec_val(ctx, x) for x in payload]
        raise ValueError(f"driver wire: unknown tag {tag!r}")
    return v


def _send_msg(sock: socket.socket, obj: Any) -> None:
    data = json.dumps(obj, separators=(",", ":")).encode()
    sock.sendall(struct.pack("<Q", len(data)) + data)


_MAX_MSG = 1 << 30  # sanity cap on a length prefix from the peer


def _recv_msg(sock: socket.socket) -> Any:
    (n,) = struct.unpack("<Q", _recv_exact(sock, 8))
    if n > _MAX_MSG:
        raise ConnectionError(f"driver wire: oversized message ({n} bytes)")
    return json.loads(_recv_exact(sock, n))


def _encode_args(args, kwargs):
    """SeqState -> seq_id (recursing into lists for batched calls)."""
    return ([_enc_val(a) for a in args],
            {k: _enc_val(v) for k, v in kwargs.items()})


def _decode_args(ctx: Context, args, kwargs):
    return ([_dec_val(ctx, a) for a in args],
            {k: _dec_val(ctx, v) for k, v in kwargs.items()})


class DriverContext(Context):
    """Context that broadcasts every replicated call to follower processes
    before executing it locally. Drop-in for Scheduler/LlamaServer.

    `followers` is a LIST REFERENCE that may still be empty at construction
    and be filled (serve_followers) afterwards: Context init runs collective
    device work that every rank must enter concurrently, so the socket
    accept/connect handshake has to happen AFTER all ranks build their
    contexts (accept-before-init deadlocks: the follower can't connect
    until its own init finishes, which needs the driver's participation)."""

    # chained decode_window_async: the carry's DEVICE arrays can't ride
    # the wire, but each rank's carry is ITS OWN previous dispatch — so
    # the wire only names the chain ({"W": 0} sentinel) and followers
    # substitute their local pending handle. fetch/discard points are
    # broadcast explicitly so follower sequence state advances at exactly
    # the driver's sync points (round-4 limitation removed: multi-host
    # serving now keeps the double-buffered window overlap).
    supports_window_chaining = True

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


def _driver_decode_window_async(self, *args, **kwargs):
    """Replicated async window dispatch. The returned handle's fetch() is
    wrapped to broadcast the sync point first: followers fetch their own
    oldest pending handle there, applying sequence state at exactly the
    driver's fetch order (WindowHandle applies tokens/n_cached at fetch,
    not dispatch)."""
    self._bcast("decode_window_async", args, kwargs)
    h = Context.decode_window_async(self, *args, **kwargs)
    orig_fetch = h.fetch

    def fetch():
        if h._result is None and not getattr(h, "_discarded", False):
            self._bcast("__fetch_window__", [], {})
        return orig_fetch()

    h.fetch = fetch
    return h


def _driver_discard_window(self, h) -> None:
    """Abandon a dispatched-but-unfetched chained window on every rank
    (the scheduler's mid-window-stop rollback): followers drop their
    newest pending handle without applying its state."""
    h._discarded = True
    self._bcast("__discard_window__", [], {})


DriverContext.decode_window_async = _driver_decode_window_async
DriverContext.discard_window = _driver_discard_window


def serve_followers(port: int, n_followers: int,
                    host: str | None = None) -> list[socket.socket]:
    """Driver side: accept one AUTHENTICATED connection per follower rank.

    Binds to LLAMA_TPU_DRIVER_BIND (default 0.0.0.0 — followers live on
    other hosts; restrict it to the cluster interface where possible). A
    peer that fails the HMAC handshake is closed without consuming a
    follower slot."""
    if host is None:
        host = os.environ.get("LLAMA_TPU_DRIVER_BIND", "0.0.0.0")
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(n_followers)
    socks = []
    while len(socks) < n_followers:
        conn, _ = srv.accept()
        conn.settimeout(10.0)
        if not _authenticate_server(conn):
            try:
                conn.close()
            except OSError:
                pass
            continue
        conn.settimeout(None)
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
    _authenticate_client(sock)
    from collections import deque

    pending: deque = deque()  # this rank's un-fetched WindowHandles
    try:
        while True:
            method, args, kwargs = _recv_msg(sock)
            if method == "__stop__":
                return
            if method == "__fetch_window__":
                # the driver's handle.fetch() sync point: apply the OLDEST
                # pending window's state (fetch order == chain order)
                pending.popleft().fetch()
                continue
            if method == "__discard_window__":
                # abandoned chained window: drop the NEWEST dispatch
                # without applying its state (the driver never fetched it)
                pending.pop()
                continue
            if method == "decode_window_async":
                dargs, dkw = _decode_args(ctx, args, kwargs)
                if dkw.get("carry") is _CARRY_SENTINEL:
                    dkw["carry"] = pending[-1]
                pending.append(ctx.decode_window_async(*dargs, **dkw))
                continue
            if method not in REPLICATED:
                # never dispatch arbitrary attribute names from the wire
                raise ValueError(
                    f"driver wire: non-replicated method {method!r}")
            dargs, dkw = _decode_args(ctx, args, kwargs)
            getattr(ctx, method)(*dargs, **dkw)
    except ConnectionError:
        return
    finally:
        sock.close()


def command_port(coordinator: str) -> int:
    """Side-channel port derived from the jax.distributed coordinator."""
    return int(coordinator.rsplit(":", 1)[1]) + 1000
