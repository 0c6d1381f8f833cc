"""Sequence state save/restore — the session-file analogue.

Mirrors llama_state_seq_get_data / set_data (reference include/llama.h:848-882,
GGSQ v2) re-shaped for the paged cache: a saved sequence is its token list
plus, per layer, the K/V page data for exactly n_cached positions, gathered
from the HBM pools through the block table. Restore allocates fresh blocks
and scatters the pages back — used for prompt-cache session files
(examples/main/main.cpp:237-255) and server slot save/restore
(server.cpp:4438).

Format: npz with magic/version metadata (portable, mmap-friendly).
"""
from __future__ import annotations

import json

import numpy as np

from .engine import Context, SeqState

MAGIC = "llamacpp-tpu-seq"
MAGIC_CTX = "llamacpp-tpu-ctx"
VERSION = 1


def _gather_seq_arrays(ctx: Context, s: SeqState, prefix: str = "") -> dict:
    """Per-layer K/V for exactly s.n_cached positions, via the block table."""
    n = s.n_cached
    bs = ctx.block_size
    blocks = np.asarray(s.table.blocks, np.int32)
    arrays = {}
    for li in range(ctx.model.hp.n_layer):
        # [KV, n_blocks, BS, D] -> only the cached positions
        k = np.asarray(ctx.pools.k[li][:, blocks])
        v = np.asarray(ctx.pools.v[li][:, blocks])
        kv_heads, nb, _, d = k.shape
        arrays[f"{prefix}k{li}"] = k.reshape(kv_heads, nb * bs, d)[:, :n] \
            .astype(np.float32)
        arrays[f"{prefix}v{li}"] = v.reshape(kv_heads, nb * bs, d)[:, :n] \
            .astype(np.float32)
    return arrays


def save_seq_state(ctx: Context, s: SeqState, path: str) -> int:
    """Returns bytes written."""
    import os

    arrays = _gather_seq_arrays(ctx, s)
    meta = {
        "magic": MAGIC,
        "version": VERSION,
        "tokens": [int(t) for t in s.tokens],
        "n_cached": int(s.n_cached),
        "model": ctx.model.path,
    }
    # write through a file object: np.savez appends '.npz' to bare PATHS,
    # which would break callers passing arbitrary session-file names
    with open(path, "wb") as f:
        np.savez_compressed(f, meta=json.dumps(meta), **arrays)
    return os.path.getsize(path)


def load_seq_state(ctx: Context, path: str) -> SeqState:
    """Allocates a new sequence in ctx and restores its cache."""
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta.get("magic") != MAGIC:
        raise ValueError(f"{path}: not a sequence state file")
    if meta.get("version") != VERSION:
        raise ValueError(f"{path}: unsupported version {meta.get('version')}")
    if meta.get("model") and meta["model"] != ctx.model.path:
        # a session from a different model silently injects foreign KV
        # (the reference's session load validates the model too)
        raise ValueError(
            f"{path}: session was saved from {meta['model']!r}, not "
            f"{ctx.model.path!r} — refusing to restore")
    n = int(meta["n_cached"])
    s = ctx.new_seq()
    slots = s.table.append_tokens(n)
    ctx._drain_copies([s])
    slot_arr = np.asarray(slots, np.int32)
    from . import kv_cache

    for li in range(ctx.model.hp.n_layer):
        k = jnp.asarray(data[f"k{li}"], ctx.pools.k[li].dtype)  # [KV, n, D]
        v = jnp.asarray(data[f"v{li}"], ctx.pools.v[li].dtype)
        new_k = k.transpose(1, 0, 2)[None]  # [1, n, KV, D]
        new_v = v.transpose(1, 0, 2)[None]
        ctx.pools.k[li] = kv_cache.write_kv(
            ctx.pools.k[li], new_k, slot_arr[None])
        ctx.pools.v[li] = kv_cache.write_kv(
            ctx.pools.v[li], new_v, slot_arr[None])
    s.tokens = [int(t) for t in meta["tokens"]]
    s.n_cached = n
    return s


# ---------------------------------------------------------------------------
# full-context state blob (GGSN analogue)


def save_state(ctx: Context, path: str) -> int:
    """Save the WHOLE context — every live sequence's tokens, position
    offset, and cached K/V — in one blob (the llama_state_get_data /
    llama_state_save_file analogue, reference include/llama.h:793-840,
    GGSN v9; ours holds the paged-cache equivalent of its kv_self
    serialization). Restore with load_state into a context created with
    the same model/config. Returns bytes written."""
    import os

    seqs = sorted(ctx.seqs.values(), key=lambda s: s.seq_id)
    arrays = {}
    metas = []
    for i, s in enumerate(seqs):
        arrays.update(_gather_seq_arrays(ctx, s, prefix=f"s{i}_"))
        metas.append({
            "seq_id": s.seq_id,
            "tokens": [int(t) for t in s.tokens],
            "n_cached": int(s.n_cached),
            "pos_offset": int(s.pos_offset),
            "group": int(s.group),
        })
    meta = {
        "magic": MAGIC_CTX,
        "version": VERSION,
        "model": ctx.model.path,
        "n_ctx": ctx.n_ctx,
        "block_size": ctx.block_size,
        "seqs": metas,
        "next_id": ctx._next_id,
    }
    # write through a file object: np.savez appends '.npz' to bare PATHS,
    # which would break callers passing arbitrary session-file names
    with open(path, "wb") as f:
        np.savez_compressed(f, meta=json.dumps(meta), **arrays)
    return os.path.getsize(path)


def load_state(ctx: Context, path: str) -> list[SeqState]:
    """Restore a full-context blob into ctx (which must hold no live
    sequences). Recreates every sequence with its original seq_id and
    scatters its cache back. Returns the sequences in saved order."""
    import jax.numpy as jnp

    from . import kv_cache

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta.get("magic") != MAGIC_CTX:
        raise ValueError(f"{path}: not a context state file")
    if meta.get("version") != VERSION:
        raise ValueError(f"{path}: unsupported version {meta.get('version')}")
    if ctx.seqs:
        raise ValueError("load_state: context already has live sequences")
    if meta["block_size"] != ctx.block_size or meta["n_ctx"] != ctx.n_ctx:
        raise ValueError("load_state: context config mismatch "
                         f"(saved n_ctx={meta['n_ctx']} "
                         f"block_size={meta['block_size']})")
    out = []
    for i, sm in enumerate(meta["seqs"]):
        s = ctx.new_seq()
        n = int(sm["n_cached"])
        slots = s.table.append_tokens(n)
        ctx._drain_copies([s])
        slot_arr = np.asarray(slots, np.int32)
        for li in range(ctx.model.hp.n_layer):
            k = jnp.asarray(data[f"s{i}_k{li}"], ctx.pools.k[li].dtype)
            v = jnp.asarray(data[f"s{i}_v{li}"], ctx.pools.v[li].dtype)
            ctx.pools.k[li] = kv_cache.write_kv(
                ctx.pools.k[li], k.transpose(1, 0, 2)[None], slot_arr[None])
            ctx.pools.v[li] = kv_cache.write_kv(
                ctx.pools.v[li], v.transpose(1, 0, 2)[None], slot_arr[None])
        ctx.seqs.pop(s.seq_id, None)
        s.seq_id = int(sm["seq_id"])
        s.tokens = [int(t) for t in sm["tokens"]]
        s.n_cached = n
        s.pos_offset = int(sm["pos_offset"])
        ctx.seqs[s.seq_id] = s
        out.append(s)
    ctx._next_id = max(int(meta.get("next_id", 0)),
                       max((s.seq_id + 1 for s in out), default=0))
    return out
