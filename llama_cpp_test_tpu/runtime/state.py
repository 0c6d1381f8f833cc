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
VERSION = 1


def save_seq_state(ctx: Context, s: SeqState, path: str) -> int:
    """Returns bytes written."""
    import os

    n = s.n_cached
    bs = ctx.block_size
    blocks = np.asarray(s.table.blocks, np.int32)
    arrays = {}
    for li in range(ctx.model.hp.n_layer):
        # [KV, n_blocks, BS, D] -> only the cached positions
        k = np.asarray(ctx.pools.k[li][:, blocks])
        v = np.asarray(ctx.pools.v[li][:, blocks])
        kv_heads, nb, _, d = k.shape
        arrays[f"k{li}"] = k.reshape(kv_heads, nb * bs, d)[:, :n].astype(
            np.float32)
        arrays[f"v{li}"] = v.reshape(kv_heads, nb * bs, d)[:, :n].astype(
            np.float32)
    meta = {
        "magic": MAGIC,
        "version": VERSION,
        "tokens": [int(t) for t in s.tokens],
        "n_cached": int(n),
        "model": ctx.model.path,
    }
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)
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
