"""Tensor-parallel sharding of packed quantized weights.

Megatron-style TP over the 'tp' mesh axis (the GSPMD analogue of the
reference's LLAMA_SPLIT_MODE_ROW, src/llama-model.cpp:313-341 — but with the
reduction expressed as lax.psum inside shard_map instead of a split-buffer
backend):

  column-parallel (shard output rows N): wq, wk, wv, ffn_gate, ffn_up, output
  row-parallel    (shard contraction K): wo, ffn_down  -> psum after matmul

Nibble/crumb planes pack value pairs ALONG N (quant/repack.py), which would
interleave a global N-shard across devices. `repack_sharded` therefore packs
each shard's rows locally and concatenates the per-shard planes, so an axis-0
NamedSharding hands every device exactly its own locally-consistent plane —
zero repacking at dispatch, and inside shard_map the unchanged qmm kernels
see a normal QTensor.
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, GGML_BLOCK_SIZES, type_size
from ..quant.repack import QTensor, repack


def _concat_qt(parts: list[QTensor]) -> QTensor:
    """Column-shard concat: layout-'t' qs planes stack on the N axis (-1),
    row-layout planes on axis 0; group-major scale/min planes
    [pack, G, npk_local] stack on the npk axis (-1)."""
    q0 = parts[0]
    cat = lambda xs, ax: None if xs[0] is None else np.concatenate(
        [np.asarray(x) for x in xs], axis=ax)
    return QTensor(
        q0.kind, q0.shape, q0.n_orig, q0.group,
        cat([p.qs for p in parts], -1 if q0.layout == "t" else 0),
        cat([p.scale for p in parts], -1),
        cat([p.min_ for p in parts], -1),
        q0.lut,
        q0.ggml_type, q0.layout, q0.parts,
    )


def repack_sharded(raw: np.ndarray, ggml_type: GGMLType, n: int, k: int,
                   shards: int, row_perm: np.ndarray | None = None) -> QTensor:
    """Column-parallel repack: split the N rows into `shards` equal parts,
    repack each locally, concatenate planes along axis 0. The returned
    QTensor's n_orig/shape describe ONE shard (it is only ever consumed
    inside shard_map where each device sees its local plane)."""
    if n % shards:
        raise ValueError(f"N={n} not divisible by tp={shards}")
    if ggml_type in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        row_bytes = type_size(ggml_type, k)
    else:
        blk, nbytes = GGML_BLOCK_SIZES[ggml_type]
        row_bytes = (k // blk) * nbytes
    rows = np.ascontiguousarray(raw).reshape(n, row_bytes)
    if row_perm is not None:
        rows = rows[row_perm]
    local = n // shards
    parts = [repack(np.ascontiguousarray(rows[t * local:(t + 1) * local]),
                    ggml_type, local, k) for t in range(shards)]
    return _concat_qt(parts)


def shard_qtensor_cols(qt: QTensor, shards: int) -> QTensor:
    """Row-parallel (contraction-dim) shard check: a NamedSharding on the K
    plane axis (axis -2 for layout 't' qs, -1 for 'rows'; G axis of scales)
    works directly as long as the scale-group boundary divides the shard
    width. Returns qt unchanged after validating; metadata stays global
    (each device's local K = K/shards)."""
    n, k = qt.shape
    if k % shards:
        raise ValueError(f"K={k} not divisible by tp={shards}")
    if qt.kind != "dense" and (k // shards) % qt.group:
        raise ValueError(f"K shard {k // shards} not divisible by group {qt.group}")
    return qt
