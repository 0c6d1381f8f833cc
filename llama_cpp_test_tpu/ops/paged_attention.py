"""Paged attention kernels (decode path).

The device half of the fork's blockKVAttentionPagedFwd
(reference tests/test_paged_attention.cpp:36-39, symbols in
test_apply_attention — SURVEY.md §2.9), rebuilt as TPU flash-decoding over
block tables: for each (sequence, kv head) the kernel walks the sequence's
physical pages in HBM, streams (block_size, head_dim) tiles to VMEM and
accumulates an online softmax. No materialized [B, S, KV, D] gather.

Two implementations:
  - `paged_attention_decode`: dispatches to the tuned Pallas kernel that
    ships with JAX (jax.experimental.pallas.ops.tpu.paged_attention) —
    the platform-provided primitive, like cuBLAS in the CUDA build.
  - `paged_attention_decode_xla`: pure-XLA reference used for conformance
    tests and non-TPU backends.

Expected layouts (match runtime/kv_cache.KVPools):
  q:        [B, H, D]  (pre-scaled by 1/sqrt(D) upstream)
  k_pages:  [KV, NB, BS, D]
  v_pages:  [KV, NB, BS, D]
  lengths:  [B] int32 tokens in cache per sequence
  page_indices: [B, NBmax] int32 physical block ids
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pages_per_compute_block(block_size: int, nbmax: int) -> int:
    # target ~512 kv positions per flash block, divisor of pages-per-seq
    target = max(1, 512 // block_size)
    ppcb = min(target, nbmax)
    while nbmax % ppcb:
        ppcb -= 1
    return ppcb


@functools.partial(jax.jit, static_argnames=("soft_cap",))
def paged_attention_decode(q: jax.Array, k_pages: jax.Array,
                           v_pages: jax.Array, lengths: jax.Array,
                           page_indices: jax.Array,
                           soft_cap: float | None = None) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.paged_attention import (
        paged_attention as _pa,
    )

    nbmax = page_indices.shape[1]
    bs = k_pages.shape[2]
    return _pa.paged_attention(
        q, k_pages, v_pages, lengths, page_indices,
        pages_per_compute_block=_pages_per_compute_block(bs, nbmax),
        attn_logits_soft_cap=soft_cap,
    )


def paged_attention_decode_xla(q: jax.Array, k_pages: jax.Array,
                               v_pages: jax.Array, lengths: jax.Array,
                               page_indices: jax.Array,
                               soft_cap: float | None = None) -> jax.Array:
    """Reference implementation: gather pages, masked softmax. q pre-scaled."""
    kv, nb, bs, d = k_pages.shape
    b, h = q.shape[0], q.shape[1]
    g = h // kv
    k = k_pages[:, page_indices]  # [KV, B, NBmax, BS, D]
    v = v_pages[:, page_indices]
    s = page_indices.shape[1] * bs
    k = k.reshape(kv, b, s, d)
    v = v.reshape(kv, b, s, d)
    qf = q.astype(jnp.float32).reshape(b, kv, g, d)
    logits = jnp.einsum("bkgd,kbsd->bkgs", qf, k.astype(jnp.float32))
    if soft_cap is not None:
        logits = jnp.tanh(logits / soft_cap) * soft_cap
    mask = jnp.arange(s)[None, :] < lengths[:, None]  # [B, S]
    logits = jnp.where(mask[:, None, None, :], logits, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgs,kbsd->bkgd", p, v.astype(jnp.float32))
    return out.reshape(b, h, d).astype(q.dtype)
