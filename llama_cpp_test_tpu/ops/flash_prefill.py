"""Chunked flash prefill attention over the paged KV cache.

The prefill-side fattn analogue (reference src/llama-graph.cpp:1160-1240
flash path `ggml_flash_attn_ext` :1191-1197, CUDA fattn-*.cuh): queries
attend to the sequence's cache pages streamed one page at a time with an
online softmax — no [B, S, KV, D] full-cache materialization (the round-1
prefill gathered the whole cache per layer, runtime/kv_cache.py:239-242,
capping usable context).

Semantics match kv_cache.attend_prefill exactly: token (b, t) attends cache
index s iff s <= positions[b,t], s < kv_len[b], and (window == 0 or
s > positions[b,t] - window); logits optionally soft-capped (gemma2).

Layout (matches runtime/kv_cache.KVPools):
  q:            [B, T, H, D]   (pre-scaled by the caller)
  k/v_pages:    [KV, NB, BS, D]
  positions:    [B, T] int32
  kv_len:       [B] int32
  page_indices: [B, NBmax] int32
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fp_kernel(lens_ref, pages_ref, pos_ref, q_ref, k_ref, v_ref, o_ref,
               m_scr, l_scr, acc_scr, *, bs: int, g: int, tt: int,
               window: int, soft_cap: float):
    """One (sequence b, kv head, q tile) x page chunk c.

    lens/pages: scalar-prefetch; pos_ref [B, TT] (full batch axis — a
    (1, TT) block is Mosaic-illegal for B > 1: sublane dim 1 is neither
    8-divisible nor the full axis); q_ref [1, 1, TT, G, D];
    k/v_ref [1, 1, BS, D]; o_ref [1, 1, TT, G, D];
    scratch m/l [TT*G, 128], acc [TT*G, D] f32 carried across pages.
    """
    b = pl.program_id(0)
    c = pl.program_id(3)
    n_chunks = pl.num_programs(3)
    rows = tt * g

    @pl.when(c == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lens_ref[b]
    pos_t = pos_ref[b]                                   # [TT]
    # per-row positions: row r = t*G + g_idx -> pos[t]. Built as a masked
    # sum over an iota expansion — NOT broadcast(tt, g).reshape(rows, 1),
    # whose minor-dim collapse (128x8 -> 1024x1 shape cast) the real Mosaic
    # backend rejects ("infer-vector-layout: unsupported shape cast"; the
    # CPU-side AOT lowering gate can't see backend layout passes).
    e_r = jax.lax.broadcasted_iota(jnp.int32, (rows, tt), 0) // g
    e_t = jax.lax.broadcasted_iota(jnp.int32, (rows, tt), 1)
    pos_b = jnp.broadcast_to(pos_t.reshape(1, tt), (rows, tt))
    pos_rows = jnp.sum(jnp.where(e_r == e_t, pos_b, 0), axis=1,
                       keepdims=True)                    # [rows, 1]
    chunk_lo = c * bs
    tile_max_pos = jnp.max(pos_t)

    @pl.when((chunk_lo < length) & (chunk_lo <= tile_max_pos))
    def _():
        q = q_ref[0, 0].astype(jnp.float32).reshape(rows, q_ref.shape[-1])
        k = k_ref[0, 0].astype(jnp.float32)              # [BS, D]
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if soft_cap > 0.0:
            s = jnp.tanh(s / soft_cap) * soft_cap
        sidx = chunk_lo + jax.lax.broadcasted_iota(jnp.int32, (rows, bs), 1)
        mask = (sidx <= pos_rows) & (sidx < length)
        if window > 0:
            mask = mask & (sidx > pos_rows - window)
        s = jnp.where(mask, s, -1e30)
        m_prev = m_scr[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        l_scr[:, 0:1] = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1,
                                                        keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, 0:1] = m_new

    @pl.when(c == n_chunks - 1)
    def _():
        denom = jnp.maximum(l_scr[:, 0:1], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / denom).reshape(
            tt, g, acc_scr.shape[-1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "soft_cap",
                                             "interpret"))
def flash_prefill(q: jax.Array, k_pages: jax.Array, v_pages: jax.Array,
                  positions: jax.Array, kv_len: jax.Array,
                  page_indices: jax.Array, *, window: int = 0,
                  soft_cap: float = 0.0,
                  interpret: bool = False) -> jax.Array:
    """Paged flash prefill. q [B, T, H, D] pre-scaled -> [B, T, H, D]."""
    b, t, h, d = q.shape
    kv, nb, bs, _ = k_pages.shape
    g = h // kv
    nbmax = page_indices.shape[1]
    tt = min(t, 128)
    if t % tt:
        raise ValueError(
            f"flash_prefill: T={t} must divide into {tt}-row tiles; pad T "
            "to a multiple of 128 (the engine's token buckets already are)")
    q5 = q.reshape(b, t, kv, g, d).transpose(0, 2, 1, 3, 4)  # [B, KV, T, G, D]

    grid = (b, kv, t // tt, nbmax)

    def q_map(bi, ki, ti, ci, lens, pages):
        return (bi, ki, ti, 0, 0)

    def kv_map(bi, ki, ti, ci, lens, pages):
        return (ki, pages[bi, ci], 0, 0)

    def pos_map(bi, ki, ti, ci, lens, pages):
        return (0, ti)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, tt), pos_map),
            pl.BlockSpec((1, 1, tt, g, d), q_map),
            pl.BlockSpec((1, 1, bs, d), kv_map),
            pl.BlockSpec((1, 1, bs, d), kv_map),
        ],
        out_specs=pl.BlockSpec((1, 1, tt, g, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((tt * g, 128), jnp.float32),
            pltpu.VMEM((tt * g, 128), jnp.float32),
            pltpu.VMEM((tt * g, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_fp_kernel, bs=bs, g=g, tt=tt,
                               window=window, soft_cap=soft_cap)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, t, g, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * d * t * nbmax * bs,
            bytes_accessed=2 * kv * nbmax * bs * d * b * 2 + q.size * 2,
            transcendentals=b * h * t * nbmax * bs,
        ),
    )(kv_len, page_indices, positions, q5, k_pages, v_pages)
    # out [B, KV, T, G, D] -> [B, T, H, D]
    return out.transpose(0, 2, 1, 3, 4).reshape(b, t, h, d)
