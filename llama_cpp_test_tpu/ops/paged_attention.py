"""Paged attention kernels (decode path).

The device half of the fork's blockKVAttentionPagedFwd
(reference tests/test_paged_attention.cpp:36-39, symbols in
test_apply_attention — SURVEY.md §2.9), rebuilt as TPU flash-decoding over
block tables: for each (sequence, kv head) the kernel walks the sequence's
physical pages in HBM, streams (block_size, head_dim) tiles to VMEM and
accumulates an online softmax. No materialized [B, S, KV, D] gather.

Two implementations:
  - `paged_attention_decode`: custom Pallas flash-decoding kernel — the
    block table is a scalar-prefetch operand, so each page's index_map
    resolves physical pages before the kernel body runs and tiles stream
    HBM->VMEM without a gather.
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


from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


import os

# pages streamed per grid step (overridable for A/B, tools/dbench.py): a
# Mosaic grid step costs ~0.4us regardless of bytes touched, so the round-3
# kernel's one-page steps made BATCHED decode grid-step-bound (B x NBmax
# steps ~= 18ms/token at B=64 over 22 layers). P pages per step cuts the
# step count AND the online-softmax update count P-fold. v5e sweep
# (KBENCH.md): B=64/512-token caches 20.5 -> 3.1 ms/tok at block_size 32 x
# P=16; the residual cost is MXU passes over KV tiles at G(=8) query rows,
# not grid steps.
PAGES_PER_STEP = int(os.environ.get("LLAMA_TPU_PA_PAGES", "16"))


def _pa_kernel(lengths_ref, pages_ref, *refs, bs: int, kv: int,
               soft_cap: float | None, p_pages: int, quantized: bool):
    """Flash-decoding: one grid step = P pages of one sequence, ALL kv heads.

    Grid is (B, NBmax/P). The P (kv, 1, bs, d) page tiles (each its own
    scalar-prefetch-indexed input) are concatenated in VMEM into one
    [KV, P*BS, D] key/value tile so the whole step rides ONE dot + ONE
    online-softmax update (the round-1/2 kernel iterated kv heads in the
    grid as well — batching those cut steps 4x; this cuts another P).

    quantized: pages are int8 with per-slot f32 scales (q8_0 KV, the
    type_k/type_v analogue — reference quantized-KV flash kernels,
    ggml-cuda/fattn-vec-f16.cuh); dequant is a convert + scale
    lane-broadcast multiply on the in-flight tile, so quantized KV rides
    the SAME flash-decoding path at half the HBM bytes.

    refs: q [1, KV, G, D]; k_0..k_{P-1}, v_0..v_{P-1} [KV, 1, BS, D]
    (+ ks_0.., vs_0.. [KV, 1, BS] when quantized);
    o [1, KV, G, D]; scratch m/l [KV, G, 128] f32, acc [KV, G, D] f32.
    """
    q_ref = refs[0]
    k_refs = refs[1:1 + p_pages]
    v_refs = refs[1 + p_pages:1 + 2 * p_pages]
    i = 1 + 2 * p_pages
    ks_refs = vs_refs = None
    if quantized:
        ks_refs = refs[i:i + p_pages]
        vs_refs = refs[i + p_pages:i + 2 * p_pages]
        i += 2 * p_pages
    o_ref = refs[i]
    m_scr, l_scr, acc_scr = refs[i + 1:i + 4]
    b = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    length = lengths_ref[b]

    @pl.when(c == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(c * (p_pages * bs) < length)
    def _():
        q = q_ref[0].astype(jnp.float32)               # [KV, G, D]

        def tile(prefs, srefs):
            if p_pages == 1:
                t = prefs[0][:, 0].astype(jnp.float32)     # [KV, BS, D]
            else:
                t = jnp.concatenate([r[:, 0] for r in prefs], axis=1) \
                    .astype(jnp.float32)                   # [KV, P*BS, D]
            if srefs is not None:
                # scale blocks are [1, KV, BS] (page-major layout)
                s = srefs[0][0] if p_pages == 1 else \
                    jnp.concatenate([r[0] for r in srefs], axis=1)
                t = t * s[:, :, None]                      # [KV, P*BS, 1]
            return t

        k = tile(k_refs, ks_refs)
        v = tile(v_refs, vs_refs)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [KV, G, P*BS]
        if soft_cap is not None:
            s = jnp.tanh(s / soft_cap) * soft_cap
        pos = c * (p_pages * bs) + \
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(pos < length, s, -1e30)
        m_prev = m_scr[:, :, 0:1]                      # [KV, G, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                         # [KV, G, P*BS]
        l_new = l_scr[:, :, 0:1] * alpha + jnp.sum(p, axis=2, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [KV, G, D]
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(c == n_chunks - 1)
    def _():
        denom = jnp.maximum(l_scr[:, :, 0:1], 1e-30)
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("soft_cap", "interpret",
                                             "pages_per_step"))
def paged_attention_decode(q: jax.Array, k_pages: jax.Array,
                           v_pages: jax.Array, lengths: jax.Array,
                           page_indices: jax.Array,
                           soft_cap: float | None = None,
                           interpret: bool = False,
                           pages_per_step: int | None = None,
                           k_scale: jax.Array | None = None,
                           v_scale: jax.Array | None = None) -> jax.Array:
    """Pallas paged flash-decoding.

    q: [B, H, D] pre-scaled; k/v_pages: [KV, NB, BS, D] (bf16, or int8 with
    k_scale/v_scale [KV, NB, BS] f32 for q8_0 KV); lengths [B];
    page_indices [B, NBmax]. Returns [B, H, D].
    """
    b, h, d = q.shape
    kv, nb, bs, _ = k_pages.shape
    g = h // kv
    nbmax = page_indices.shape[1]
    q4 = q.reshape(b, kv, g, d)
    quantized = k_scale is not None

    p_pages = pages_per_step or PAGES_PER_STEP
    p_pages = max(1, min(p_pages, nbmax))
    pad = -nbmax % p_pages
    if pad:
        # pad with page 0 (always physically valid); masked by `lengths`
        page_indices = jnp.concatenate(
            [page_indices,
             jnp.zeros((b, pad), page_indices.dtype)], axis=1)
    grid = (b, (nbmax + pad) // p_pages)

    def q_map(bi, ci, lens, pages):
        return (bi, 0, 0, 0)

    def kv_map_at(i):
        def kv_map(bi, ci, lens, pages):
            return (0, pages[bi, ci * p_pages + i], 0, 0)
        return kv_map

    page_spec = lambda i: pl.BlockSpec((kv, 1, bs, d), kv_map_at(i))

    def scale_map_at(i):
        def scale_map(bi, ci, lens, pages):
            return (pages[bi, ci * p_pages + i], 0, 0)
        return scale_map

    # scales ride page-major [NB, KV, BS] so the (1, kv, bs) block's last
    # two dims equal the array dims (Mosaic's tiling rule; a (kv, 1, bs)
    # block of the pool-shaped [KV, NB, BS] layout is rejected)
    scale_spec = lambda i: pl.BlockSpec((1, kv, bs), scale_map_at(i))
    in_specs = ([pl.BlockSpec((1, kv, g, d), q_map)]
                + [page_spec(i) for i in range(p_pages)]
                + [page_spec(i) for i in range(p_pages)])
    args = [lengths, page_indices, q4,
            *([k_pages] * p_pages), *([v_pages] * p_pages)]
    if quantized:
        ks_t = k_scale.transpose(1, 0, 2)
        vs_t = v_scale.transpose(1, 0, 2)
        in_specs += [scale_spec(i) for i in range(p_pages)]
        in_specs += [scale_spec(i) for i in range(p_pages)]
        args += [*([ks_t] * p_pages), *([vs_t] * p_pages)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kv, g, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((kv, g, 128), jnp.float32),
            pltpu.VMEM((kv, g, 128), jnp.float32),
            pltpu.VMEM((kv, g, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_pa_kernel, bs=bs, kv=kv, soft_cap=soft_cap,
                               p_pages=p_pages, quantized=quantized)
    kv_bytes = 1 if quantized else 2
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kv, g, d),
                                       jnp.bfloat16 if quantized else
                                       q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * d * nbmax * bs,
            bytes_accessed=2 * kv * nbmax * bs * d * b * kv_bytes,
            transcendentals=b * h * nbmax * bs,
        ),
    )(*args)
    return out.reshape(b, h, d)


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
