"""Device-side paged KV cache: HBM block pools + write/attend ops.

The data plane of the paged cache (BlockKVCache's K/V pools,
reference tests/test_block_kv_cache.cpp:20-118, re-designed for TPU):

  k_pools / v_pools: per-layer [n_kv_heads, num_blocks, block_size, head_dim]
  bf16 arrays living in HBM, laid out so the decode paged-attention kernel
  streams whole (block_size, head_dim) pages per kv head — lane-aligned
  (block_size >= 16 keeps bf16 (16,128) tiling).

Writes are slot-mapping scatters (writeToCache analogue): slot id =
block * block_size + offset, -1 drops (padding). Donated through the jitted
step so XLA updates the pools in place.

Attention paths:
  - decode (T==1): Pallas paged attention over the block table
    (ops/paged_attention.py) on TPU; XLA gather reference elsewhere.
  - prefill: gather-based attention over the sequence's pages (works for
    chunked prefill with a cached prefix too).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..models.hparams import HParams
from ..ops import layers
from ..ops.paged_attention import paged_attention_decode


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVPools:
    """Pytree of per-layer KV pools.

    k/v: lists of [n_kv_heads, num_blocks, block_size, head_dim] bf16 —
    or int8 when quantized (the type_k/type_v analogue, reference
    llama.h:338-339), with per-slot-per-head f32 scales in k_scale/v_scale
    ([n_kv_heads, num_blocks, block_size], q8_0-style absmax/127 scaling).
    """
    k: list[jax.Array]
    v: list[jax.Array]
    k_scale: list[jax.Array] | None = None
    v_scale: list[jax.Array] | None = None

    @property
    def num_blocks(self) -> int:
        return self.k[0].shape[1]

    @property
    def block_size(self) -> int:
        return self.k[0].shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def new_kv_pools(hp: HParams, num_blocks: int, block_size: int = 32,
                 dtype=jnp.bfloat16, kv_type: str = "bf16") -> KVPools:
    # per-layer kv head counts (openelm/deci); deci's attention-free and
    # linear-attention layers get a minimal 1-head pool that is never
    # written (their layer forward skips attend entirely)
    shapes = [(max(hp.n_head_kv_of(li), 1), num_blocks, block_size,
               hp.head_dim) for li in range(hp.n_layer)]
    if kv_type == "q8_0":
        k = [jnp.zeros(s, jnp.int8) for s in shapes]
        v = [jnp.zeros(s, jnp.int8) for s in shapes]
        ks = [jnp.zeros(s[:3], jnp.float32) for s in shapes]
        vs = [jnp.zeros(s[:3], jnp.float32) for s in shapes]
        return KVPools(k, v, ks, vs)
    if kv_type not in ("bf16", "f16"):
        raise ValueError(f"kv_type {kv_type!r} (supported: bf16, f16, q8_0)")
    dt = jnp.float16 if kv_type == "f16" else dtype
    k = [jnp.zeros(s, dt) for s in shapes]
    v = [jnp.zeros(s, dt) for s in shapes]
    return KVPools(k, v)


def kv_bytes_per_token(hp: HParams, dtype_bytes: int = 2) -> int:
    return 2 * sum(max(hp.n_head_kv_of(li), 1)
                   for li in range(hp.n_layer)) * hp.head_dim * dtype_bytes


def quantize_q8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x [..., D] -> (int8 [..., D], scale [...]) with absmax/127 scaling.

    DELIBERATELY coarser than the reference q8_0 KV type (one scale per
    32-element group, ggml type_k/type_v): one scale per (head, token)
    slot, i.e. per head_dim values. The per-slot scale keeps the scale
    plane [KV, NB, BS] Mosaic-legal (page-major, no ragged last dim) and
    halves the scatter count on the write path. Measured cost vs 32-groups
    at D=128: RMSE 0.0065 vs 0.0054 (gaussian), 0.0126 vs 0.0095
    (laplace) — ~1.2-1.3x, both ~40+ dB SNR; TinyLlama decode token
    streams were identical vs bf16 KV in tests/test_kv_q8.py."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale[..., None],
                                                      1e-12))
    return q.astype(jnp.int8), scale


def write_kv_q8(pool: jax.Array, pool_scale: jax.Array, new: jax.Array,
                slots: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Quantizing scatter: new [B, T, KV, D] bf16 -> int8 pool + scales."""
    kv, nb, bs, d = pool.shape
    q, scale = quantize_q8(new)                       # [B,T,KV,D], [B,T,KV]
    flat = pool.reshape(kv, nb * bs, d)
    sflat = pool_scale.reshape(kv, nb * bs)
    s = slots.reshape(-1)
    vals = q.reshape(-1, kv, d).swapaxes(0, 1)
    svals = scale.reshape(-1, kv).swapaxes(0, 1)
    flat = flat.at[:, s].set(vals, mode="drop", unique_indices=True)
    sflat = sflat.at[:, s].set(svals, mode="drop", unique_indices=True)
    return flat.reshape(kv, nb, bs, d), sflat.reshape(kv, nb, bs)


def gather_kv_q8(pool: jax.Array, pool_scale: jax.Array,
                 block_table: jax.Array) -> jax.Array:
    """Dequantizing gather -> [B, S, KV, D] bf16."""
    kv, nb, bs, d = pool.shape
    pages = pool[:, block_table].astype(jnp.float32)   # [KV, B, NBmax, BS, D]
    scales = pool_scale[:, block_table]                # [KV, B, NBmax, BS]
    deq = pages * scales[..., None]
    b = block_table.shape[0]
    return deq.reshape(kv, b, -1, d).transpose(1, 2, 0, 3).astype(jnp.bfloat16)


def write_kv(pool: jax.Array, new: jax.Array, slots: jax.Array) -> jax.Array:
    """Scatter new KV into the pool.

    pool: [KV, NB, BS, D]; new: [B, T, KV, D]; slots: [B, T] int32 global slot
    ids (-1 = drop). Returns updated pool.
    """
    kv, nb, bs, d = pool.shape
    flat = pool.reshape(kv, nb * bs, d)
    s = slots.reshape(-1)
    vals = new.reshape(-1, kv, d).swapaxes(0, 1)  # [KV, B*T, D]
    flat = flat.at[:, s].set(vals.astype(pool.dtype), mode="drop",
                             unique_indices=True)
    return flat.reshape(kv, nb, bs, d)


def gather_kv(pool: jax.Array, block_table: jax.Array) -> jax.Array:
    """pool [KV, NB, BS, D] + table [B, NBmax] -> [B, S=NBmax*BS, KV, D]."""
    kv, nb, bs, d = pool.shape
    b, nbmax = block_table.shape
    pages = pool[:, block_table]              # [KV, B, NBmax, BS, D]
    return pages.reshape(kv, b, nbmax * bs, d).transpose(1, 2, 0, 3)


def copy_blocks(pool: jax.Array, src: jax.Array, dst: jax.Array) -> jax.Array:
    """COW resolution: pool[:, dst] = pool[:, src] (copyBlocks analogue).
    src/dst: [n_copies] int32 (-1 entries drop)."""
    pages = pool[:, src]
    return pool.at[:, dst].set(pages, mode="drop")


@jax.jit
def gather_block(pools: KVPools, blk) -> tuple:
    """One physical block across all layers -> stacked arrays for host swap
    (swapBlocks swap-out, reference tests/test_block_kv_cache.cpp:20-118).
    Returns (k [L, KV, BS, D], v [L, KV, BS, D][, k_scale, v_scale])."""
    k = jnp.stack([p[:, blk] for p in pools.k])
    v = jnp.stack([p[:, blk] for p in pools.v])
    if not pools.quantized:
        return k, v
    ks = jnp.stack([p[:, blk] for p in pools.k_scale])
    vs = jnp.stack([p[:, blk] for p in pools.v_scale])
    return k, v, ks, vs


@partial(jax.jit, donate_argnums=(0,))
def scatter_block(pools: KVPools, data: tuple, blk) -> KVPools:
    """Swap-in: write a gather_block payload into physical block blk."""
    k = [p.at[:, blk].set(data[0][li]) for li, p in enumerate(pools.k)]
    v = [p.at[:, blk].set(data[1][li]) for li, p in enumerate(pools.v)]
    if not pools.quantized:
        return KVPools(k, v)
    ks = [p.at[:, blk].set(data[2][li]) for li, p in enumerate(pools.k_scale)]
    vs = [p.at[:, blk].set(data[3][li]) for li, p in enumerate(pools.v_scale)]
    return KVPools(k, v, ks, vs)


@partial(jax.jit, donate_argnums=(0,))
def apply_copies(pools: KVPools, src: jax.Array, dst: jax.Array) -> KVPools:
    k = [copy_blocks(p, src, dst) for p in pools.k]
    v = [copy_blocks(p, src, dst) for p in pools.v]
    if not pools.quantized:
        return KVPools(k, v)
    ks = [copy_blocks(p, src, dst) for p in pools.k_scale]
    vs = [copy_blocks(p, src, dst) for p in pools.v_scale]
    return KVPools(k, v, ks, vs)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("hp",))
def apply_shift(pools: KVPools, src: jax.Array, dst: jax.Array,
                delta: jax.Array, inv_freq: jax.Array,
                mscale: float, inv_freq_swa: jax.Array | None = None,
                *, hp: HParams | None = None) -> KVPools:
    """Move cached tokens between slots, re-rotating K by a per-token
    position delta — the K-shift graph analogue (reference
    llama-context.cpp:719-755 kv_self_update: ggml_rope on k_l rows after
    llama_kv_self_seq_add). Powers context shift (llama-cli
    main.cpp:583-608) and Self-Extend grouped positions
    (passkey.cpp:131-137 seq_add+seq_div).

    src/dst/delta: [n] int32 slot ids and rope deltas; -1 in dst drops the
    write (and makes the matching src a don't-care). RoPE rotations are
    additive, so rotating the stored (already-roped) K by delta re-bases it
    to position p+delta exactly. V moves without rotation.

    inv_freq_swa + hp: per-layer table selection for archs whose
    sliding-window layers use a different rope base (gemma3).
    """
    from ..models import hparams as _hparams

    kv, nb, bs, d = pools.k[0].shape
    new_k, new_v = [], []
    new_ks, new_vs = [], []
    n_layer = len(pools.k)
    for li in range(n_layer):
        k_pool, v_pool = pools.k[li], pools.v[li]
        kflat = k_pool.reshape(kv, nb * bs, d)
        vflat = v_pool.reshape(kv, nb * bs, d)
        kg = kflat[:, src].astype(jnp.float32)           # [KV, n, D]
        if pools.quantized:
            ksflat = pools.k_scale[li].reshape(kv, nb * bs)
            vsflat = pools.v_scale[li].reshape(kv, nb * bs)
            kg = kg * ksflat[:, src, None]               # dequantize
        kg = kg.transpose(1, 0, 2)[None]                 # [1, n, KV, D]
        ifr = inv_freq
        if inv_freq_swa is not None and hp is not None and \
                _hparams.layer_window(hp, li) > 0:
            ifr = inv_freq_swa
        # delta rotation is UNSCALED: stored K already carries mscale from
        # the original rope, and R(delta)·(mscale·R(p)k) = mscale·R(p+d)k
        # exactly. (The reference passes yarn_attn_factor into its shift
        # rope, build_rope_shift llama-context.cpp:484-493, re-scaling
        # shifted K by mscale each shift — a known approximation this
        # engine's shift-exactness tests would reject for attn_factor != 1,
        # e.g. phi3-longrope.)
        if hp is not None and hp.nope_global and \
                _hparams.layer_window(hp, li) == 0:
            # cohere2 global layer: K carries no positional signal, so a
            # shift is a pure move (no re-rotation)
            pass
        else:
            kg = layers.apply_rope(kg, delta[None], ifr, 1.0)
        kg = kg[0].transpose(1, 0, 2)
        if pools.quantized:
            kq, ksc = quantize_q8(kg)                    # requantize K
            kflat = kflat.at[:, dst].set(kq, mode="drop")
            ksflat = ksflat.at[:, dst].set(ksc, mode="drop")
            vsflat = vsflat.at[:, dst].set(vsflat[:, src], mode="drop")
            new_ks.append(ksflat.reshape(kv, nb, bs))
            new_vs.append(vsflat.reshape(kv, nb, bs))
        else:
            kflat = kflat.at[:, dst].set(kg.astype(k_pool.dtype),
                                         mode="drop")
        vflat = vflat.at[:, dst].set(vflat[:, src], mode="drop")
        new_k.append(kflat.reshape(kv, nb, bs, d))
        new_v.append(vflat.reshape(kv, nb, bs, d))
    if pools.quantized:
        return KVPools(new_k, new_v, new_ks, new_vs)
    return KVPools(new_k, new_v)


# ---------------------------------------------------------------------------
# attention over the paged cache


def attend_gathered(q: jax.Array, k: jax.Array, v: jax.Array,
                    positions: jax.Array, kv_len: jax.Array, scale: float,
                    window: int = 0, soft_cap: float = 0.0,
                    alibi: jax.Array | None = None,
                    alibi_sym_pos: jax.Array | None = None) -> jax.Array:
    """Masked attention over already-gathered KV [B, S, KV, D]."""
    s = k.shape[1]
    sidx = jnp.arange(s)[None, None, :]                  # [1, 1, S]
    mask = sidx <= positions[:, :, None]                 # causal
    mask = mask & (sidx < kv_len[:, None, None])
    if window > 0:
        mask = mask & (sidx > positions[:, :, None] - window)
    return layers.attention(q, k, v, mask, scale, softcap=soft_cap,
                            alibi=alibi, alibi_sym_pos=alibi_sym_pos)


def attend_prefill_xla(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                       block_table: jax.Array, positions: jax.Array,
                       kv_len: jax.Array, scale: float,
                       window: int = 0, soft_cap: float = 0.0,
                       alibi: jax.Array | None = None,
                       alibi_sym_pos: jax.Array | None = None) -> jax.Array:
    """Reference prefill attention: full-cache gather + masked softmax."""
    k = gather_kv(k_pool, block_table)  # [B, S, KV, D]
    v = gather_kv(v_pool, block_table)
    return attend_gathered(q, k, v, positions, kv_len, scale, window,
                           soft_cap, alibi=alibi,
                           alibi_sym_pos=alibi_sym_pos)


def attend_prefill(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                   block_table: jax.Array, positions: jax.Array,
                   kv_len: jax.Array, scale: float,
                   window: int = 0, soft_cap: float = 0.0,
                   alibi: jax.Array | None = None,
                   alibi_sym_pos: jax.Array | None = None) -> jax.Array:
    """Attention for a prefill chunk whose KV (incl. any cached prefix) is
    already written to the pools.

    q: [B, T, H, D]; positions: [B, T] absolute positions of the chunk;
    kv_len: [B] total tokens now in cache. Token (b, t) attends to cache
    indices <= positions[b, t] (cache index == sequence position since block
    tables are ordered).

    Dispatch: Pallas chunked-flash kernel on TPU (streams pages, O(page)
    memory — ops/flash_prefill.py); XLA full-gather reference elsewhere.
    """
    if jax.default_backend() != "tpu" or alibi is not None:
        # ALiBi archs ride the XLA path: the Pallas flash kernel has no
        # position-bias input (still jitted/fused, just not paged-flash)
        return attend_prefill_xla(q, k_pool, v_pool, block_table, positions,
                                  kv_len, scale, window, soft_cap,
                                  alibi=alibi, alibi_sym_pos=alibi_sym_pos)
    from ..ops.flash_prefill import flash_prefill

    return flash_prefill(
        (q.astype(jnp.float32) * scale).astype(q.dtype), k_pool, v_pool,
        positions, kv_len, block_table, window=window,
        soft_cap=soft_cap).astype(q.dtype)


def attend_decode_xla(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                      block_table: jax.Array, kv_len: jax.Array,
                      scale: float, window: int = 0,
                      soft_cap: float = 0.0,
                      alibi: jax.Array | None = None) -> jax.Array:
    """Reference decode path (T==1 per sequence) via gather + masked softmax."""
    positions = (kv_len - 1)[:, None]
    return attend_prefill_xla(q, k_pool, v_pool, block_table, positions,
                              kv_len, scale, window, soft_cap, alibi=alibi)


def attend_decode(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                  block_table: jax.Array, kv_len: jax.Array,
                  scale: float, window: int = 0,
                  soft_cap: float = 0.0,
                  alibi: jax.Array | None = None) -> jax.Array:
    """Decode attention dispatch: Pallas paged kernel on TPU, XLA elsewhere.

    q: [B, 1, H, D] -> [B, 1, H, D].
    """
    if jax.default_backend() != "tpu" or window > 0 or alibi is not None:
        return attend_decode_xla(q, k_pool, v_pool, block_table, kv_len,
                                 scale, window, soft_cap, alibi=alibi)
    b = q.shape[0]
    nbmax = block_table.shape[1]
    bs = k_pool.shape[2]
    if b >= 32 and nbmax * bs <= 256:
        # large batch x short caches: one fused XLA gather+softmax beats
        # the paged kernel's per-(seq, chunk) grid floor (v5e measured:
        # 0.87 vs 1.48 ms/step at B=64, 100-token caches — KBENCH.md);
        # the gather's scratch traffic scales with the PADDED cache
        # (nbmax*bs), so this only fires when that bound is small
        positions = (kv_len - 1)[:, None]
        k = gather_kv(k_pool, block_table)
        v = gather_kv(v_pool, block_table)
        return attend_gathered(q, k, v, positions, kv_len, scale, window,
                               soft_cap)
    out = paged_attention_decode(
        (q[:, 0] * scale).astype(q.dtype), k_pool, v_pool, kv_len, block_table,
        soft_cap=soft_cap if soft_cap > 0 else None)
    return out[:, None].astype(q.dtype)


def attend_decode_q8(q: jax.Array, k_pool: jax.Array, k_scale: jax.Array,
                     v_pool: jax.Array, v_scale: jax.Array,
                     block_table: jax.Array, kv_len: jax.Array,
                     scale: float, window: int = 0,
                     soft_cap: float = 0.0) -> jax.Array:
    """Decode attention over q8_0-quantized pools: the Pallas flash kernel
    dequantizes int8 pages in-VMEM (half the HBM bytes of bf16 KV) on TPU;
    gather + masked softmax elsewhere. q: [B, 1, H, D] -> [B, 1, H, D]."""
    if jax.default_backend() != "tpu" or window > 0:
        k = gather_kv_q8(k_pool, k_scale, block_table)
        v = gather_kv_q8(v_pool, v_scale, block_table)
        pos = (kv_len - 1)[:, None]
        return attend_gathered(q, k, v, pos, kv_len, scale, window, soft_cap)
    out = paged_attention_decode(
        (q[:, 0].astype(jnp.float32) * scale).astype(jnp.bfloat16),
        k_pool, v_pool, kv_len, block_table,
        soft_cap=soft_cap if soft_cap > 0 else None,
        k_scale=k_scale, v_scale=v_scale)
    return out[:, None].astype(q.dtype)
