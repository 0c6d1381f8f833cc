"""Fused dequant-matmul: y[M, N] = x[M, K] @ dequant(W)[N, K]^T.

The TPU-native analogue of ggml-cuda's mmq.cu (prefill tiles) and mmvq.cu
(decode matvec): weights stay in their packed layout-'t' planes in HBM
(quant/repack.py — K on sublanes, N on lanes, bf16 group scales); each kernel
tile unpacks nibbles/crumbs with VPU bit ops, expands per-group scales with a
SUBLANE broadcast (free relayout, unlike the lane-axis repeat the round-1
row-major layout forced through an MXU expansion matmul), and feeds bf16
tiles to the MXU. The affine minimum is never expanded per-element: it folds
into xsum @ min — the bsums trick of ggml_vec_dot_q4_K_q8_K (reference
ggml/src/ggml-cpu/ggml-cpu-quants.c:6511).

One kernel serves both regimes:
  decode  (M<=8, padded to one sublane tile) — bandwidth-bound; the kernel's
          job is to stream packed bytes at HBM speed.
  prefill (large M tiles) — MXU-bound; dequant cost amortizes over M rows.

Two paths:
  qmm_xla — pure-XLA reference (dequantize planes inside jit; XLA fuses).
            Works on CPU; golden for conformance tests; used when Pallas
            is unavailable.
  qmm     — Pallas fused kernel (grid over M x N x K tiles, K innermost,
            accumulating into the output tile).

Fused projections (wqkv / gate|up) are plane concatenations
(repack.fuse_qtensors); `qmm_split` slices the per-constituent outputs.
"""
from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.repack import QTensor

_BITS = {"u4": 4, "u2": 2, "u4lut": 4, "u2lut": 2}

# Dequant pipeline variant (v5e A/B, tools/dbench.py; see KBENCH.md):
#   f32  — round-3 pipeline: int32 unpack -> f32 convert -> f32 scale mul
#          -> bf16 cast.
#   bf16 — int32 unpack -> direct bf16 convert -> bf16 scale mul. For
#          q <= 31 the convert is exact and the single bf16 product rounds
#          identically to the f32 pipeline — bit-identical output, one
#          fewer VPU pass per element.
# (A third variant — int16 unpack + (q<<3)|0x4180 bitcast building
# bf16(16+q) with NO convert, offset folded into the bsums term — was
# built and rejected: its offset products round at the (16+q)*s magnitude
# (~2% weight noise on 4-bit formats), and this backend's Mosaic rejects
# int16 bit ops anyway.)
QMM_VARIANT = os.environ.get("LLAMA_TPU_QMM_VARIANT", "f32")


def _unpack(qs32: jax.Array, kind: str, h: int) -> jax.Array:
    """Extract sub-value h from an int32-cast packed plane.

    The TOP sub-value needs no mask (uint8 sources are < 256, so the shift
    already isolates it) — one VPU pass saved per tile on the hottest path.
    """
    if kind == "int8":
        return qs32
    bits = _BITS[kind]
    pack = 8 // bits
    if h == pack - 1:
        return qs32 >> (bits * h)
    if h == 0:
        return qs32 & ((1 << bits) - 1)
    return (qs32 >> (bits * h)) & ((1 << bits) - 1)


# ---------------------------------------------------------------------------
# XLA reference path (layout 't')


def _dequant_t(qs, scale, min_, lut, *, kind, group, dtype=jnp.bfloat16):
    """Planes -> dense [K, N] (cols h-major: n = h*NPK + j), matching the
    numpy reference repack.dequantize_qtensor_np (transposed)."""
    if kind == "dense":
        return qs.astype(dtype)
    pack = {"int8": 1, "u4": 2, "u2": 4, "u4lut": 2, "u2lut": 4}[kind]
    q32 = qs.astype(jnp.int32)
    parts = [_unpack(q32, kind, h) for h in range(pack)]
    q = jnp.concatenate(parts, axis=1) if pack > 1 else parts[0]  # [K, N]
    if kind in ("u4lut", "u2lut"):
        qf = jnp.zeros(q.shape, jnp.float32)
        for i in range(lut.shape[0]):
            qf = jnp.where(q == i, lut[i], qf)
    else:
        qf = q.astype(jnp.float32)
    # scale [pack, G, NPK] -> [G, N] h-major cols -> repeat along K
    s = jnp.concatenate([scale[h] for h in range(pack)], axis=-1) \
        if pack > 1 else scale[0]
    w = qf * jnp.repeat(s.astype(jnp.float32), group, axis=0)
    if min_ is not None:
        m = jnp.concatenate([min_[h] for h in range(pack)], axis=-1) \
            if pack > 1 else min_[0]
        w = w - jnp.repeat(m.astype(jnp.float32), group, axis=0)
    return w.astype(dtype)


def dequantize_xla(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Decode layout-'t' planes -> dense [K, N] inside jit."""
    assert qt.layout == "t", "dequantize_xla expects layout 't'"
    return _dequant_t(
        jnp.asarray(qt.qs),
        None if qt.scale is None else jnp.asarray(qt.scale),
        None if qt.min_ is None else jnp.asarray(qt.min_),
        None if qt.lut is None else jnp.asarray(qt.lut, jnp.float32),
        kind=qt.kind, group=qt.group, dtype=dtype,
    )


@functools.partial(jax.jit, static_argnames=("kind", "group", "n_orig"))
def _qmm_xla_t(x, qs, scale, min_, lut, *, kind, group, n_orig):
    w = _dequant_t(qs, scale, min_, lut, kind=kind, group=group)
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y[..., :n_orig]


def qmm_xla(x: jax.Array, qt: QTensor, out_dtype=jnp.float32) -> jax.Array:
    """XLA dequant-matmul reference: x [..., K] -> [..., n_orig]."""
    assert qt.layout == "t", "qmm_xla expects layout 't'"
    y = _qmm_xla_t(
        x, jnp.asarray(qt.qs),
        None if qt.scale is None else jnp.asarray(qt.scale),
        None if qt.min_ is None else jnp.asarray(qt.min_),
        None if qt.lut is None else jnp.asarray(qt.lut, jnp.float32),
        kind=qt.kind, group=qt.group, n_orig=qt.n_orig,
    )
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernel (layout 't')


def _qmm_t_kernel(x_ref, qs_ref, scale_ref, min_ref, lut_ref, member_ref,
                  o_ref, *, kind: str, group: int, pack: int, n_lut: int,
                  variant: str):
    """One (tm, tk) x (tk, tnp) -> (tm, pack, tnp) tile, accumulated over the
    K grid dimension (innermost).

    refs:
      x_ref      [tm, tk]         bf16 activations
      qs_ref     [tk, tnp]        uint8/int8 packed plane
      scale_ref  [pack, tg, tnp]  bf16 (group g scales rows [g*group, ...))
      min_ref    [pack, tg, tnp]  bf16 (or None)
      lut_ref    [1, n_lut]       f32 (or None)
      member_ref [tk, tg]         bf16 0/1 group membership (or None) — a
                 CONSTANT input rather than an in-kernel iota build: the
                 round-3 kernel rebuilt it every grid step (2 iotas +
                 compare + convert ~= 1 VPU pass per qs byte); as an input
                 it streams once and Mosaic's revolving buffers keep it
                 resident across the K grid. (A host-side xsum input is
                 still impossible: a (tm, tg) block's lane dim tg isn't
                 128-divisible.)
      o_ref      [tm, pack, tnp]  f32
    """
    kk = pl.program_id(2)
    x = x_ref[...]
    tk, tnp = qs_ref.shape
    tg = tk // group
    xsum = None
    if member_ref is not None:
        # per-group activation sums for the affine fold (bsums trick of
        # ggml_vec_dot_q4_K_q8_K, reference ggml-cpu-quants.c:6511)
        xsum = jax.lax.dot_general(x, member_ref[...],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    pipe_s = 0
    if variant == "pipe" and kind not in ("u4lut", "u2lut"):
        for s in (4, 2):   # sub-chunk count: scale slices stay 8-aligned
            if tk % (s * group) == 0 and (tg // s) % 8 == 0:
                pipe_s = s
                break
    if pipe_s:
        # software-pipelined emission: split the K tile into 4 sub-chunks
        # and emit the NEXT chunk's VPU dequant before the CURRENT
        # chunk's MXU dot. The chains are independent, so Mosaic's
        # scheduler can overlap the vector dequant with the matrix dots
        # instead of serializing them (the measured 52%-of-peak prefill
        # ceiling of the serialized kernel, KBENCH.md round-5 prefill)
        S = pipe_s
        ch = tk // S
        cg = tg // S

        def dq(c, h):
            qc = qs_ref[c * ch:(c + 1) * ch, :]
            q = qc.astype(jnp.int32) if kind == "int8" \
                else _unpack(qc.astype(jnp.int32), kind, h)
            s = scale_ref[h, c * cg:(c + 1) * cg, :]          # bf16
            s_exp = jnp.broadcast_to(
                s[:, None, :], (cg, group, tnp)).reshape(ch, tnp)
            return q.astype(jnp.bfloat16) * s_exp

        units = [(c, h) for c in range(S) for h in range(pack)]
        w = dq(*units[0])
        accs = [None] * pack
        for i, (c, h) in enumerate(units):
            w_next = dq(*units[i + 1]) if i + 1 < len(units) else None
            part = jax.lax.dot_general(
                x[:, c * ch:(c + 1) * ch], w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            accs[h] = part if accs[h] is None else accs[h] + part
            w = w_next
        for h in range(pack):
            if min_ref is not None:
                accs[h] = accs[h] - jax.lax.dot_general(
                    xsum, min_ref[h].astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        update = jnp.stack(accs, axis=1)

        @pl.when(kk == 0)
        def _():
            o_ref[...] = update

        @pl.when(kk != 0)
        def _():
            o_ref[...] = o_ref[...] + update
        return
    qs32 = None
    if kind != "int8":
        qs32 = qs_ref[...].astype(jnp.int32)
    accs = []
    for h in range(pack):
        q = qs_ref[...].astype(jnp.int32) if kind == "int8" \
            else _unpack(qs32, kind, h)
        if variant == "bf16" and kind not in ("u4lut", "u2lut"):
            # direct int->bf16 convert + bf16 scale mul: bit-identical to
            # the f32 pipeline (exact operands, one rounding) with one
            # fewer VPU pass per element
            s = scale_ref[h]                                  # bf16
            s_exp = jnp.broadcast_to(
                s[:, None, :], (tg, group, tnp)).reshape(tk, tnp)
            w = q.astype(jnp.bfloat16) * s_exp
        else:
            if kind in ("u4lut", "u2lut"):
                qf = jnp.zeros(q.shape, jnp.float32)
                for i in range(n_lut):
                    qf = jnp.where(q == i, lut_ref[0, i], qf)
            else:
                qf = q.astype(jnp.float32)
            s = scale_ref[h].astype(jnp.float32)              # [tg, tnp]
            s_exp = jnp.broadcast_to(
                s[:, None, :], (tg, group, tnp)).reshape(tk, tnp)
            w = (qf * s_exp).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if min_ref is not None:
            acc = acc - jax.lax.dot_general(
                xsum, min_ref[h].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        accs.append(acc)
    update = jnp.stack(accs, axis=1)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = update

    @pl.when(kk != 0)
    def _():
        o_ref[...] = o_ref[...] + update


def _qmm_t_cache_kernel(x_ref, qs_ref, scale_ref, min_ref, lut_ref,
                        member_ref, o_ref, w_scr, *, kind: str,
                        group: int, pack: int, n_lut: int):
    """Weight-strip-cached prefill kernel: grid (n, m) with m INNERMOST
    and the FULL K axis inside the block, so each packed weight strip is
    dequantized ONCE (at mm == 0, in sub-chunks to bound the int32
    intermediate) into a VMEM scratch and reused by every row tile. At
    M = 512 with 128-row tiles this divides the VPU dequant work by 4,
    attacking the VPU/MXU serialization that caps the serialized kernel
    at ~52% of MXU peak (KBENCH.md round-5 prefill). No K grid dimension
    means the f32 output block is written exactly once per (n, m) step —
    the first cut of this kernel (grid (n, k, m)) measured SLOWER than
    the baseline (18.0 vs 13.8 ms on the 8B pp512 chain) because the
    revisited output block round-tripped through HBM every K step.

    w_scr: [pack, K, tnp] bf16 scratch, persistent across grid steps."""
    mm = pl.program_id(1)
    kdim, tnp = qs_ref.shape
    CH = 256              # dequant sub-chunk: bounds the int32 intermediate
    tg_c = CH // group

    @pl.when(mm == 0)
    def _():
        for c in range(kdim // CH):
            qc32 = None
            rows = slice(c * CH, (c + 1) * CH)
            if kind != "int8":
                qc32 = qs_ref[rows, :].astype(jnp.int32)
            for h in range(pack):
                q = qs_ref[rows, :].astype(jnp.int32) if kind == "int8" \
                    else _unpack(qc32, kind, h)
                s = scale_ref[h, c * tg_c:(c + 1) * tg_c, :]
                if kind in ("u4lut", "u2lut"):
                    qf = jnp.zeros(q.shape, jnp.float32)
                    for i in range(n_lut):
                        qf = jnp.where(q == i, lut_ref[0, i], qf)
                    s_exp = jnp.broadcast_to(
                        s.astype(jnp.float32)[:, None, :],
                        (tg_c, group, tnp)).reshape(CH, tnp)
                    w_scr[h, rows, :] = (qf * s_exp).astype(jnp.bfloat16)
                else:
                    # direct int->bf16 convert + bf16 scale mul
                    # (bit-identical to the f32 pipeline — see
                    # _qmm_t_kernel variant 'bf16')
                    s_exp = jnp.broadcast_to(
                        s[:, None, :], (tg_c, group, tnp)).reshape(CH,
                                                                   tnp)
                    w_scr[h, rows, :] = q.astype(jnp.bfloat16) * s_exp

    x = x_ref[...]
    accs = []
    for h in range(pack):
        acc = jax.lax.dot_general(x, w_scr[h],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if min_ref is not None:
            # xsum_ref: per-group activation sums PRECOMPUTED in XLA
            # (member_ref carries them here — K = 4096 means tg = 128,
            # so the [tm, tg] block is lane-legal, unlike the general
            # kernel's arbitrary tg; an in-kernel segment-reduce reshape
            # was tried and is a Mosaic "unsupported shape cast")
            acc = acc - jax.lax.dot_general(
                member_ref[...], min_ref[h].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        accs.append(acc)
    o_ref[...] = jnp.stack(accs, axis=1)


def _qmm_t_cache_dispatch(x_ref, *rest, kind, group, pack, n_lut,
                          has_min, has_lut, has_member):
    refs = list(rest)
    i = 0
    qs_ref = refs[i]; i += 1
    scale_ref = refs[i]; i += 1
    min_ref = refs[i] if has_min else None
    i += has_min
    lut_ref = refs[i] if has_lut else None
    i += has_lut
    member_ref = refs[i] if has_member else None
    i += has_member
    o_ref = refs[i]
    w_scr = refs[i + 1]
    _qmm_t_cache_kernel(x_ref, qs_ref, scale_ref, min_ref, lut_ref,
                        member_ref, o_ref, w_scr, kind=kind, group=group,
                        pack=pack, n_lut=n_lut)


def _qmm_t_dispatch(x_ref, *rest, kind, group, pack, n_lut,
                    has_min, has_lut, has_member, variant):
    refs = list(rest)
    i = 0
    qs_ref = refs[i]; i += 1
    scale_ref = refs[i]; i += 1
    min_ref = refs[i] if has_min else None
    i += has_min
    lut_ref = refs[i] if has_lut else None
    i += has_lut
    member_ref = refs[i] if has_member else None
    i += has_member
    o_ref = refs[i]
    _qmm_t_kernel(x_ref, qs_ref, scale_ref, min_ref, lut_ref, member_ref,
                  o_ref, kind=kind, group=group, pack=pack, n_lut=n_lut,
                  variant=variant)


def _pick_tile_k(k: int, group: int) -> int:
    """Largest tile_k <= 2048 dividing k whose scale tile stays Mosaic-legal:
    the (pack, tile_k/group, tile_n) scale BlockSpec needs its sublane dim
    tile_k/group to be a multiple of 8. Falls back to the whole K axis —
    a block equal to the array dims is always legal."""
    for tk in (2048, 1024, 512, 256, 128):
        if k % tk == 0 and tk % group == 0 and (tk // group) % 8 == 0:
            return tk
    return k


@functools.partial(jax.jit, static_argnames=(
    "kind", "group", "pack", "n_lut", "tile_m", "tile_n", "interpret",
    "variant"))
def _qmm_t_call(x, qs, scale, min_, lut, *, kind, group, pack, n_lut,
                tile_m, tile_n, interpret, variant):
    m, k = x.shape
    npk = qs.shape[1]
    tile_k = _pick_tile_k(k, group)
    tg = tile_k // group
    # wider n tiles amortize per-grid-step cost (v5e: 418 -> 474 -> 518 GB/s
    # at 256/512/1024 on the decode chain) but the in-kernel int32 unpack
    # materializes tile_k x tile_n x 4 bytes — clamp the product so VMEM
    # holds the intermediate plus double-buffered inputs. Larger row tiles
    # add tile_m x (tile_k + pack*tile_n) x ~6B of x/out/acc VMEM: at
    # tile_m=64 a 2M-element weight tile blows the 16M scoped-vmem limit
    # (measured: 16.46M on the padded lm_head at B=64), so the budget
    # shrinks with tile_m
    budget = 2 * 1024 * 1024 if tile_m <= 8 else 1024 * 1024
    while tile_n > 256 and tile_k * tile_n > budget:
        tile_n //= 2
    while npk % tile_n:
        tile_n //= 2

    has_min = min_ is not None
    has_member = has_min
    if variant == "cache":
        if m // min(tile_m, 128) <= 1 or k > 4096 or k % 512 or \
                (min_ is not None and (k // group) % 128 != 0
                 and not interpret):
            # nothing to reuse across row tiles, the full-K weight strip
            # would blow VMEM (ffn_down's K = n_ff), or the precomputed
            # xsum block's lane dim (K/group) isn't 128-aligned
            variant = "bf16"
        else:
            return _qmm_t_cache_call(
                x, qs, scale, min_, lut, kind=kind, group=group,
                pack=pack, n_lut=n_lut, tile_m=tile_m, tile_n=tile_n,
                interpret=interpret)
    grid = (m // tile_m, npk // tile_n, k // tile_k)
    in_specs = [
        pl.BlockSpec((tile_m, tile_k), lambda mm, n, kk: (mm, kk),
                     memory_space=pltpu.VMEM),
    ]
    args = [x.astype(jnp.bfloat16)]
    in_specs.append(pl.BlockSpec((tile_k, tile_n), lambda mm, n, kk: (kk, n),
                                 memory_space=pltpu.VMEM))
    args.append(qs)
    in_specs.append(pl.BlockSpec((pack, tg, tile_n),
                                 lambda mm, n, kk: (0, kk, n),
                                 memory_space=pltpu.VMEM))
    args.append(scale)
    if has_min:
        in_specs.append(pl.BlockSpec((pack, tg, tile_n),
                                     lambda mm, n, kk: (0, kk, n),
                                     memory_space=pltpu.VMEM))
        args.append(min_)
    if lut is not None:
        in_specs.append(pl.BlockSpec((1, n_lut), lambda mm, n, kk: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(lut.reshape(1, n_lut))
    if has_member:
        # constant 0/1 group-membership [tile_k, tg]; block == array dims
        # (always Mosaic-legal), constant index_map so the revolving buffer
        # fetches it once per (m, n) tile. Built with iotas OUTSIDE the
        # kernel (XLA hoists the loop-invariant build; a numpy constant
        # would serialize into the remote-compile program body instead)
        kidx = jax.lax.broadcasted_iota(jnp.int32, (tile_k, tg), 0)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (tile_k, tg), 1)
        member = (kidx // group == gidx).astype(jnp.bfloat16)
        in_specs.append(pl.BlockSpec((tile_k, tg), lambda mm, n, kk: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(member)

    kernel = functools.partial(
        _qmm_t_dispatch, kind=kind, group=group, pack=pack, n_lut=n_lut,
        has_min=has_min, has_lut=lut is not None, has_member=has_member,
        variant=variant)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, pack, tile_n),
                               lambda mm, n, kk: (mm, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, pack, npk), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * npk * pack,
            bytes_accessed=qs.size + m * k * 2 + m * npk * pack * 4,
            transcendentals=0,
        ),
    )(*args)
    return out


def _qmm_t_cache_call(x, qs, scale, min_, lut, *, kind, group, pack,
                      n_lut, tile_m, tile_n, interpret):
    """pallas_call for the weight-strip-cached kernel: grid (n, m) with
    the FULL K axis in-block, m innermost, bf16 weight scratch
    persistent across the m loop (caller guarantees K <= 4096 and
    K % 512 == 0)."""
    m, k = x.shape
    npk = qs.shape[1]
    tg = k // group
    # narrow n tiles multiply the x streaming traffic (x refetches once
    # per n strip: measured 15.3 ms at tn=256 vs the 13.8 baseline at
    # tn=512), so keep tn=512 and shrink the row tile instead — more row
    # tiles also means more scratch reuse. VMEM at K=4096/tn=512/pack=2:
    # scratch 8M + qs strip 4M (2 buf) + x 1M + int32 chunk 1M +
    # scale/min/out/member ~1.5M ~= 15.5M of the 16M scoped limit
    tile_m = min(tile_m, 64)
    tile_n = min(tile_n, 512)
    while npk % tile_n:
        tile_n //= 2
    grid = (npk // tile_n, m // tile_m)
    has_min = min_ is not None
    in_specs = [
        pl.BlockSpec((tile_m, k), lambda n, mm: (mm, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, tile_n), lambda n, mm: (0, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pack, tg, tile_n), lambda n, mm: (0, 0, n),
                     memory_space=pltpu.VMEM),
    ]
    args = [x.astype(jnp.bfloat16), qs, scale]
    if has_min:
        in_specs.append(pl.BlockSpec((pack, tg, tile_n),
                                     lambda n, mm: (0, 0, n),
                                     memory_space=pltpu.VMEM))
        args.append(min_)
    if lut is not None:
        in_specs.append(pl.BlockSpec((1, n_lut),
                                     lambda n, mm: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(lut.reshape(1, n_lut))
    if has_min:
        # per-group activation sums [m, tg] f32, computed in XLA (cheap
        # m*K reduce); rides the member slot of the dispatch
        xs = jnp.sum(x.astype(jnp.float32).reshape(m, tg, group), axis=-1)
        in_specs.append(pl.BlockSpec((tile_m, tg), lambda n, mm: (mm, 0),
                                     memory_space=pltpu.VMEM))
        args.append(xs)
    kernel = functools.partial(
        _qmm_t_cache_dispatch, kind=kind, group=group, pack=pack,
        n_lut=n_lut, has_min=has_min, has_lut=lut is not None,
        has_member=has_min)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, pack, tile_n),
                               lambda n, mm: (mm, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, pack, npk), jnp.float32),
        scratch_shapes=[pltpu.VMEM((pack, k, tile_n), jnp.bfloat16)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * npk * pack,
            bytes_accessed=qs.size + m * k * 2 + m * npk * pack * 4,
            transcendentals=0,
        ),
    )(*args)


def _pad_to(x: jax.Array, mult: int, axis: int) -> jax.Array:
    size = x.shape[axis]
    pad = -size % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _tile_m_for(m: int) -> int:
    if m <= 8:
        return 8
    if m <= 64:
        return 64
    return 256


def _qmm_planes(x2: jax.Array, qt: QTensor, tile_n: int,
                interpret: bool, variant: str | None = None) -> jax.Array:
    """[Mpad, K] x planes -> [Mpad, pack, NPK] f32 (packed-column order)."""
    qs = jnp.asarray(qt.qs)
    scale = None if qt.scale is None else jnp.asarray(qt.scale)
    min_ = None if qt.min_ is None else jnp.asarray(qt.min_)
    lut = None if qt.lut is None else jnp.asarray(qt.lut, jnp.float32)
    n_lut = 0 if lut is None else int(lut.shape[0])
    m = x2.shape[0]
    return _qmm_t_call(x2, qs, scale, min_, lut, kind=qt.kind,
                       group=qt.group, pack=qt.pack, n_lut=n_lut,
                       tile_m=_tile_m_for(m), tile_n=tile_n,
                       interpret=interpret,
                       variant=variant or QMM_VARIANT)


def qmm(x: jax.Array, qt: QTensor, *, tile_n: int = 1024,
        interpret: bool = False, out_dtype=jnp.float32,
        variant: str | None = None) -> jax.Array:
    """Fused dequant-matmul. x: [..., K]; returns [..., n_orig]."""
    assert qt.layout == "t", "qmm expects layout 't' (matmul planes)"
    if qt.kind == "dense":
        w = jnp.asarray(qt.qs, jnp.bfloat16)
        y = jax.lax.dot_general(x.astype(jnp.bfloat16), w,
                                (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y[..., : qt.n_orig].astype(out_dtype)
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    x2 = _pad_to(x2, _tile_m_for(m), 0)
    y = _qmm_planes(x2, qt, tile_n, interpret, variant)
    y = y.reshape(y.shape[0], -1)[:m, : qt.n_orig]
    return y.reshape(*lead, qt.n_orig).astype(out_dtype)


def qmm_split(x: jax.Array, qt: QTensor, *, tile_n: int = 1024,
              interpret: bool = False, out_dtype=jnp.float32,
              use_pallas: bool = True) -> list[jax.Array]:
    """Fused-projection matmul: one kernel pass over a fuse_qtensors plane,
    sliced back into per-constituent outputs [..., n_orig_i]."""
    assert qt.parts is not None, "qmm_split needs a fused QTensor"
    lead = x.shape[:-1]
    k = x.shape[-1]
    if qt.kind == "dense":
        y = qmm_xla(x, qt, out_dtype) if not use_pallas else qmm(
            x, qt, tile_n=tile_n, interpret=interpret, out_dtype=out_dtype)
        outs, off = [], 0
        for npk_i, n_orig_i in qt.parts:  # pack == 1
            outs.append(y[..., off:off + n_orig_i])
            off += npk_i
        return outs
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if use_pallas:
        x2p = _pad_to(x2, _tile_m_for(m), 0)
        y3 = _qmm_planes(x2p, qt, tile_n, interpret)[:m]
    else:
        w = dequantize_xla(qt)
        y = jax.lax.dot_general(x2.astype(jnp.bfloat16), w,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y3 = y.reshape(m, qt.pack, qt.npk)
    outs, off = [], 0
    for npk_i, n_orig_i in qt.parts:
        yi = y3[:, :, off:off + npk_i].reshape(m, qt.pack * npk_i)
        outs.append(yi[:, :n_orig_i].reshape(*lead, n_orig_i)
                    .astype(out_dtype))
        off += npk_i
    return outs


# ---------------------------------------------------------------------------
# row-layout gather (embedding tables)


def qgather(ids: jax.Array, qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize gathered rows: ids [...] -> [..., K].

    The token-embedding lookup over a quantized [n_vocab, K] table (analogue
    of GGML_OP_GET_ROWS on quantized src, reference ggml-cpu.c get_rows).
    Requires layout 'rows': row j of the logical weight lives in packed plane
    row j % npk at sub-value j // npk, so per-token work is one plane-row
    gather plus elementwise unpack — XLA fuses it.
    """
    assert qt.layout == "rows", "qgather expects layout 'rows'"
    if qt.kind == "dense":
        w = jnp.asarray(qt.qs)
        return w[ids].astype(dtype)
    qs = jnp.asarray(qt.qs)
    scale = jnp.asarray(qt.scale, jnp.float32)  # [pack, G, npk]
    npk = qs.shape[0]
    sub = ids // npk          # which packed sub-value
    row = ids % npk           # plane row
    q = qs[row].astype(jnp.int32)
    if qt.kind != "int8":
        bits = _BITS[qt.kind]
        q = (q >> (bits * sub)[..., None]) & ((1 << bits) - 1)
    if qt.kind in ("u4lut", "u2lut"):
        lut = jnp.asarray(qt.lut, jnp.float32)
        qf = lut[q]
    else:
        qf = q.astype(jnp.float32)
    s = jnp.repeat(scale[sub, :, row], qt.group, axis=-1)  # [..., K]
    w = s * qf
    if qt.min_ is not None:
        m = jnp.asarray(qt.min_, jnp.float32)[sub, :, row]
        w = w - jnp.repeat(m, qt.group, axis=-1)
    return w.astype(dtype)
