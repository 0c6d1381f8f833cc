"""Fused dequant-matmul: y[M, N] = x[M, K] @ dequant(W)[N, K]^T.

The TPU-native analogue of ggml-cuda's mmq.cu (prefill tiles) and mmvq.cu
(decode matvec): weights stay in their packed plane layout in HBM
(quant/repack.py); each kernel tile unpacks nibbles/crumbs with VPU bit ops,
applies per-group scales, and feeds bf16 tiles to the MXU. One kernel serves
both prefill (large M) and decode (M<=8, padded to the sublane tile).

Two paths:
  qmm_xla   — pure-XLA reference (dequantize planes inside jit; XLA fuses).
              Works on CPU; golden for conformance tests; used when Pallas
              is unavailable.
  qmm       — Pallas fused kernel (grid over N tiles x M tiles; full-K rows
              per tile for round-1 simplicity).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.repack import QTensor

# Scale-expansion strategy inside kernels: 'repeat' uses jnp.repeat along
# lanes; 'ematmul' multiplies by a 0/1 expansion matrix on the MXU (fallback
# when Mosaic can't lower the repeat).
_EXPAND_STRATEGY = "repeat"


def set_expand_strategy(s: str) -> None:
    global _EXPAND_STRATEGY
    assert s in ("repeat", "ematmul")
    _EXPAND_STRATEGY = s


def _expand_groups(s: jax.Array, group: int) -> jax.Array:
    """[n, G] -> [n, G*group], each column repeated `group` times."""
    if _EXPAND_STRATEGY == "repeat":
        return jnp.repeat(s, group, axis=1)
    n, g = s.shape
    k = g * group
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, k), 1)
    e = (cols // group == rows).astype(s.dtype)
    return jax.lax.dot_general(s, e, (((1,), (0,)), ((), ())),
                               preferred_element_type=s.dtype)


def _unpack_plane(qs: jax.Array, kind: str, h: int) -> jax.Array:
    """Extract sub-value h from a packed byte plane -> int32."""
    q = qs.astype(jnp.int32)
    if kind == "int8":
        return q
    bits = {"u4": 4, "u2": 2, "u4lut": 4}[kind]
    return (q >> (bits * h)) & ((1 << bits) - 1)


def _lut_lookup(q: jax.Array, lut) -> jax.Array:
    """16-entry LUT via select chain (VPU-friendly; no gather)."""
    out = jnp.full(q.shape, float(lut[0]), dtype=jnp.float32)
    for i in range(1, len(lut)):
        out = jnp.where(q == i, float(lut[i]), out)
    return out


# ---------------------------------------------------------------------------
# XLA reference path


def dequantize_xla(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Decode planes -> dense [N, K] inside jit (XLA fuses the elementwise
    chain). N includes padding; slice with qt.n_orig if needed."""
    return _dequant_planes(
        jnp.asarray(qt.qs),
        None if qt.scale is None else jnp.asarray(qt.scale, jnp.float32),
        None if qt.min_ is None else jnp.asarray(qt.min_, jnp.float32),
        None if qt.lut is None else jnp.asarray(qt.lut, jnp.float32),
        kind=qt.kind, group=qt.group, dtype=dtype,
    )


def _rows_from_group_major(s: jax.Array) -> jax.Array:
    """[pack, G, npk] group-major scale planes -> [pack*npk, G] row order."""
    return jnp.transpose(s, (0, 2, 1)).reshape(s.shape[0] * s.shape[2],
                                               s.shape[1])


def _dequant_planes(qs, scale, min_, lut, *, kind, group, dtype):
    if kind == "dense":
        return qs.astype(dtype)
    pack = {"int8": 1, "u4": 2, "u2": 4, "u4lut": 2}[kind]
    parts = [_unpack_plane(qs, kind, h) for h in range(pack)]
    q = jnp.concatenate(parts, axis=0)
    if kind == "u4lut":
        qf = jnp.zeros(q.shape, jnp.float32)
        for i in range(lut.shape[0]):
            qf = jnp.where(q == i, lut[i], qf)
    else:
        qf = q.astype(jnp.float32)
    w = _expand_groups(_rows_from_group_major(scale), group) * qf
    if min_ is not None:
        w = w - _expand_groups(_rows_from_group_major(min_), group)
    return w.astype(dtype)


@functools.partial(jax.jit, static_argnames=("kind", "group", "n_orig"))
def _qmm_xla_impl(x, qs, scale, min_, lut, *, kind, group, n_orig):
    w = _dequant_planes(qs, scale, min_, lut, kind=kind, group=group,
                        dtype=jnp.bfloat16)
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w,
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y[..., :n_orig]


def qmm_xla(x: jax.Array, qt: QTensor, out_dtype=jnp.float32) -> jax.Array:
    y = _qmm_xla_impl(
        x, jnp.asarray(qt.qs),
        None if qt.scale is None else jnp.asarray(qt.scale, jnp.float32),
        None if qt.min_ is None else jnp.asarray(qt.min_, jnp.float32),
        None if qt.lut is None else jnp.asarray(qt.lut, jnp.float32),
        kind=qt.kind, group=qt.group, n_orig=qt.n_orig,
    )
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernel


def _qmm_kernel(x_ref, qs_ref, scale_ref, min_ref, lut_ref, o_ref,
                *, kind: str, group: int, pack: int, n_lut: int):
    """One (tm, tk) x (pack, tnp, tk) -> (tm, pack, tnp) tile, accumulated
    over the K grid dimension.

    Mosaic can't lower lane-wise jnp.repeat, so per-group scales are expanded
    to per-element with a 0/1 expansion matrix on the MXU (exact: E entries
    are 0/1 so the "matmul" just copies scale values), and the affine minimum
    never gets expanded at all: sum_k x*min[g(k)] = (x @ E^T) @ min^T — two
    small MXU matmuls.

    refs:
      x_ref     [tm, tk]         bf16 activations
      qs_ref    [tnp, tk]        uint8/int8 packed plane
      scale_ref [pack, tg, tnp]  f32 (group-major: lane dim = output rows)
      min_ref   [pack, tg, tnp]  f32 (or None)
      lut_ref   [1, n_lut]       f32 (or None)
      o_ref     [tm, pack, tnp]  f32
    """
    kk = pl.program_id(2)
    x = x_ref[:].astype(jnp.bfloat16)
    qs = qs_ref[:]
    tk = x.shape[1]
    tg = tk // group
    rows = jax.lax.broadcasted_iota(jnp.int32, (tg, tk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tg, tk), 1)
    # 0/1 expansion matrix: kept f32 so scale expansion is exact (a bf16
    # round of the scales costs ~1e-5 NMSE vs the XLA reference path)
    e = (cols // group == rows).astype(jnp.float32)  # [tg, tk]
    if min_ref is not None:
        # per-group activation sums: [tm, tg]
        xsum = jax.lax.dot_general(x.astype(jnp.float32), e,
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    accs = []
    for h in range(pack):
        q = _unpack_plane(qs, kind, h)
        if kind == "u4lut":
            qf = jnp.full(q.shape, 0.0, dtype=jnp.float32)
            for i in range(n_lut):
                qf = jnp.where(q == i, lut_ref[0, i], qf)
        else:
            qf = q.astype(jnp.float32)
        s_exp = jax.lax.dot_general(
            scale_ref[h], e, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [tnp, tk]
        w = (qf * s_exp).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if min_ref is not None:
            acc = acc - jax.lax.dot_general(
                xsum, min_ref[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        accs.append(acc)
    update = jnp.stack(accs, axis=1)

    @pl.when(kk == 0)
    def _():
        o_ref[:] = update

    @pl.when(kk != 0)
    def _():
        o_ref[:] = o_ref[:] + update


_MAX_TILE_K = 2048


@functools.partial(jax.jit, static_argnames=("kind", "group", "pack", "n_lut",
                                             "tile_m", "tile_n", "interpret"))
def _qmm_call(x, qs, scale, min_, lut, *, kind, group, pack, n_lut,
              tile_m, tile_n, interpret):
    m, k = x.shape
    npk = qs.shape[0]  # N / pack
    tile_k = k if k <= _MAX_TILE_K else _MAX_TILE_K
    while k % tile_k:
        tile_k //= 2
    tg = tile_k // group
    g = k // group
    if tg < 8 and tg != g:
        # scale tile sublane dim must be >=8 or span the full group axis
        tile_k = k
        tg = g
    grid = (npk // tile_n, m // tile_m, k // tile_k)

    in_specs = [
        pl.BlockSpec((tile_m, tile_k), lambda n, mm, kk: (mm, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, tile_k), lambda n, mm, kk: (n, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pack, tg, tile_n), lambda n, mm, kk: (0, kk, n),
                     memory_space=pltpu.VMEM),
    ]
    args = [x.astype(jnp.bfloat16), qs, scale]
    if min_ is not None:
        in_specs.append(pl.BlockSpec((pack, tg, tile_n),
                                     lambda n, mm, kk: (0, kk, n),
                                     memory_space=pltpu.VMEM))
        args.append(min_)
    if lut is not None:
        in_specs.append(pl.BlockSpec((1, n_lut), lambda n, mm, kk: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(lut.reshape(1, n_lut))

    kernel = functools.partial(
        _qmm_kernel_dispatch, kind=kind, group=group, pack=pack, n_lut=n_lut,
        has_min=min_ is not None, has_lut=lut is not None,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, pack, tile_n),
                               lambda n, mm, kk: (mm, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, pack, npk), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * npk * pack,
            bytes_accessed=qs.size + m * k * 2 + m * npk * pack * 4,
            transcendentals=0,
        ),
    )(*args)
    return out.reshape(m, pack * npk)


def _qmm_kernel_dispatch(x_ref, qs_ref, scale_ref, *rest,
                         kind, group, pack, n_lut, has_min, has_lut):
    idx = 0
    min_ref = None
    lut_ref = None
    refs = list(rest)
    if has_min:
        min_ref = refs[idx]; idx += 1
    if has_lut:
        lut_ref = refs[idx]; idx += 1
    o_ref = refs[idx]
    _qmm_kernel(x_ref, qs_ref, scale_ref, min_ref, lut_ref, o_ref,
                kind=kind, group=group, pack=pack, n_lut=n_lut)


def qgather(ids: jax.Array, qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize gathered rows: ids [...] -> [..., K].

    The token-embedding lookup over a quantized [n_vocab, K] table (analogue
    of GGML_OP_GET_ROWS on quantized src, reference ggml-cpu.c get_rows).
    Row j of the logical weight lives in packed plane row j % npk at
    sub-value j // npk, so per-token work is one plane-row gather plus
    elementwise unpack — XLA fuses it.
    """
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
        bits = {"u4": 4, "u2": 2, "u4lut": 4}[qt.kind]
        q = (q >> (bits * sub)[..., None]) & ((1 << bits) - 1)
    if qt.kind == "u4lut":
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


def _pad_to(x: jax.Array, mult: int, axis: int) -> jax.Array:
    size = x.shape[axis]
    pad = -size % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def qmm(x: jax.Array, qt: QTensor, *, tile_m: int = 8, tile_n: int = 128,
        interpret: bool = False, out_dtype=jnp.float32) -> jax.Array:
    """Fused dequant-matmul. x: [..., K]; returns [..., n_orig]."""
    if qt.kind == "dense":
        w = jnp.asarray(qt.qs, jnp.bfloat16)
        y = jax.lax.dot_general(x.astype(jnp.bfloat16), w,
                                (((x.ndim - 1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y[..., : qt.n_orig].astype(out_dtype)
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    # decode: one 8-row tile; prefill: larger M tiles for MXU efficiency
    if m <= 8:
        eff_tile_m = max(tile_m, 8)
    elif m <= 64:
        eff_tile_m = 64
    else:
        eff_tile_m = 256
    x2 = _pad_to(x2, eff_tile_m, 0)
    qs = jnp.asarray(qt.qs)
    scale = jnp.asarray(qt.scale, jnp.float32)
    min_ = None if qt.min_ is None else jnp.asarray(qt.min_, jnp.float32)
    lut = None if qt.lut is None else jnp.asarray(qt.lut, jnp.float32)
    n_lut = 0 if qt.lut is None else int(lut.shape[0])
    y = _qmm_call(x2, qs, scale, min_, lut, kind=qt.kind, group=qt.group,
                  pack=qt.pack, n_lut=n_lut, tile_m=eff_tile_m,
                  tile_n=tile_n, interpret=interpret)
    y = y[:m, : qt.n_orig]
    return y.reshape(*lead, qt.n_orig).astype(out_dtype)
