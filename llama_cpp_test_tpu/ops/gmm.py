"""Grouped (ragged) quantized matmul over stacked expert planes — the
TPU-native GGML_OP_MUL_MAT_ID (reference src/llama-graph.h:451 build_moe_ffn,
ggml-cuda mmq id path).

The round-1/2 MoE path ran EVERY expert densely over all tokens with a
routing-weight mask: E x the FLOPs at prefill and, worse, E x the HBM weight
traffic at decode. This module replaces it:

  1. `route_tokens` (pure XLA, inside jit): flatten the [M, top_k] routing
     assignments, stable-sort them by expert, and pack each expert's rows
     into a tile_m-aligned segment of a scratch batch. Tile i of the scratch
     batch belongs to exactly ONE expert, recorded in `tile_expert`.
  2. `gmm` (Pallas): grid (N-tiles outer, row-tiles INNER) with the whole K
     axis resident per weight block. The weight BlockSpec indexes the stacked
     expert planes by `tile_expert[i]` (scalar prefetch), so consecutive
     row-tiles of the same expert — and the dead tail tiles, which are
     clamped to the last live expert — hit the SAME block index and Pallas
     skips the HBM fetch entirely. A decode step therefore streams only the
     union of experts actually chosen by the batch (top-k of E), which is
     the information-theoretic minimum, while prefill compute drops from
     E*M to ~M*top_k rows.
  3. `combine` (pure XLA): scatter-add each scratch row back to its token,
     scaled by the routing weight (padding rows carry weight 0).

Plane layout, per-kind unpack, bf16 group scales and the xsum/min fold are
shared with ops/qmatmul (same layout 't' planes, stacked on a leading E axis
by models/llama._repack_3d).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.repack import QTensor
from .qmatmul import _unpack


class Routing(NamedTuple):
    """Static-shape routing plan for one MoE dispatch (all device arrays)."""
    tok_idx: jax.Array      # [Rp] source token row per scratch row (pad: 0)
    weight: jax.Array       # [Rp] f32 combine weight (pad rows: 0)
    tile_expert: jax.Array  # [T] int32 LOCAL expert id per row tile


def num_tiles(m: int, top_k: int, n_expert_local: int, tile_m: int) -> int:
    """Static row-tile budget: sum_e ceil(c_e/tile_m) <= R//tile_m + #experts
    with nonzero load (<= min(E_local, R))."""
    r = m * top_k
    return r // tile_m + min(n_expert_local, r) + (1 if r % tile_m else 0)


def route_tokens(topi: jax.Array, topv: jax.Array, *,
                 n_expert_local: int, expert_offset: Any, tile_m: int,
                 **_ignored) -> Routing:
    """Build the scratch-batch routing plan (XLA, jit-traceable).

    topi/topv: [M, top_k] expert ids / combine weights (global expert ids).
    expert_offset: first local expert id (traced OK) — assignments outside
    [offset, offset + n_expert_local) are dropped (their contribution comes
    from another device's shard and is psum'ed by the caller).
    """
    m, ku = topi.shape
    r = m * ku
    e_loc = n_expert_local
    fl_e = topi.reshape(r)
    fl_t = jnp.repeat(jnp.arange(m, dtype=jnp.int32), ku)
    fl_w = topv.reshape(r).astype(jnp.float32)
    loc = fl_e - expert_offset
    valid = (loc >= 0) & (loc < e_loc)
    # sort key: local expert id, invalid assignments pushed past every segment
    key = jnp.where(valid, loc, e_loc)
    order = jnp.argsort(key, stable=True)
    se = key[order]                      # sorted local expert (e_loc = dead)
    st = fl_t[order]
    sw = jnp.where(valid, fl_w, 0.0)[order]
    counts = jnp.bincount(key, length=e_loc + 1)[:e_loc]
    padded = ((counts + tile_m - 1) // tile_m) * tile_m
    seg_start = jnp.cumsum(padded) - padded          # [E_loc] exclusive
    csum = jnp.cumsum(counts) - counts
    t_total = num_tiles(m, ku, e_loc, tile_m)
    rp = t_total * tile_m
    se_c = jnp.minimum(se, e_loc - 1)
    rank = jnp.arange(r, dtype=jnp.int32) - csum[se_c].astype(jnp.int32)
    dst = seg_start[se_c].astype(jnp.int32) + rank
    dst = jnp.where(se < e_loc, dst, rp)             # dead -> dropped
    tok_idx = jnp.zeros((rp,), jnp.int32).at[dst].set(st, mode="drop")
    weight = jnp.zeros((rp,), jnp.float32).at[dst].set(sw, mode="drop")
    # tile -> local expert; dead tail tiles clamp to the LAST live tile's
    # expert so their weight-block index repeats and the fetch is skipped
    seg_end = jnp.cumsum(padded)
    tile_start = jnp.arange(t_total, dtype=jnp.int32) * tile_m
    te = jnp.searchsorted(seg_end, tile_start, side="right").astype(jnp.int32)
    live = tile_start < seg_end[-1]
    last_live_e = te[jnp.maximum(jnp.sum(live.astype(jnp.int32)) - 1, 0)]
    te = jnp.where(live, jnp.minimum(te, e_loc - 1), last_live_e)
    return Routing(tok_idx, weight, te)


def combine(y_flat: jax.Array, routing: Routing, m: int) -> jax.Array:
    """Scatter-add scratch rows back to tokens: [Rp, N] -> [M, N] f32."""
    contrib = y_flat.astype(jnp.float32) * routing.weight[:, None]
    return jnp.zeros((m, y_flat.shape[1]), jnp.float32).at[
        routing.tok_idx].add(contrib)


# ---------------------------------------------------------------------------
# Pallas kernel


_KCHUNK = 2048  # in-kernel K-slice: bounds the int32 unpack intermediate


def _gmm_kernel(te_ref, x_ref, qs_ref, scale_ref, min_ref, lut_ref, o_ref,
                *, kind: str, group: int, pack: int, n_lut: int):
    """One (tile_m, K) x expert(K, tile_n) -> (tile_m, pack, tile_n) tile.
    Whole K resident per block: no accumulation grid dim, so the weight
    block index depends only on (tile_expert[i], n) and consecutive
    same-expert tiles skip the HBM fetch. The unpack/dequant/dot runs over
    static K-chunks so VMEM holds only packed bytes plus one chunk of
    int32/f32 intermediates (whole-K expansion OOMs at Mixtral's K=14336)."""
    x_full = x_ref[...]
    if kind == "dense":
        o_ref[...] = jax.lax.dot_general(
            x_full, qs_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:, None, :]
        return
    k, tnp = qs_ref.shape[1], qs_ref.shape[2]
    kc = k
    for cand in (2048, 1024, 512, 256):
        if k % cand == 0 and cand % group == 0 and cand <= _KCHUNK:
            kc = cand
            break
    tgc = kc // group
    accs = [None] * pack
    for c in range(k // kc):
        qs32 = qs_ref[0, c * kc:(c + 1) * kc, :].astype(jnp.int32)
        x = x_full[:, c * kc:(c + 1) * kc]
        xsum = None
        if min_ref is not None:
            kidx = jax.lax.broadcasted_iota(jnp.int32, (kc, tgc), 0)
            gidx = jax.lax.broadcasted_iota(jnp.int32, (kc, tgc), 1)
            member = (kidx // group == gidx).astype(jnp.bfloat16)
            xsum = jax.lax.dot_general(x, member, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        for h in range(pack):
            q = _unpack(qs32, kind, h)
            if kind in ("u4lut", "u2lut"):
                qf = jnp.zeros(q.shape, jnp.float32)
                for i in range(n_lut):
                    qf = jnp.where(q == i, lut_ref[0, i], qf)
            else:
                qf = q.astype(jnp.float32)
            s = scale_ref[0, h, c * tgc:(c + 1) * tgc, :].astype(jnp.float32)
            s_exp = jnp.broadcast_to(
                s[:, None, :], (tgc, group, tnp)).reshape(kc, tnp)
            w = (qf * s_exp).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            if min_ref is not None:
                acc = acc - jax.lax.dot_general(
                    xsum, min_ref[0, h, c * tgc:(c + 1) * tgc, :]
                    .astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            accs[h] = acc if accs[h] is None else accs[h] + acc
    o_ref[...] = jnp.stack(accs, axis=1)


def _gmm_dispatch(te_ref, x_ref, *rest, kind, group, pack, n_lut,
                  has_min, has_lut):
    refs = list(rest)
    i = 0
    qs_ref = refs[i]; i += 1
    scale_ref = refs[i] if kind != "dense" else None
    i += kind != "dense"
    min_ref = refs[i] if has_min else None
    i += has_min
    lut_ref = refs[i] if has_lut else None
    i += has_lut
    o_ref = refs[i]
    _gmm_kernel(te_ref, x_ref, qs_ref, scale_ref, min_ref, lut_ref, o_ref,
                kind=kind, group=group, pack=pack, n_lut=n_lut)


def _pick_tile_n(k: int, npk: int, dtype_bytes: int = 1) -> int:
    """Largest tile_n whose whole-K weight block (plus double buffering)
    stays well under VMEM."""
    budget = 6 * 1024 * 1024  # bytes for one weight block (x2 buffers ~ 12M)
    for tn in (512, 256, 128):
        if npk % tn == 0 and k * tn * dtype_bytes <= budget:
            return tn
    return 128 if npk % 128 == 0 else npk


@functools.partial(jax.jit, static_argnames=(
    "kind", "group", "pack", "n_lut", "tile_m", "interpret"))
def _gmm_call(xs, te, qs, scale, min_, lut, *, kind, group, pack, n_lut,
              tile_m, interpret):
    rp, k = xs.shape
    t_total = rp // tile_m
    npk = qs.shape[-1]
    dbytes = 2 if kind == "dense" else 1
    tile_n = _pick_tile_n(k, npk, dbytes)
    grid = (npk // tile_n, t_total)  # n OUTER, row tiles INNER (see module doc)

    has_min = min_ is not None
    has_lut = lut is not None
    in_specs = [
        pl.BlockSpec((tile_m, k), lambda n, i, te_r: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k, tile_n), lambda n, i, te_r: (te_r[i], 0, n),
                     memory_space=pltpu.VMEM),
    ]
    args = [xs.astype(jnp.bfloat16), qs]
    if kind != "dense":
        in_specs.append(pl.BlockSpec(
            (1, pack, k // group, tile_n),
            lambda n, i, te_r: (te_r[i], 0, 0, n), memory_space=pltpu.VMEM))
        args.append(scale)
        if has_min:
            in_specs.append(pl.BlockSpec(
                (1, pack, k // group, tile_n),
                lambda n, i, te_r: (te_r[i], 0, 0, n),
                memory_space=pltpu.VMEM))
            args.append(min_)
        if has_lut:
            in_specs.append(pl.BlockSpec(
                (1, n_lut), lambda n, i, te_r: (0, 0),
                memory_space=pltpu.VMEM))
            args.append(lut.reshape(1, n_lut))

    kernel = functools.partial(
        _gmm_dispatch, kind=kind, group=group, pack=pack, n_lut=n_lut,
        has_min=has_min, has_lut=has_lut)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, pack, tile_n),
                               lambda n, i, te_r: (i, 0, n),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rp, pack, npk), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * k * npk * pack,
            bytes_accessed=qs.size * dbytes + rp * k * 2 + rp * npk * pack * 4,
            transcendentals=0,
        ),
    )(te, *args)
    return out


def gmm_apply(xs: jax.Array, qt: QTensor, tile_expert: jax.Array,
              tile_m: int, interpret: bool = False) -> jax.Array:
    """Scratch-row grouped matmul: xs [Rp, K] already-gathered rows, each
    row-tile i computed against expert tile_expert[i]'s planes. Returns
    [Rp, n_orig] f32 — still in scratch-row order (no combine), so chained
    projections (gate -> act -> down) stay in scratch space and pay the
    gather/scatter exactly once per MoE block."""
    qs = jnp.asarray(qt.qs)
    scale = None if qt.scale is None else jnp.asarray(qt.scale)
    min_ = None if qt.min_ is None else jnp.asarray(qt.min_)
    lut = None if qt.lut is None else jnp.asarray(qt.lut, jnp.float32)
    n_lut = 0 if lut is None else int(lut.shape[0])
    y3 = _gmm_call(xs, tile_expert, qs, scale, min_, lut,
                   kind=qt.kind, group=qt.group, pack=qt.pack, n_lut=n_lut,
                   tile_m=tile_m, interpret=interpret)
    return y3.reshape(y3.shape[0], -1)[:, : qt.n_orig]    # h-major cols


def gmm_apply_split(xs: jax.Array, qt: QTensor, tile_expert: jax.Array,
                    tile_m: int, interpret: bool = False) -> list[jax.Array]:
    """gmm_apply over a fuse_expert_qtensors plane: ONE grouped kernel pass
    for gate|up, sliced back into per-constituent [Rp, n_orig_i] outputs
    (the MUL_MAT_ID analogue of qmatmul.qmm_split)."""
    assert qt.parts is not None, "gmm_apply_split needs a fused QTensor"
    qs = jnp.asarray(qt.qs)
    scale = None if qt.scale is None else jnp.asarray(qt.scale)
    min_ = None if qt.min_ is None else jnp.asarray(qt.min_)
    lut = None if qt.lut is None else jnp.asarray(qt.lut, jnp.float32)
    n_lut = 0 if lut is None else int(lut.shape[0])
    y3 = _gmm_call(xs, tile_expert, qs, scale, min_, lut,
                   kind=qt.kind, group=qt.group, pack=qt.pack, n_lut=n_lut,
                   tile_m=tile_m, interpret=interpret)
    m = y3.shape[0]
    outs, off = [], 0
    for npk_i, n_orig_i in qt.parts:
        yi = y3[:, :, off:off + npk_i].reshape(m, qt.pack * npk_i)
        outs.append(yi[:, :n_orig_i])
        off += npk_i
    return outs


def gmm(x: jax.Array, qt: QTensor, routing: Routing, *, tile_m: int,
        interpret: bool = False) -> jax.Array:
    """Grouped matmul: x [M, K] tokens, qt stacked expert planes
    ([E_loc, ...] leaves, layout 't'), routing from route_tokens.
    Returns combined [M, n_orig] f32."""
    m = x.shape[0]
    xs = x[routing.tok_idx]                               # [Rp, K]
    y = gmm_apply(xs, qt, routing.tile_expert, tile_m, interpret)
    return combine(y, routing, m)


def gmm_xla(x: jax.Array, qt: QTensor, routing: Routing) -> jax.Array:
    """Pure-XLA reference: dequantize each expert's planes and run the same
    scratch-batch matmul (per-row expert gather). Used on CPU and as the
    conformance golden."""
    from .qmatmul import _dequant_t

    m = x.shape[0]
    e_loc = qt.qs.shape[0]
    xs = x[routing.tok_idx].astype(jnp.bfloat16)
    if qt.kind == "dense":
        w_all = jnp.asarray(qt.qs, jnp.bfloat16)          # [E, K, N]
    else:
        w_all = jnp.stack([
            _dequant_t(
                jnp.asarray(qt.qs[e]),
                None if qt.scale is None else jnp.asarray(qt.scale[e]),
                None if qt.min_ is None else jnp.asarray(qt.min_[e]),
                None if qt.lut is None else jnp.asarray(qt.lut, jnp.float32),
                kind=qt.kind, group=qt.group)
            for e in range(e_loc)])
    tile_m = xs.shape[0] // routing.tile_expert.shape[0]
    row_e = jnp.repeat(routing.tile_expert, tile_m)       # [Rp]
    w_rows = w_all[row_e]                                 # [Rp, K, N]
    y = jnp.einsum("rk,rkn->rn", xs, w_rows,
                   preferred_element_type=jnp.float32)
    return combine(y, routing, m)[:, : qt.n_orig]
