"""Tensor/data-parallel step functions via shard_map.

Wraps the engine's forward over a ('dp', 'tp') mesh:
  - weights: column tensors P('tp', ...) on plane axis 0, row tensors
    P(..., 'tp') on the K axis, norms/embedding replicated
  - KV pools: kv-head axis sharded over 'tp', batch replicated within dp group
  - batch inputs: sharded over 'dp'
  - collectives: psum after row-parallel matmuls, tiled all_gather for logits
    (models/llama.py forward_layer/lm_head) — XLA schedules them on ICI and
    overlaps with compute (the NCCL/split-buffer analogue,
    SURVEY.md §2.4 row-split TP).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.hparams import HParams
from ..models.llama import LayerWeights, LlamaWeights
from ..quant.repack import QTensor
from ..runtime.kv_cache import KVPools

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _qt_spec(qt: QTensor | None, mode: str) -> QTensor | None:
    """Build a QTensor-shaped pytree of PartitionSpecs matching qt's leaves.

    mode: 'col' (output/N axis sharded), 'row' (contraction/K axis sharded),
    'rep' (replicated). 3D expert tensors get a leading None.

    Plane axes by layout:
      't'    — qs [.., K, NPK]: N shard = last axis, K shard = axis -2
      'rows' — qs [.., NPK, K]: N shard = axis -2,  K shard = last axis
    scale/min are group-major [pack, G, npk] either way:
      N shard = npk axis (-1); K shard = G axis (-2)
    """
    if qt is None:
        return None
    t = qt.layout == "t"

    def spec(arr, shard_axis):
        if arr is None:
            return None
        dims = [None] * arr.ndim
        if shard_axis is not None:
            dims[shard_axis] = "tp"
        return P(*dims)

    if mode == "rep":
        qs = spec(qt.qs, None)
        sc = spec(qt.scale, None)
        mn = spec(qt.min_, None)
    elif mode == "col":
        qs = spec(qt.qs, qt.qs.ndim - 1 if t else qt.qs.ndim - 2)
        sc = spec(qt.scale, qt.scale.ndim - 1) if qt.scale is not None else None
        mn = spec(qt.min_, qt.min_.ndim - 1) if qt.min_ is not None else None
    else:  # row: contraction dim
        qs = spec(qt.qs, qt.qs.ndim - 2 if t else qt.qs.ndim - 1)
        sc = spec(qt.scale, qt.scale.ndim - 2) if qt.scale is not None else None
        mn = spec(qt.min_, qt.min_.ndim - 2) if qt.min_ is not None else None
    lut = P(None) if qt.lut is not None else None
    return QTensor(qt.kind, qt.shape, qt.n_orig, qt.group, qs, sc, mn, lut,
                   qt.ggml_type, qt.layout, qt.parts)


def weight_pspecs(w: LlamaWeights) -> LlamaWeights:
    """LlamaWeights-shaped pytree of PartitionSpecs (shard_map in_specs)."""
    def layer_spec(lw: LayerWeights) -> LayerWeights:
        return LayerWeights(
            attn_norm=P(None),
            wq=_qt_spec(lw.wq, "col"),
            wk=_qt_spec(lw.wk, "col"),
            wv=_qt_spec(lw.wv, "col"),
            wo=_qt_spec(lw.wo, "row"),
            ffn_norm=P(None),
            w_gate=_qt_spec(lw.w_gate, "col"),
            w_up=_qt_spec(lw.w_up, "col"),
            w_down=_qt_spec(lw.w_down, "row"),
            gate_inp=_qt_spec(lw.gate_inp, "rep"),
            gate_exps=_qt_spec(lw.gate_exps, "col"),
            up_exps=_qt_spec(lw.up_exps, "col"),
            down_exps=_qt_spec(lw.down_exps, "row"),
            gate_inp_shexp=(None if lw.gate_inp_shexp is None else P(None)),
            gate_shexp=_qt_spec(lw.gate_shexp, "rep"),
            up_shexp=_qt_spec(lw.up_shexp, "rep"),
            down_shexp=_qt_spec(lw.down_shexp, "rep"),
            bq=None if lw.bq is None else P("tp"),
            bk=None if lw.bk is None else P("tp"),
            bv=None if lw.bv is None else P("tp"),
        )

    return LlamaWeights(
        tok_embd=_qt_spec(w.tok_embd, "rep"),
        output_norm=None if w.output_norm is None else P(None),
        output=_qt_spec(w.output, "col"),
        layers=[layer_spec(lw) for lw in w.layers],
        rope_inv_freq=P(None),
        rope_mscale=w.rope_mscale,
        rope_inv_freq_swa=None if w.rope_inv_freq_swa is None else P(None),
        rope_inv_freq_long=(None if w.rope_inv_freq_long is None
                            else P(None)),
    )


def pools_pspecs(pools: KVPools) -> KVPools:
    """KV pools: kv heads sharded over 'tp', block pool sharded over 'dp'.

    Each dp group owns a private block pool (its sequences' block tables hold
    group-local block ids), so pool writes never need cross-dp reconciliation
    — the mesh analogue of independent engine replicas sharing weights.
    Quantized (q8_0) pools shard their per-slot scales the same way.
    """
    spec = P("tp", "dp", None, None)
    sspec = P("tp", "dp", None)
    return KVPools(
        k=[spec for _ in pools.k],
        v=[spec for _ in pools.v],
        k_scale=None if pools.k_scale is None else
        [sspec for _ in pools.k_scale],
        v_scale=None if pools.v_scale is None else
        [sspec for _ in pools.v_scale],
    )


def shard_weights(w: LlamaWeights, mesh: Mesh) -> LlamaWeights:
    """device_put every weight with its NamedSharding."""
    specs = weight_pspecs(w)

    def put(arr, spec):
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, w, specs)


def shard_pools(pools: KVPools, mesh: Mesh) -> KVPools:
    s = NamedSharding(mesh, P("tp", "dp", None, None))
    ss = NamedSharding(mesh, P("tp", "dp", None))
    return KVPools(
        k=[jax.device_put(p, s) for p in pools.k],
        v=[jax.device_put(p, s) for p in pools.v],
        k_scale=None if pools.k_scale is None else
        [jax.device_put(p, ss) for p in pools.k_scale],
        v_scale=None if pools.v_scale is None else
        [jax.device_put(p, ss) for p in pools.v_scale],
    )


def build_shift_step(hp: HParams, mesh: Mesh, w_template: LlamaWeights,
                     pools_template: KVPools):
    """shard_map'ed K-shift (context shift / Self-Extend re-rotation) over
    the ('dp','tp') mesh: src/dst/delta are [dp, n] group-local slot arrays
    (-1 pads). Each tp shard re-rotates its own kv heads; rope tables are
    replicated. The mesh analogue of kv_cache.apply_shift (reference
    llama-context.cpp:719-755 kv_self_update)."""
    from ..runtime import kv_cache

    pspec = pools_pspecs(pools_template)
    swa = w_template.rope_inv_freq_swa is not None

    def body(pools, src, dst, delta, inv_freq, mscale, inv_freq_swa):
        return kv_cache.apply_shift(
            pools, src[0], dst[0], delta[0], inv_freq, mscale[0],
            inv_freq_swa, hp=hp)

    in_specs = (pspec, P("dp"), P("dp"), P("dp"), P(None), P(None),
                P(None) if swa else None)

    def body_noswa(pools, src, dst, delta, inv_freq, mscale):
        return kv_cache.apply_shift(
            pools, src[0], dst[0], delta[0], inv_freq, mscale[0],
            None, hp=hp)

    if swa:
        fn = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=pspec,
                       check_vma=False)
    else:
        fn = shard_map(body_noswa, mesh=mesh, in_specs=in_specs[:-1],
                       out_specs=pspec, check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))


def build_copy_step(mesh: Mesh, pools_template: KVPools):
    """shard_map'ed COW block-copy: src/dst are [dp, C] group-local block id
    arrays (-1 pads)."""
    from ..runtime import kv_cache

    pspec = pools_pspecs(pools_template)

    def body(pools, src, dst):
        cb = lambda ps: None if ps is None else [
            kv_cache.copy_blocks(p, src[0], dst[0]) for p in ps]
        return KVPools(cb(pools.k), cb(pools.v), cb(pools.k_scale),
                       cb(pools.v_scale))

    fn = shard_map(body, mesh=mesh, in_specs=(pspec, P("dp"), P("dp")),
                   out_specs=pspec, check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))


def build_window_step(hp: HParams, mesh: Mesh, w_template: LlamaWeights,
                      pools_template: KVPools):
    """Windowed decode+sample on the ('dp','tp') mesh: the shard_map analogue
    of engine._decode_window_step. Returns make(n_steps) -> step fn; steps
    are cached per window length.

    Each dp group decodes its own batch shard; every tp shard of a group
    computes identical logits (lm_head all-gathers over 'tp') and identical
    samples (the PRNG key is replicated), so KV writes stay consistent
    without cross-device token exchange. This removes the scheduler's
    meshed-server regression to per-token host round trips
    (reference analogue: the tight loop of examples/main/main.cpp)."""
    from ..runtime import engine as eng
    from ..runtime import device_sampling as ds
    from ..models import llama as llama_mod

    tp = mesh.shape["tp"]
    wspec = weight_pspecs(w_template)
    pspec = pools_pspecs(pools_template)
    batch = P("dp")
    pparams = ds.DeviceSamplerParams(*([batch] * 9))

    @functools.lru_cache(maxsize=8)
    def make(n_steps: int):
        def body(w, pools, tok0, pos0, block_table, valid, params, hist0,
                 key):
            bs = pools.block_size

            def step(carry, _):
                pools, tok, pos, hist = carry
                slots = (jnp.take_along_axis(
                    block_table, (pos // bs)[:, None], axis=1)[:, 0] * bs
                    + pos % bs)
                slots = jnp.where(valid, slots, -1)
                x, pools = eng._forward(
                    w, pools, tok[:, None], pos[:, None], block_table,
                    slots[:, None], pos + 1, hp=hp, decode=True,
                    tp_axis="tp", tp=tp)
                logits = llama_mod.lm_head(w, hp, x, tp_axis="tp")[:, 0]
                hist = ds.push_history(hist, tok)
                nxt = ds.sample_tokens(logits.astype(jnp.float32), params,
                                       hist, key, pos)
                return (pools, nxt, pos + 1, hist), nxt

            (pools, _, _, hist), toks = jax.lax.scan(
                step, (pools, tok0, pos0, hist0), None, length=n_steps)
            return toks, hist, pools

        fn = shard_map(
            body, mesh=mesh,
            in_specs=(wspec, pspec, batch, batch, batch, batch, pparams,
                      batch, P()),
            out_specs=(P(None, "dp"), batch, pspec), check_vma=False)
        return jax.jit(fn, donate_argnums=(1,))

    return make


def build_tp_steps(hp: HParams, mesh: Mesh, w_template: LlamaWeights,
                   pools_template: KVPools):
    """Returns (prefill_step, prefill_all_step, decode_step) shard_map'ed over
    the mesh. Call signatures match runtime.engine's jitted steps."""
    from ..runtime import engine as eng
    from ..models import llama as llama_mod

    tp = mesh.shape["tp"]
    wspec = weight_pspecs(w_template)
    pspec = pools_pspecs(pools_template)
    batch = P("dp")          # [B, ...] sharded over dp
    rep = P()

    def mk(decode: bool, all_logits: bool, with_last_ix: bool,
           with_rd: bool = False):
        in_specs = (wspec, pspec, batch, batch, batch, batch, batch) + \
            ((batch,) if with_last_ix else ()) + \
            ((batch,) if with_rd else ())
        out_specs = (batch, pspec)

        def body(w, pools, tokens, positions, block_table, slots, kv_len,
                 *rest):
            rest = list(rest)
            last_ix = rest.pop(0) if with_last_ix else None
            rd = rest.pop(0) if with_rd else None
            x, pools = eng._forward(
                w, pools, tokens, positions, block_table, slots, kv_len,
                hp=hp, decode=decode, tp_axis="tp", tp=tp, rope_delta=rd)
            if decode:
                logits = llama_mod.lm_head(w, hp, x, tp_axis="tp")[:, 0]
            elif all_logits:
                logits = llama_mod.lm_head(w, hp, x, tp_axis="tp")
            else:
                h_last = jnp.take_along_axis(
                    x, last_ix[:, None, None], axis=1)[:, 0]
                logits = llama_mod.lm_head(
                    w, hp, h_last[:, None], tp_axis="tp")[:, 0]
            return logits, pools

        # check_vma off: the replication checker cannot see through the
        # nested jits inside qmm; specs are validated by tests/test_parallel
        fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        return jax.jit(fn, donate_argnums=(1,))

    prefill = mk(decode=False, all_logits=False, with_last_ix=True)
    prefill_all = mk(decode=False, all_logits=True, with_last_ix=False)
    decode = mk(decode=True, all_logits=False, with_last_ix=False)
    # rope_delta variants: Self-Extend's grouped repositioning offset
    # (SeqState.pos_offset) threaded through the mesh steps
    prefill_rd = mk(decode=False, all_logits=False, with_last_ix=True,
                    with_rd=True)
    decode_rd = mk(decode=True, all_logits=False, with_last_ix=False,
                   with_rd=True)
    return prefill, prefill_all, decode, prefill_rd, decode_rd


def build_embed_step(hp: HParams, mesh: Mesh, w_template: LlamaWeights,
                     pools_template: KVPools, pooling: str):
    """shard_map'ed pooled-embedding prefill (the llama_get_embeddings
    path on the ('dp','tp') mesh)."""
    from ..models import llama as llama_mod
    from ..ops import layers as _layers
    from ..runtime import engine as eng

    tp = mesh.shape["tp"]
    wspec = weight_pspecs(w_template)
    pspec = pools_pspecs(pools_template)
    batch = P("dp")

    def body(w, pools, tokens, positions, block_table, slots, kv_len,
             n_valid):
        x, pools = eng._forward(
            w, pools, tokens, positions, block_table, slots, kv_len,
            hp=hp, decode=False, tp_axis="tp", tp=tp)
        x = llama_mod.final_norm(w, hp, x).astype(jnp.float32)
        tpos = jnp.arange(x.shape[1])[None, :]
        valid = tpos < n_valid[:, None]
        if pooling == "mean":
            emb = jnp.sum(jnp.where(valid[..., None], x, 0.0), axis=1) / \
                jnp.maximum(n_valid[:, None], 1)
        elif pooling == "cls":
            emb = x[:, 0]
        else:  # last
            emb = jnp.take_along_axis(
                x, jnp.maximum(n_valid - 1, 0)[:, None, None], axis=1)[:, 0]
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb, pools

    fn = shard_map(body, mesh=mesh,
                   in_specs=(wspec, pspec) + (batch,) * 6,
                   out_specs=(batch, pspec), check_vma=False)
    return jax.jit(fn, donate_argnums=(1,))


def build_nll_step(hp: HParams, mesh: Mesh, w_template: LlamaWeights,
                   pools_template: KVPools):
    """shard_map'ed per-position NLL prefill (perplexity path on the
    ('dp','tp') mesh — only [B, T] floats leave the device)."""
    from ..models import llama as llama_mod
    from ..runtime import engine as eng

    tp = mesh.shape["tp"]
    wspec = weight_pspecs(w_template)
    pspec = pools_pspecs(pools_template)
    batch = P("dp")

    def body(w, pools, tokens, positions, block_table, slots, kv_len,
             targets, valid):
        x, pools = eng._forward(
            w, pools, tokens, positions, block_table, slots, kv_len,
            hp=hp, decode=False, tp_axis="tp", tp=tp)
        logits = llama_mod.lm_head(w, hp, x, tp_axis="tp")
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.where(valid, nll, 0.0), pools

    fn = shard_map(body, mesh=mesh,
                   in_specs=(wspec, pspec) + (batch,) * 7,
                   out_specs=(batch, pspec), check_vma=False)
    return jax.jit(fn, donate_argnums=(1,))
