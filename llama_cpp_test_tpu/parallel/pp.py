"""Full model parallelism: dp x pp x sp x ep x tp mesh step functions.

Generalizes parallel/tp.py to the remaining parallel dimensions the reference
either has natively or that the TPU mesh makes first-class (SURVEY.md §2.4):

  dp — data parallel: batch rows + private KV block pools per group
       (the analogue of independent engine replicas sharing weights).
  pp — pipeline parallel over layer stages: contiguous layer ranges per
       device (the LLAMA_SPLIT_MODE_LAYER analogue, reference
       src/llama-model.cpp:1361-1415) with microbatch double-buffering over
       jax.lax.ppermute — the scheduler's n_copies pipeline
       (ggml-backend.cpp:662-667,1380-1476) re-done as an SPMD program.
  sp — sequence parallel: prefill token axis sharded; per layer the freshly
       projected K/V chunks are all-gathered over 'sp' before the paged-pool
       scatter so every replica holds the full cache, while norms/FFN/matmuls
       run on the local token chunk only.
  ep — expert parallel for MoE: the expert dim of ffn_*_exps is sharded; each
       device computes its local experts' masked contribution and the results
       are psum'ed (the sharded MUL_MAT_ID the reference lacks — SURVEY §2.4
       "experts not sharded across devices").
  tp — Megatron tensor parallel (column/row sharded planes, parallel/tp.py).

Layer weights are *stacked*: every LayerWeights leaf gains a leading L dim so
the layer axis can be sharded over 'pp' (L % pp == 0). Inside the shard_map
body each stage slices its local layers one at a time.

Pipeline schedule (S stages, M = S microbatches over the batch axis):
  tick t in [0, M+S-1): stage s processes microbatch m = t - s; stage 0
  ingests embeddings, ppermute passes activations s -> s+1, the last stage
  accumulates logits. Invalid (m out of range) ticks run with slot ids -1 so
  their KV writes drop out (the write_kv scatter 'drop' mode).
"""
from __future__ import annotations

import functools
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.hparams import HParams
from ..models.llama import LayerWeights, LlamaWeights
from ..quant.repack import QTensor
from .tp import _qt_spec

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

MP_AXES = ("dp", "pp", "sp", "ep", "tp")


def choose_parallel(n_devices: int, hp) -> dict:
    """Factor n_devices over the five axes under model-shape constraints:
    tp | n_head_kv, ep | n_expert (MoE only), pp | n_layer, sp and dp free."""
    left = n_devices
    axes = dict(dp=1, pp=1, sp=1, ep=1, tp=1)
    if left % 2 == 0 and hp.n_head_kv % 2 == 0:
        axes["tp"] = 2
        left //= 2
    if hp.n_expert and left % 2 == 0 and hp.n_expert % 2 == 0:
        axes["ep"] = 2
        left //= 2
    if left % 2 == 0 and hp.n_layer % 2 == 0:
        axes["pp"] = 2
        left //= 2
    if left % 2 == 0:
        axes["sp"] = 2
        left //= 2
    axes["dp"] = left
    return axes


def make_mp_mesh(dp=1, pp=1, sp=1, ep=1, tp=1, devices=None) -> Mesh:
    """Mesh with ('dp','pp','sp','ep','tp') axes; tp minor (ICI-adjacent)."""
    if devices is None:
        devices = jax.devices()
    n = dp * pp * sp * ep * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, pp, sp, ep, tp)
    return Mesh(arr, MP_AXES)


# ---------------------------------------------------------------------------
# stacked pools


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MPPools:
    """Layer-stacked KV pools: [n_layer, n_kv_heads, NB, BS, D] bf16 (or
    int8 with per-slot f32 scales for q8_0 KV), sharded P('pp','tp','dp')."""
    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None = None   # [L, KV, NB, BS] f32 (q8_0 KV)
    v_scale: jax.Array | None = None

    @property
    def num_blocks(self) -> int:
        return self.k.shape[2]

    @property
    def block_size(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


_POOL_SPEC = P("pp", "tp", "dp", None, None)
_SCALE_SPEC = P("pp", "tp", "dp", None)


def _mp_pool_specs(quantized: bool) -> MPPools:
    if quantized:
        return MPPools(_POOL_SPEC, _POOL_SPEC, _SCALE_SPEC, _SCALE_SPEC)
    return MPPools(_POOL_SPEC, _POOL_SPEC)


def new_mp_pools(hp: HParams, num_blocks: int, block_size: int,
                 mesh: Mesh, kv_type: str = "bf16") -> MPPools:
    shape = (hp.n_layer, hp.n_head_kv, num_blocks, block_size, hp.head_dim)
    s = NamedSharding(mesh, _POOL_SPEC)
    if kv_type == "q8_0":
        ss = NamedSharding(mesh, _SCALE_SPEC)
        return MPPools(
            k=jax.device_put(jnp.zeros(shape, jnp.int8), s),
            v=jax.device_put(jnp.zeros(shape, jnp.int8), s),
            k_scale=jax.device_put(jnp.zeros(shape[:4], jnp.float32), ss),
            v_scale=jax.device_put(jnp.zeros(shape[:4], jnp.float32), ss))
    if kv_type not in ("bf16", "f16"):
        raise ValueError(f"kv_type {kv_type!r} (supported: bf16, f16, q8_0)")
    dt = jnp.float16 if kv_type == "f16" else jnp.bfloat16
    z = jax.device_put(jnp.zeros(shape, dt), s)
    return MPPools(k=z, v=jax.device_put(jnp.zeros(shape, dt), s))


# ---------------------------------------------------------------------------
# stacked weights


def _tree_index(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


def stack_layers(layers: list[LayerWeights]) -> LayerWeights:
    """Stack homogeneous per-layer leaves along a new leading L axis."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *layers)


def _mp_qt_spec(qt: QTensor | None, mode: str) -> QTensor | None:
    """PartitionSpec tree for a *stacked* QTensor (leading L axis): 'pp' on
    the layer axis, 'ep' on the expert axis (expert stacks), tp placement
    from tp.py's per-layer _qt_spec."""
    if qt is None:
        return None
    # per-layer view so _qt_spec sees the ranks it was written for
    sl = lambda a: None if a is None else a[0]
    per = QTensor(qt.kind, qt.shape, qt.n_orig, qt.group,
                  sl(qt.qs), sl(qt.scale), sl(qt.min_), sl(qt.lut),
                  qt.ggml_type, qt.layout, qt.parts)
    base = _qt_spec(per, mode)
    expert = per.qs.ndim == 3  # [E, K-or-N, plane] expert stack

    def lift(spec, arr, has_e):
        if arr is None:
            return None
        s = tuple(spec) if spec is not None else ()
        s = s + (None,) * (arr.ndim - 1 - len(s))
        if has_e:
            s = ("ep",) + s[1:]
        return P("pp", *s)

    return QTensor(
        qt.kind, qt.shape, qt.n_orig, qt.group,
        lift(base.qs, qt.qs, expert),
        lift(base.scale, qt.scale, expert),
        lift(base.min_, qt.min_, expert),
        lift(base.lut, qt.lut, False),
        qt.ggml_type, qt.layout, qt.parts,
    )


def stacked_layer_pspecs(st: LayerWeights) -> LayerWeights:
    """Spec tree for the stacked LayerWeights."""
    return LayerWeights(
        attn_norm=P("pp"),
        wq=_mp_qt_spec(st.wq, "col"),
        wk=_mp_qt_spec(st.wk, "col"),
        wv=_mp_qt_spec(st.wv, "col"),
        wo=_mp_qt_spec(st.wo, "row"),
        ffn_norm=P("pp"),
        w_gate=_mp_qt_spec(st.w_gate, "col"),
        w_up=_mp_qt_spec(st.w_up, "col"),
        w_down=_mp_qt_spec(st.w_down, "row"),
        gate_inp=_mp_qt_spec(st.gate_inp, "rep"),
        gate_exps=_mp_qt_spec(st.gate_exps, "col"),
        up_exps=_mp_qt_spec(st.up_exps, "col"),
        gateup_exps=_mp_qt_spec(st.gateup_exps, "col"),
        down_exps=_mp_qt_spec(st.down_exps, "row"),
        gate_inp_shexp=(None if st.gate_inp_shexp is None else P("pp")),
        gate_shexp=_mp_qt_spec(st.gate_shexp, "rep"),
        up_shexp=_mp_qt_spec(st.up_shexp, "rep"),
        down_shexp=_mp_qt_spec(st.down_shexp, "rep"),
        bq=None if st.bq is None else P("pp", "tp"),
        bk=None if st.bk is None else P("pp", "tp"),
        bv=None if st.bv is None else P("pp", "tp"),
        wqkv=_mp_qt_spec(st.wqkv, "col"),
        w_gateup=_mp_qt_spec(st.w_gateup, "col"),
    )


def mp_weight_pspecs(w: LlamaWeights) -> LlamaWeights:
    """Spec tree for LlamaWeights whose layers == [stacked LayerWeights]."""
    return LlamaWeights(
        tok_embd=_qt_spec(w.tok_embd, "rep"),
        output_norm=None if w.output_norm is None else P(None),
        output=_qt_spec(w.output, "col"),
        layers=[stacked_layer_pspecs(w.layers[0])],
        rope_inv_freq=P(None),
        rope_mscale=w.rope_mscale,
        rope_inv_freq_swa=None if w.rope_inv_freq_swa is None else P(None),
        rope_inv_freq_long=(None if w.rope_inv_freq_long is None
                            else P(None)),
    )


def shard_mp_weights(w: LlamaWeights, mesh: Mesh) -> LlamaWeights:
    """Stack per-layer weights along L, device_put with mp NamedShardings.
    Requires n_layer % pp == 0 and (for MoE) n_expert % ep == 0."""
    stacked = LlamaWeights(
        tok_embd=w.tok_embd,
        output_norm=w.output_norm,
        output=w.output,
        layers=[stack_layers(w.layers)],
        rope_inv_freq=w.rope_inv_freq,
        rope_mscale=w.rope_mscale,
        rope_inv_freq_swa=w.rope_inv_freq_swa,
        rope_inv_freq_long=w.rope_inv_freq_long,
    )
    specs = mp_weight_pspecs(stacked)

    def put(arr, spec):
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, stacked, specs)


# ---------------------------------------------------------------------------
# step builders


def build_mp_steps(hp: HParams, mesh: Mesh, w_template: LlamaWeights,
                   pools_template: MPPools):
    """Returns (prefill_step, decode_step, copy_step) shard_map'ed over the
    5-axis mesh. Batch layout: B = dp * M * B_mb rows (M = pp microbatches);
    prefill token axis T must be divisible by sp."""
    from ..models import llama as llama_mod
    from ..runtime import kv_cache
    import math

    S = int(mesh.shape["pp"])
    SP = int(mesh.shape["sp"])
    EP = int(mesh.shape["ep"])
    TP = int(mesh.shape["tp"])
    M = S  # microbatch count == stage count (full pipeline occupancy)
    wspec = mp_weight_pspecs(w_template)
    from ..models.hparams import attn_scale_of, layer_window
    scale = attn_scale_of(hp)
    if not hp.uniform_layers:
        # stacked layer planes require identical shapes on every layer
        raise NotImplementedError(
            f"{hp.arch} has per-layer head/ffn geometry (openelm/deci) — "
            "the stacked-plane pipeline mesh cannot shard ragged layers; "
            "run single-device")
    n_local_layers = hp.n_layer // S
    if hp.swa_pattern > 1 and n_local_layers % hp.swa_pattern:
        # per-layer windows must repeat identically on every stage (the
        # shard_map body is one program for all stages)
        raise NotImplementedError(
            f"pp over swa_pattern={hp.swa_pattern}: layers-per-stage "
            f"({n_local_layers}) must be a multiple of the pattern")
    perm = [(i, (i + 1) % S) for i in range(S)]

    quantized = pools_template.quantized

    def run_stage_layers(w, k_pool, v_pool, k_scale, v_scale, x, positions,
                         block_table, slots, kv_len, decode):
        """Apply this stage's local layers to x, writing local KV pools
        (bf16, or q8_0 with quantizing scatters + dequantizing reads)."""
        st = w.layers[0]
        n_local = k_pool.shape[0]
        for l in range(n_local):
            lw = _tree_index(st, l)

            wind = layer_window(hp, l)  # == layer_window for the global
            # index since swa_pattern | n_local (checked at build)

            def attend(q, k_cur, v_cur, _l=l, _w=wind):
                nonlocal k_pool, v_pool, k_scale, v_scale
                if SP > 1 and not decode:
                    k_all = jax.lax.all_gather(k_cur, "sp", axis=1, tiled=True)
                    v_all = jax.lax.all_gather(v_cur, "sp", axis=1, tiled=True)
                    s_all = jax.lax.all_gather(slots, "sp", axis=1, tiled=True)
                else:
                    k_all, v_all, s_all = k_cur, v_cur, slots
                if quantized:
                    kq, ksc = kv_cache.write_kv_q8(
                        k_pool[_l], k_scale[_l], k_all, s_all)
                    vq, vsc = kv_cache.write_kv_q8(
                        v_pool[_l], v_scale[_l], v_all, s_all)
                    k_pool = k_pool.at[_l].set(kq)
                    v_pool = v_pool.at[_l].set(vq)
                    k_scale = k_scale.at[_l].set(ksc)
                    v_scale = v_scale.at[_l].set(vsc)
                    if decode:
                        return kv_cache.attend_decode_q8(
                            q, k_pool[_l], k_scale[_l], v_pool[_l],
                            v_scale[_l], block_table, kv_len, scale, _w)
                    kk = kv_cache.gather_kv_q8(k_pool[_l], k_scale[_l],
                                               block_table)
                    vv = kv_cache.gather_kv_q8(v_pool[_l], v_scale[_l],
                                               block_table)
                    return kv_cache.attend_gathered(
                        q, kk, vv, positions, kv_len, scale, _w)
                k_pool = k_pool.at[_l].set(
                    kv_cache.write_kv(k_pool[_l], k_all, s_all))
                v_pool = v_pool.at[_l].set(
                    kv_cache.write_kv(v_pool[_l], v_all, s_all))
                if decode:
                    return kv_cache.attend_decode(
                        q, k_pool[_l], v_pool[_l], block_table, kv_len,
                        scale, _w)
                return kv_cache.attend_prefill(
                    q, k_pool[_l], v_pool[_l], block_table, positions,
                    kv_len, scale, _w)

            x = llama_mod.forward_layer(
                x, lw, hp, positions, w.inv_freq_for(wind), w.rope_mscale,
                attend, tp_axis="tp", tp=TP, ep_axis="ep", ep=EP)
        return k_pool, v_pool, k_scale, v_scale, x

    def pipeline_pass(w, pools, tokens, positions, block_table,
                      slots, kv_len, *, decode: bool, mode: str,
                      rest=(), pooling: str = "mean"):
        """One pipelined forward over all M microbatches. Returns
        (per-mode output [Bl, ...], k_pool, v_pool).

        Returns (per-mode output [Bl, ...], MPPools).
        mode: 'last'  — logits at last_ix (rest=(last_ix,)) or position 0
                        for decode; [Bl, V]
              'all'   — logits at EVERY position; [Bl, T, V] (the
                        speculative-verification pass, server.cpp:3250)
              'nll'   — per-position NLL of rest=(targets, valid); [Bl, T]
              'embed' — pooled normalized embeddings, rest=(n_valid,);
                        [Bl, C]
        """
        k_pool, v_pool = pools.k, pools.v
        k_scale, v_scale = pools.k_scale, pools.v_scale
        bl, t = tokens.shape
        b_mb = bl // M
        stage = jax.lax.axis_index("pp")
        emb = llama_mod.embed(w, tokens)  # [Bl, T, C]
        c = emb.shape[-1]

        def mb(a, m):
            a2 = a.reshape((M, b_mb) + a.shape[1:])
            return jax.lax.dynamic_index_in_dim(a2, m, 0, keepdims=False)

        # lm_head all-gathers over tp, so accumulated rows are full-width
        # (n_orig is the per-shard local width under tp)
        v_dim = w.output.n_orig * (TP if TP > 1 else 1)
        if mode == "last":
            out = jnp.zeros((M, b_mb, v_dim), jnp.float32)
        elif mode == "all":
            out = jnp.zeros((M, b_mb, t * (SP if not decode else 1), v_dim),
                            jnp.float32)
        elif mode == "nll":
            out = jnp.zeros((M, b_mb, t * SP), jnp.float32)
        else:  # embed
            out = jnp.zeros((M, b_mb, c), jnp.float32)
        state = jnp.zeros((b_mb, t, c), emb.dtype)
        for tick in range(M + S - 1):
            m = tick - stage
            valid = (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1)
            x_in = mb(emb, mc)
            state = jnp.where(stage == 0, x_in, state)
            pos_m = mb(positions, mc)
            bt_m = mb(block_table, mc)
            slots_m = jnp.where(valid, mb(slots, mc), -1)
            kvl_m = mb(kv_len, mc)
            k_pool, v_pool, k_scale, v_scale, x = run_stage_layers(
                w, k_pool, v_pool, k_scale, v_scale, state, pos_m, bt_m,
                slots_m, kvl_m, decode)
            nxt = jax.lax.ppermute(x, "pp", perm) if S > 1 else x
            # last stage: this tick's microbatch contribution
            xg = x
            if SP > 1 and not decode and mode != "last":
                xg = jax.lax.all_gather(x, "sp", axis=1, tiled=True)
            if mode == "last":
                if decode:
                    h_last = x[:, 0][:, None]
                else:
                    (last_ix,) = rest
                    xs = jax.lax.all_gather(x, "sp", axis=1, tiled=True) \
                        if SP > 1 else x
                    li = mb(last_ix, mc)
                    h_last = jnp.take_along_axis(xs, li[:, None, None],
                                                 axis=1)
                contrib = llama_mod.lm_head(
                    w, hp, h_last, tp_axis="tp" if TP > 1 else None)[:, 0]
            elif mode == "all":
                contrib = llama_mod.lm_head(
                    w, hp, xg, tp_axis="tp" if TP > 1 else None)
            elif mode == "nll":
                targets, tvalid = rest
                tg, tv = mb(targets, mc), mb(tvalid, mc)
                if SP > 1:  # xg is the gathered full token axis
                    tg = jax.lax.all_gather(tg, "sp", axis=1, tiled=True)
                    tv = jax.lax.all_gather(tv, "sp", axis=1, tiled=True)
                logits = llama_mod.lm_head(
                    w, hp, xg, tp_axis="tp" if TP > 1 else None)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(
                    logp, tg[..., None], axis=-1)[..., 0]
                contrib = jnp.where(tv, nll, 0.0)
            else:  # embed: final-norm + pool + L2 normalize
                from ..ops import layers as _layers

                (n_valid,) = rest
                nv = mb(n_valid, mc)
                xn = llama_mod.final_norm(w, hp, xg).astype(jnp.float32)
                tpos = jnp.arange(xn.shape[1])[None, :]
                vmask = tpos < nv[:, None]
                if pooling == "mean":
                    e = jnp.sum(jnp.where(vmask[..., None], xn, 0.0),
                                axis=1) / jnp.maximum(nv[:, None], 1)
                elif pooling == "cls":
                    e = xn[:, 0]
                else:  # last
                    e = jnp.take_along_axis(
                        xn, jnp.maximum(nv - 1, 0)[:, None, None],
                        axis=1)[:, 0]
                contrib = e / jnp.maximum(
                    jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
            contrib = jnp.where(valid & (stage == S - 1), contrib, 0.0)
            onehot = (jnp.arange(M) == mc).astype(jnp.float32)
            oh = onehot.reshape((M,) + (1,) * (out.ndim - 1))
            out = out + oh * contrib[None]
            state = nxt
        out = jax.lax.psum(out, "pp") if S > 1 else out
        return (out.reshape((bl,) + out.shape[2:]),
                MPPools(k_pool, v_pool, k_scale, v_scale))

    def mk(decode: bool, mode: str = "last", pooling: str = "mean"):
        # tokens/positions/slots: [B, T] — T sharded over sp in prefill
        tok_spec = P("dp", "sp") if (not decode and SP > 1) else P("dp", None)
        if mode == "last":
            rest_specs = () if decode else (P("dp"),)
        elif mode == "all":
            rest_specs = ()
        elif mode == "nll":
            rest_specs = (tok_spec, tok_spec)
        else:  # embed
            rest_specs = (P("dp"),)
        in_specs = (wspec, _mp_pool_specs(quantized), tok_spec,
                    tok_spec, P("dp", None), tok_spec, P("dp")) + rest_specs
        out_first = {"last": P("dp", None), "all": P("dp", None, None),
                     "nll": P("dp", None), "embed": P("dp", None)}[mode]
        out_specs = (out_first, _mp_pool_specs(quantized))

        def body(w, pools, tokens, positions, block_table, slots, kv_len,
                 *rest):
            out, pools = pipeline_pass(
                w, pools, tokens, positions, block_table, slots,
                kv_len, decode=decode, mode=mode, rest=rest, pooling=pooling)
            return out, pools

        fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        return jax.jit(fn, donate_argnums=(1,))

    def copy_body(pools, src, dst):
        s, d = src[0], dst[0]
        k = pools.k.at[:, :, d].set(pools.k[:, :, s], mode="drop")
        v = pools.v.at[:, :, d].set(pools.v[:, :, s], mode="drop")
        if not pools.quantized:
            return MPPools(k, v)
        ks = pools.k_scale.at[:, :, d].set(pools.k_scale[:, :, s],
                                           mode="drop")
        vs = pools.v_scale.at[:, :, d].set(pools.v_scale[:, :, s],
                                           mode="drop")
        return MPPools(k, v, ks, vs)

    copy_fn = shard_map(
        copy_body, mesh=mesh,
        in_specs=(_mp_pool_specs(quantized), P("dp"), P("dp")),
        out_specs=_mp_pool_specs(quantized), check_vma=False)

    def make_window(n_steps: int):
        """Windowed decode+sample on the 5-axis mesh (the engine
        decode-window analogue): each scan step is one full pipelined
        decode pass; logits are psum'ed over 'pp' so EVERY device holds
        them and samples identically (replicated key + dp-sharded params),
        keeping KV writes consistent without token exchange."""
        from ..runtime import device_sampling as ds

        bs_pool = pools_template.block_size
        pparams = ds.DeviceSamplerParams(*([P("dp")] * 9))

        def body(w, pools, tok0, pos0, block_table, valid, params, hist0,
                 key):
            def step(carry, _):
                pools, tok, pos, hist = carry
                slots = (jnp.take_along_axis(
                    block_table, (pos // bs_pool)[:, None], axis=1)[:, 0]
                    * bs_pool + pos % bs_pool)
                slots = jnp.where(valid, slots, -1)
                logits, pools = pipeline_pass(
                    w, pools, tok[:, None], pos[:, None],
                    block_table, slots[:, None], pos + 1,
                    decode=True, mode="last")
                hist = ds.push_history(hist, tok)
                nxt = ds.sample_tokens(logits.astype(jnp.float32), params,
                                       hist, key, pos)
                return (pools, nxt, pos + 1, hist), nxt

            (pools, _, _, hist), toks = jax.lax.scan(
                step, (pools, tok0, pos0, hist0), None,
                length=n_steps)
            return toks, hist, pools

        fn = shard_map(
            body, mesh=mesh,
            in_specs=(wspec, _mp_pool_specs(quantized), P("dp"),
                      P("dp"), P("dp", None), P("dp"), pparams, P("dp"),
                      P()),
            out_specs=(P(None, "dp"), P("dp"), _mp_pool_specs(quantized)),
            check_vma=False)
        return jax.jit(fn, donate_argnums=(1,))

    def shift_body(pools, src, dst, delta, inv_freq, mscale, *rest):
        """K-shift on the stacked pools (context shift / Self-Extend /
        compact_reuse): move slots src->dst re-rotating K by delta
        (kv_cache.apply_shift's per-layer loop over this stage's local
        layers; rope is additive so re-basing is exact)."""
        from ..ops import layers as _layers

        inv_freq_swa = rest[0] if rest else None
        s, d, dl = src[0], dst[0], delta[0]
        lcl, kvl, nb, bsz, hd = pools.k.shape
        k = pools.k
        v = pools.v
        kf = k.reshape(lcl, kvl, nb * bsz, hd)
        vf = v.reshape(lcl, kvl, nb * bsz, hd)
        ksf = vsf = None
        if pools.quantized:
            ksf = pools.k_scale.reshape(lcl, kvl, nb * bsz)
            vsf = pools.v_scale.reshape(lcl, kvl, nb * bsz)
        outs, ks_outs = [], []
        for l in range(lcl):
            ifr = inv_freq
            if inv_freq_swa is not None and layer_window(hp, l) > 0:
                ifr = inv_freq_swa
            kg = kf[l][:, s].astype(jnp.float32)          # [KV, n, D]
            if pools.quantized:
                kg = kg * ksf[l][:, s, None]              # dequantize
            kg = kg.transpose(1, 0, 2)[None]              # [1, n, KV, D]
            # unscaled delta rotation: stored K already carries mscale
            # (see runtime/kv_cache.py apply_shift)
            kg = _layers.apply_rope(kg, dl[None], ifr, 1.0)
            kg = kg[0].transpose(1, 0, 2)
            if pools.quantized:
                kq, ksc = kv_cache.quantize_q8(kg)        # requantize K
                outs.append(kf[l].at[:, d].set(kq, mode="drop"))
                ks_outs.append(ksf[l].at[:, d].set(ksc, mode="drop"))
            else:
                outs.append(kf[l].at[:, d].set(kg.astype(k.dtype),
                                               mode="drop"))
        kf = jnp.stack(outs)
        vf = vf.at[:, :, d].set(vf[:, :, s], mode="drop")
        if pools.quantized:
            ksf = jnp.stack(ks_outs)
            vsf = vsf.at[:, :, d].set(vsf[:, :, s], mode="drop")
            return MPPools(kf.reshape(k.shape), vf.reshape(v.shape),
                           ksf.reshape(pools.k_scale.shape),
                           vsf.reshape(pools.v_scale.shape))
        return MPPools(kf.reshape(k.shape), vf.reshape(v.shape))

    def make_shift(has_swa: bool):
        specs = (_mp_pool_specs(quantized), P("dp"), P("dp"),
                 P("dp"), P(), P()) + ((P(),) if has_swa else ())
        fn = shard_map(shift_body, mesh=mesh, in_specs=specs,
                       out_specs=_mp_pool_specs(quantized),
                       check_vma=False)
        return jax.jit(fn, donate_argnums=(0,))

    return (mk(decode=False), mk(decode=True),
            jax.jit(copy_fn, donate_argnums=(0,)),
            mk(decode=False, mode="all"),
            functools.lru_cache(maxsize=8)(make_window),
            make_shift,
            lambda pooling: mk(decode=False, mode="embed", pooling=pooling),
            mk(decode=False, mode="nll"))
