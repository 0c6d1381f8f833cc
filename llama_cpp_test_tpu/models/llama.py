"""LLaMA-family model: GGUF weight loading + functional forward pass.

The TPU-native analogue of the reference's llm_build_llama graph builder
(/root/reference/src/llama-model.cpp:4037-4198): per layer
RMSNorm -> QKV -> RoPE -> paged attention -> residual -> RMSNorm ->
SwiGLU FFN (or MoE, build_moe_ffn analogue) -> residual; final norm + lm head.

Instead of building a ggml graph that a scheduler walks, the whole step is one
jitted function over a pytree of QTensors (packed quantized planes that the
fused Pallas dequant-matmul kernels consume directly from HBM).

Covers the BASELINE model families: TinyLlama/Llama-2/Llama-3 (dense) and
Mixtral (MoE via ffn_gate_inp routing, the GGML_OP_MUL_MAT_ID analogue).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader
from ..ops import layers
from ..ops.qmatmul import qgather, qmm, qmm_split, qmm_xla
from ..quant.repack import QTensor, fuse_qtensors, repack
from .hparams import HParams, hparams_from_metadata


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def linear(x: jax.Array, qt: QTensor, out_dtype=jnp.float32) -> jax.Array:
    """Dispatch: fused Pallas dequant-matmul on TPU, XLA fallback elsewhere."""
    if _use_pallas():
        return qmm(x, qt, out_dtype=out_dtype)
    return qmm_xla(x, qt, out_dtype=out_dtype)


def lora_delta(x: jax.Array, lora) -> jax.Array | None:
    """scale * (x A^T) B^T, the low-rank update (build_lora_mm analogue,
    reference llama-graph.h:418)."""
    if lora is None:
        return None
    a, b, sc = lora
    u = jax.lax.dot_general(x.astype(jnp.bfloat16), a,
                            (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    d = jax.lax.dot_general(u.astype(jnp.bfloat16), b,
                            (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return d * sc


def linear_lora(x: jax.Array, qt: QTensor, lora, out_dtype=jnp.float32):
    """linear() plus the optional low-rank update."""
    y = linear(x, qt, out_dtype=out_dtype)
    d = lora_delta(x, lora)
    if d is not None:
        y = y + d.astype(y.dtype)
    return y


@dataclasses.dataclass
class LayerWeights:
    attn_norm: jax.Array
    wq: QTensor
    wk: QTensor
    wv: QTensor
    wo: QTensor
    ffn_norm: jax.Array
    # dense FFN
    w_gate: QTensor | None = None
    w_up: QTensor | None = None
    w_down: QTensor | None = None
    # MoE
    gate_inp: QTensor | None = None            # router [n_expert, n_embd]
    gate_exps: QTensor | None = None           # stacked [E] QTensor planes
    up_exps: QTensor | None = None
    down_exps: QTensor | None = None
    # fused gate|up expert planes (fuse_expert_qtensors): ONE grouped
    # kernel pass per routed tile instead of two
    gateup_exps: QTensor | None = None
    # qwen2moe shared expert: scalar sigmoid gate vector + its own SwiGLU
    # (reference llm_build_qwen2moe, llama-model.cpp:6198-6221)
    gate_inp_shexp: jax.Array | None = None    # [n_embd]
    gate_shexp: QTensor | None = None
    up_shexp: QTensor | None = None
    down_shexp: QTensor | None = None
    # optional biases (qwen-style; None for llama family)
    bq: jax.Array | None = None
    bk: jax.Array | None = None
    bv: jax.Array | None = None
    # phi2-family (parallel residual) extras: LayerNorm bias for attn_norm,
    # plus projection biases on attn_output / ffn_up / ffn_down
    attn_norm_b: jax.Array | None = None
    # stablelm-style sequential LayerNorm bias on the FFN pre-norm
    ffn_norm_b: jax.Array | None = None
    # arctic: the MoE branch's own norm (llm_build_arctic FFN_NORM_EXPS);
    # its presence switches the layer to parallel dense+moe residuals
    ffn_norm_exps: jax.Array | None = None
    # bitnet sub-norms: rms on the attention output BEFORE wo, and on
    # the swiglu product BEFORE ffn_down (llm_build_bitnet)
    attn_sub_norm: jax.Array | None = None
    ffn_sub_norm: jax.Array | None = None
    # falcon-40B: separate LayerNorm feeding the parallel FFN branch
    attn_norm_2: jax.Array | None = None
    attn_norm_2_b: jax.Array | None = None
    bo: jax.Array | None = None
    b_up: jax.Array | None = None
    b_gate: jax.Array | None = None    # jais biased-swiglu gate bias
    b_down: jax.Array | None = None
    # optional per-head Q/K RMS norms (gemma3/qwen3-style, [head_dim])
    attn_q_norm: jax.Array | None = None
    attn_k_norm: jax.Array | None = None
    # optional sandwich norms applied to the attn/ffn branch outputs before
    # the residual add (gemma2/gemma3, llm_build_gemma2's post-norms)
    attn_post_norm: jax.Array | None = None
    ffn_post_norm: jax.Array | None = None
    # LoRA pairs: field name -> (A [r,K], B [N,r], scale) (models/lora.py)
    lora: dict = dataclasses.field(default_factory=dict)
    # control vector: [n_embd] bias added to the layer output (models/cvec.py,
    # the llama_adapter_cvec analogue)
    cvec: jax.Array | None = None
    # fused projections (decode is kernel-count bound on TPU): wqkv packs
    # q/k/v rows into one plane set, w_gateup packs gate+up. Built at load
    # when the source tensors share quant type; None otherwise.
    wqkv: QTensor | None = None
    w_gateup: QTensor | None = None
    # deepseek2 MLA (reference llm_build_deepseek2): low-rank q projection
    # (wq_a -> rms -> wq_b; big models only — lite uses plain wq), shared
    # compressed kv+pe projection (wkv_a: [kv_lora_rank + rope_dim]),
    # rms on the compressed kv, and the up-projection wkv_b
    # ([H * (nope_dim + v_dim)])
    wq_a: QTensor | None = None
    wq_b: QTensor | None = None
    attn_q_a_norm: jax.Array | None = None
    wkv_a: QTensor | None = None
    attn_kv_a_norm: jax.Array | None = None
    wkv_b: QTensor | None = None
    # deepseek-v3 expert-selection bias (reference build_moe_ffn
    # exp_probs_b: biases selection only, weights stay unbiased)
    exp_probs_b: jax.Array | None = None
    # bert-family POST-norms: LN applied to (input + branch) sums
    # chameleon per-head qk LayerNorm biases ([H, d] like the weights)
    attn_q_norm_b: jax.Array | None = None
    attn_k_norm_b: jax.Array | None = None
    # (reference llm_build_bert attn_out_norm / layer_out_norm)
    attn_out_norm: jax.Array | None = None
    attn_out_norm_b: jax.Array | None = None
    layer_out_norm: jax.Array | None = None
    layer_out_norm_b: jax.Array | None = None


@dataclasses.dataclass
class LlamaWeights:
    tok_embd: QTensor
    output_norm: jax.Array
    output: QTensor          # lm head (may be tok_embd when tied)
    layers: list[LayerWeights]
    rope_inv_freq: jax.Array
    rope_mscale: float
    # inv_freq table for sliding-window layers (gemma3 uses base 10000 on
    # SWA layers, reference llama-model.cpp:888/:7572); equals rope_inv_freq
    # for every other arch
    rope_inv_freq_swa: jax.Array | None = None
    # phi3 longrope: the LONG-context table (inv_freq / rope_factors_long).
    # rope_inv_freq then holds the SHORT table; Context selects long when
    # n_ctx > rope_orig_ctx (reference llama-model.cpp:11434-11445
    # get_rope_factors: long factors iff n_ctx_per_seq > n_ctx_orig).
    rope_inv_freq_long: jax.Array | None = None
    # phi2-family: LayerNorm bias on the final norm + LM-head bias
    output_norm_b: jax.Array | None = None
    output_b: jax.Array | None = None
    # bert-family input-embedding extras (reference llm_build_bert):
    # learned absolute positions, token-type ("Sentence A") row, and the
    # embedding LayerNorm
    pos_embd: jax.Array | None = None      # [n_ctx_train, C] f32
    type_embd: jax.Array | None = None     # [n_types, C] f32
    tok_norm: jax.Array | None = None
    tok_norm_b: jax.Array | None = None
    # cohere2: global (window=0) layers get NO rope (llm_build_cohere2's
    # is_swa gate); inv_freq_for returns None and forward_layer skips
    nope_global: bool = False

    def inv_freq_for(self, window: int) -> jax.Array | None:
        """Per-layer rope table: the SWA table when the layer is sliding;
        None when this arch leaves global layers position-free."""
        if window == 0 and self.nope_global:
            return None
        if window > 0 and self.rope_inv_freq_swa is not None:
            return self.rope_inv_freq_swa
        return self.rope_inv_freq


for _cls in (LayerWeights, LlamaWeights):
    jax.tree_util.register_dataclass(
        _cls,
        data_fields=[f.name for f in dataclasses.fields(_cls)
                     if f.name not in ("rope_mscale", "nope_global")],
        meta_fields=(["rope_mscale", "nope_global"]
                     if _cls is LlamaWeights else []),
    )


# ---------------------------------------------------------------------------
# loading


def _repack_2d(reader: GGUFReader, name: str,
               row_perm: np.ndarray | None = None,
               layout: str = "t", tile_n: int = 256) -> QTensor:
    info = reader.tensors[name]
    # ggml ne = (K, N): ne[0] is the contraction dim (row length)
    k, n = info.shape[0], info.shape[1] if len(info.shape) > 1 else 1
    raw = reader.tensor_bytes(name)
    if row_perm is not None:
        # block quantization is per-row (k % block == 0), so permuting output
        # rows is a pure byte-row shuffle of the packed data
        row_bytes = raw.size // n
        raw = np.ascontiguousarray(raw.reshape(n, row_bytes)[row_perm])
    return repack(raw, info.ggml_type, n, k, layout=layout, tile_n=tile_n)


def _unpermute_rows(n_head: int, head_dim: int,
                    rope_dim: int | None = None) -> np.ndarray:
    """Inverse of convert_hf_to_gguf.py:1657's permute: GGUF NORM-layout
    Q/K rows -> HF half-split layout, so half-split (NEOX) rope applies.
    out_row[h*d + j]       = in_row[h*d + 2j]
    out_row[h*d + d/2 + j] = in_row[h*d + 2j + 1]

    Partial rotary (chatglm: rope_dim < head_dim): only the first
    rope_dim dims are interleaved; the pass-through tail stays identity.
    """
    d = head_dim
    rd = rope_dim if rope_dim else d
    idx = np.empty(n_head * d, np.int64)
    for h in range(n_head):
        base = h * d
        idx[base:base + rd // 2] = base + 2 * np.arange(rd // 2)
        idx[base + rd // 2:base + rd] = base + 2 * np.arange(rd // 2) + 1
        idx[base + rd:base + d] = base + np.arange(rd, d)
    return idx


def _repack_3d(reader: GGUFReader, name: str, tp: int = 1,
               mode: str = "col") -> QTensor:
    """Expert-stacked tensor, ggml ne = (K, N, E) -> planes stacked on axis 0
    of shape [E, ...]. Stored as one QTensor whose arrays have a leading E dim.
    tp > 1 shards each expert like the dense tensors (col/row)."""
    info = reader.tensors[name]
    k, n, e = info.shape
    raw = reader.tensor_bytes(name)
    per = raw.size // e
    if tp > 1 and mode == "col":
        from ..parallel.sharding import repack_sharded
        qts = [repack_sharded(raw[i * per:(i + 1) * per], info.ggml_type,
                              n, k, tp) for i in range(e)]
    else:
        qts = [repack(raw[i * per:(i + 1) * per], info.ggml_type, n, k)
               for i in range(e)]
        if tp > 1:
            from ..parallel.sharding import shard_qtensor_cols
            shard_qtensor_cols(qts[0], tp)
    q0 = qts[0]
    stack = lambda xs: None if xs[0] is None else np.stack(xs)
    return QTensor(
        q0.kind, q0.shape, q0.n_orig, q0.group,
        stack([q.qs for q in qts]),
        stack([q.scale for q in qts]),
        stack([q.min_ for q in qts]),
        q0.lut,
        q0.ggml_type,
    )


def _f32(reader: GGUFReader, name: str) -> np.ndarray:
    return reader.dequantize(name, np.float32)


def load_weights(reader: GGUFReader, hp: HParams | None = None,
                 tp: int = 1) -> tuple[HParams, LlamaWeights]:
    """Load + repack all tensors for a llama-family GGUF.

    tp > 1 produces Megatron-style tensor-parallel planes for a 'tp' mesh
    axis: wq/wk/wv/ffn_gate/ffn_up/output column-sharded (per-shard local
    plane packing, parallel/sharding.py), wo/ffn_down row-sharded (axis-1
    slice at dispatch). Consumed inside shard_map (parallel/tp.py).
    """
    if hp is None:
        hp = hparams_from_metadata(reader.metadata)
    from .registry import get_arch

    spec = get_arch(hp.arch)  # refuse archs with no implemented forward
    if spec.family == "mamba":
        raise ValueError(
            "mamba is a recurrent state-space arch with no KV cache — "
            "load it with models.mamba.MambaModel / MambaContext")
    if spec.family == "rwkv6":
        raise ValueError(
            "rwkv6 is a recurrent arch with no KV cache — load it with "
            "models.rwkv6.Rwkv6Model / Rwkv6Context")
    if spec.family == "rwkv7":
        raise ValueError(
            "rwkv7/arwkv7 are recurrent archs with no KV cache — load "
            "them with models.rwkv7.Rwkv7Model / Rwkv7Context")
    if spec.family == "wavtokenizer":
        raise ValueError(
            "wavtokenizer-dec is an audio-codec decoder — load it with "
            "models.wavtokenizer.load_wavtokenizer (llama-tts CLI)")
    if spec.family == "t5":
        raise ValueError(
            "t5 is an encoder-decoder arch — load it with "
            "models.t5.T5Model / T5Context (llama_encode + decode flow)")
    t = reader.tensors
    if tp > 1:
        from ..parallel.sharding import repack_sharded, shard_qtensor_cols
        if hp.n_head % tp or hp.n_head_kv % tp:
            raise ValueError(
                f"tp={tp} must divide n_head={hp.n_head} and "
                f"n_head_kv={hp.n_head_kv}")
        if not hp.uniform_layers:
            raise NotImplementedError(
                f"{hp.arch} has per-layer head/ffn geometry "
                "(openelm/deci) — tensor-parallel sharding of ragged "
                "layer planes is not implemented; run single-device")

    def col(name: str, perm=None, tile_n: int = 256) -> QTensor:
        """Column-parallel (shard output rows)."""
        if tp == 1:
            return _repack_2d(reader, name, perm, tile_n=tile_n)
        info = reader.tensors[name]
        k, n = info.shape[0], info.shape[1]
        return repack_sharded(reader.tensor_bytes(name), info.ggml_type,
                              n, k, tp, perm)

    def row(name: str) -> QTensor:
        """Row-parallel (contraction dim sharded at dispatch)."""
        qt = _repack_2d(reader, name)
        if tp > 1:
            shard_qtensor_cols(qt, tp)
        return qt

    q_perm = k_perm = None
    if hp.rope_type == "norm" and hp.uniform_layers:
        q_perm = _unpermute_rows(hp.n_head, hp.head_dim, hp.rope_dim)
        k_perm = _unpermute_rows(hp.n_head_kv, hp.head_dim, hp.rope_dim)

    def layer_perms(i: int):
        """NORM-rope row perms at layer i's head counts (deci: per-layer
        kv heads; uniform archs reuse the precomputed pair)."""
        if hp.uniform_layers or hp.rope_type != "norm":
            return q_perm, k_perm
        return (_unpermute_rows(hp.n_head_of(i), hp.head_dim, hp.rope_dim),
                _unpermute_rows(hp.n_head_kv_of(i), hp.head_dim,
                                hp.rope_dim))

    def split_qkv(i: int):
        """GGUF fused attn_qkv rows [q; k; v] -> three QTensors (phi2-style
        checkpoints; reference llm_load_tensors wqkv-optional path). Block
        quantization is per-row, so the split is a packed byte-row slice.
        openelm sizes the split at the LAYER's head counts."""
        p = f"blk.{i}."
        info = reader.tensors[p + "attn_qkv.weight"]
        k, n = info.shape[0], info.shape[1]
        raw = reader.tensor_bytes(p + "attn_qkv.weight")
        row_bytes = raw.size // n
        rows = raw.reshape(n, row_bytes)
        n_q = hp.n_head_of(i) * hp.head_dim
        n_kv = hp.n_head_kv_of(i) * hp.head_dim
        mk = lambda lo, hi: repack(np.ascontiguousarray(rows[lo:hi]),
                                   info.ggml_type, hi - lo, k)
        return mk(0, n_q), mk(n_q, n_q + n_kv), mk(n_q + n_kv, n_q + 2 * n_kv)

    def _mla_q_perm() -> np.ndarray:
        """Per-head row permutation for MLA q projections: identity on the
        nope rows, interleaved->half-split on the trailing pe rows (the
        common permutation cancels in q_pe . k_pe, so only the rope
        convention changes — same trick as the NORM-rope archs)."""
        dk, rd = hp.head_dim, hp.rope_dim
        nope = dk - rd
        idx = np.arange(hp.n_head * dk, dtype=np.int64)
        sub = _unpermute_rows(1, rd)
        for h in range(hp.n_head):
            base = h * dk + nope
            idx[base:base + rd] = base + sub
        return idx

    def _mla_kva_perm() -> np.ndarray:
        """attn_kv_a_mqa rows: identity on kv_lora_rank, pe-permuted tail."""
        rd = hp.rope_dim
        idx = np.arange(hp.n_lora_kv + rd, dtype=np.int64)
        idx[hp.n_lora_kv:] = hp.n_lora_kv + _unpermute_rows(1, rd)
        return idx

    def layer(i: int) -> LayerWeights:
        p = f"blk.{i}."
        mla = p + "attn_kv_a_mqa.weight" in t
        if mla and tp > 1:
            raise NotImplementedError(
                "deepseek2 MLA attention is single-device / pipeline only; "
                "tensor-parallel MLA plane sharding is not implemented")
        fused_src = (not mla) and p + "attn_qkv.weight" in t
        attn_free = hp.n_head_of(i) == 0          # deci: block is just FFN
        linear_attn = (not hp.uniform_layers and not attn_free
                       and hp.n_head_kv_of(i) == 0)  # deci: wo-only attn
        if mla or attn_free or linear_attn:
            wq = wk = wv = None
        elif fused_src:
            wq, wk, wv = split_qkv(i)
        else:
            qp, kp = layer_perms(i)
            wq = col(p + "attn_q.weight", qp)
            wk = col(p + "attn_k.weight", kp)
            wv = col(p + "attn_v.weight")
        if p + "attn_norm.weight" not in t and not attn_free and \
                hp.arch not in ("olmo2", "olmo") and not hp.post_norm:
            # only post-norm-only (olmo2) and non-parametric-norm (olmo)
            # archs may omit norm tensors; anything else missing them is a
            # broken conversion — fail loudly instead of silently running
            # identity norms
            raise KeyError(f"{p}attn_norm.weight missing (arch {hp.arch} "
                           "requires pre-norms)")
        lw = LayerWeights(
            attn_norm=(_f32(reader, p + "attn_norm.weight")
                       if p + "attn_norm.weight" in t else None),
            wq=wq, wk=wk, wv=wv,
            wo=(None if attn_free else row(p + "attn_output.weight")),
            ffn_norm=(_f32(reader, p + "ffn_norm.weight")
                      if p + "ffn_norm.weight" in t else None),
        )
        if p + "attn_norm.bias" in t:
            lw.attn_norm_b = _f32(reader, p + "attn_norm.bias")
        if p + "ffn_norm.bias" in t:
            lw.ffn_norm_b = _f32(reader, p + "ffn_norm.bias")
        if p + "ffn_norm_exps.weight" in t:  # arctic moe norm
            lw.ffn_norm_exps = _f32(reader, p + "ffn_norm_exps.weight")
        if p + "attn_sub_norm.weight" in t:  # bitnet
            lw.attn_sub_norm = _f32(reader, p + "attn_sub_norm.weight")
        if p + "ffn_sub_norm.weight" in t:
            lw.ffn_sub_norm = _f32(reader, p + "ffn_sub_norm.weight")
        if p + "attn_norm_2.weight" in t:  # falcon-40B parallel-FFN norm
            lw.attn_norm_2 = _f32(reader, p + "attn_norm_2.weight")
            if p + "attn_norm_2.bias" in t:
                lw.attn_norm_2_b = _f32(reader, p + "attn_norm_2.bias")
        for bname, attr in (("attn_output.bias", "bo"),
                            ("ffn_up.bias", "b_up"),
                            ("ffn_gate.bias", "b_gate"),
                            ("ffn_down.bias", "b_down")):
            if p + bname in t:
                setattr(lw, attr, _f32(reader, p + bname))
        if p + "attn_qkv.bias" in t:
            bias = _f32(reader, p + "attn_qkv.bias")
            n_q = hp.n_head * hp.head_dim
            n_kv = hp.n_head_kv * hp.head_dim
            lw.bq = bias[:n_q]
            lw.bk = bias[n_q:n_q + n_kv]
            lw.bv = bias[n_q + n_kv:n_q + 2 * n_kv]
        if mla:
            # deepseek2/minicpm3 MLA tensors (reference llm_load_tensors
            # DEEPSEEK2/MINICPM3; tensor names llama-arch.cpp:1022-1028).
            # The pe-row interleave->half-split permutation applies only
            # to NORM-rope MLA (deepseek2); minicpm3 pe rows are already
            # half-split (NEOX rope type).
            mqp = _mla_q_perm() if hp.rope_type == "norm" else None
            mkp = _mla_kva_perm() if hp.rope_type == "norm" else None
            if p + "attn_q_a.weight" in t:
                lw.wq_a = _repack_2d(reader, p + "attn_q_a.weight")
                lw.attn_q_a_norm = _f32(reader, p + "attn_q_a_norm.weight")
                lw.wq_b = _repack_2d(reader, p + "attn_q_b.weight", mqp)
            else:  # lite: plain full-rank q
                lw.wq = _repack_2d(reader, p + "attn_q.weight", mqp)
            lw.wkv_a = _repack_2d(reader, p + "attn_kv_a_mqa.weight", mkp)
            lw.attn_kv_a_norm = _f32(reader, p + "attn_kv_a_norm.weight")
            lw.wkv_b = _repack_2d(reader, p + "attn_kv_b.weight")
        if tp == 1 and not mla and lw.wq is not None:
            # (deci attn-free/linear layers carry no q/k/v planes)
            lw.wqkv = fuse_qtensors([lw.wq, lw.wk, lw.wv])
            if lw.wqkv is not None:
                lw.wq = lw.wk = lw.wv = None  # fused plane replaces them
        if p + "ffn_gate_inp.weight" in t:  # MoE (Mixtral / qwen2moe)
            from ..quant.repack import fuse_expert_qtensors

            lw.gate_inp = _repack_2d(reader, p + "ffn_gate_inp.weight")
            lw.gate_exps = _repack_3d(reader, p + "ffn_gate_exps.weight", tp)
            lw.up_exps = _repack_3d(reader, p + "ffn_up_exps.weight", tp)
            lw.down_exps = _repack_3d(reader, p + "ffn_down_exps.weight",
                                      tp, mode="row")
            # NOTE: fusing gate|up expert planes (fuse_expert_qtensors +
            # gmm_apply_split) is bit-identical but measured 128x SLOWER on
            # v5e (dbench gmm: 87.9 vs 0.69 ms/tok — a Mosaic pathology on
            # the fused 3D blocks); the engine keeps separate planes and
            # the fused path stays available for re-testing on newer
            # toolchains via LLAMA_TPU_MOE_FUSE=1.
            if tp == 1 and os.environ.get("LLAMA_TPU_MOE_FUSE") == "1":
                lw.gateup_exps = fuse_expert_qtensors([lw.gate_exps,
                                                       lw.up_exps])
                if lw.gateup_exps is not None:
                    lw.gate_exps = lw.up_exps = None  # fused replaces them
            if p + "ffn_up_shexp.weight" in t:
                # shared expert: qwen2moe gates it with a scalar sigmoid
                # (ffn_gate_inp_shexp); deepseek2's is ungated/always-on
                # (reference llm_build_deepseek2 ffn_shexp add)
                if p + "ffn_gate_inp_shexp.weight" in t:
                    lw.gate_inp_shexp = _f32(
                        reader, p + "ffn_gate_inp_shexp.weight")
                lw.gate_shexp = _repack_2d(reader, p + "ffn_gate_shexp.weight")
                lw.up_shexp = _repack_2d(reader, p + "ffn_up_shexp.weight")
                lw.down_shexp = _repack_2d(reader, p + "ffn_down_shexp.weight")
            if p + "exp_probs_b.bias" in t:  # deepseek-v3 selection bias
                lw.exp_probs_b = _f32(reader, p + "exp_probs_b.bias")
            if p + "ffn_gate.weight" in t:
                # arctic: the dense residual MLP coexists with the MoE
                lw.w_gate = col(p + "ffn_gate.weight")
                lw.w_up = col(p + "ffn_up.weight")
                lw.w_down = row(p + "ffn_down.weight")
                if tp == 1:
                    lw.w_gateup = fuse_qtensors([lw.w_gate, lw.w_up])
                    if lw.w_gateup is not None:
                        lw.w_gate = lw.w_up = None
        elif p + "ffn_gate.weight" in t:
            lw.w_gate = col(p + "ffn_gate.weight")
            lw.w_up = col(p + "ffn_up.weight")
            lw.w_down = row(p + "ffn_down.weight")
            if tp == 1:
                lw.w_gateup = fuse_qtensors([lw.w_gate, lw.w_up])
                if lw.w_gateup is not None:
                    lw.w_gate = lw.w_up = None
        elif reader.tensors[p + "ffn_up.weight"].shape[-1] == 2 * hp.n_ff:
            # fused swiglu [gate|up] rows in one ffn_up tensor — how the
            # REFERENCE's converter stores phi3/chatglm (LLM_FFN_SWIGLU
            # splits at runtime); row-slice like split_qkv since block
            # quantization is per-row
            info = reader.tensors[p + "ffn_up.weight"]
            kdim, n = info.shape[0], info.shape[1]
            raw = reader.tensor_bytes(p + "ffn_up.weight")
            rows = raw.reshape(n, raw.size // n)
            mk = lambda lo, hi: repack(np.ascontiguousarray(rows[lo:hi]),
                                       info.ggml_type, hi - lo, kdim)
            lw.w_gate = mk(0, hp.n_ff)
            lw.w_up = mk(hp.n_ff, n)
            if tp > 1:
                shard_qtensor_cols(lw.w_gate, tp)
                shard_qtensor_cols(lw.w_up, tp)
            lw.w_down = row(p + "ffn_down.weight")
            if tp == 1:
                lw.w_gateup = fuse_qtensors([lw.w_gate, lw.w_up])
                if lw.w_gateup is not None:
                    lw.w_gate = lw.w_up = None
        else:  # non-gated FFN (phi2 family, starcoder2): up -> act -> down
            lw.w_up = col(p + "ffn_up.weight")
            lw.w_down = row(p + "ffn_down.weight")
        for bname, attr, perm in (("attn_q.bias", "bq", q_perm),
                                  ("attn_k.bias", "bk", k_perm),
                                  ("attn_v.bias", "bv", None)):
            if p + bname in t:
                bias = _f32(reader, p + bname)
                setattr(lw, attr, bias[perm] if perm is not None else bias)
        for tname, attr in (("attn_q_norm.weight", "attn_q_norm"),
                            ("attn_k_norm.weight", "attn_k_norm"),
                            ("attn_q_norm.bias", "attn_q_norm_b"),
                            ("attn_k_norm.bias", "attn_k_norm_b"),
                            ("attn_post_norm.weight", "attn_post_norm"),
                            ("post_attention_norm.weight", "attn_post_norm"),
                            ("ffn_post_norm.weight", "ffn_post_norm"),
                            ("post_ffw_norm.weight", "ffn_post_norm"),
                            # bert-family post-norms on the residual sums
                            ("attn_output_norm.weight", "attn_out_norm"),
                            ("attn_output_norm.bias", "attn_out_norm_b"),
                            ("layer_output_norm.weight", "layer_out_norm"),
                            ("layer_output_norm.bias", "layer_out_norm_b")):
            if p + tname in t:
                arr = _f32(reader, p + tname)
                if arr.ndim == 2 and q_perm is not None and \
                        attr in ("attn_q_norm", "attn_k_norm",
                                 "attn_q_norm_b", "attn_k_norm_b"):
                    # Command R+ per-head LayerNorm weights [H, d] live in
                    # the checkpoint's interleaved-rope layout; q/k rows are
                    # unpermuted to half-split at load, so the elementwise
                    # norm weight follows the same within-head map (mean/var
                    # are permutation-invariant, the weight multiply isn't)
                    arr = arr[:, _unpermute_rows(1, hp.head_dim)]
                setattr(lw, attr, arr)
        if hp.swin_norm:
            # chameleon swin variant (llm_build_chameleon hparams.swin_norm):
            # NO pre-norms; the layer's attn/ffn norms apply to the BRANCH
            # OUTPUT before the residual add — exactly the engine's gemma2
            # sandwich post-norm slots, so swin is a pure load-time remap
            lw.attn_post_norm, lw.attn_norm = lw.attn_norm, None
            lw.ffn_post_norm, lw.ffn_norm = lw.ffn_norm, None
        if hp.arch == "grok":
            # grok rms_norm_1/rms_norm_3 are POST-branch norms applied
            # before the residual adds (llm_build_grok) — exactly the
            # gemma2 sandwich slots; the bert-style post-SUM fields they
            # load into under the reference names are remapped here
            if lw.attn_out_norm is not None:
                lw.attn_post_norm, lw.attn_out_norm = lw.attn_out_norm, None
            if lw.layer_out_norm is not None:
                lw.ffn_post_norm, lw.layer_out_norm = lw.layer_out_norm, None
        if hp.arch == "dbrx" and lw.ffn_norm is None and \
                lw.attn_out_norm is not None:
            # dbrx stores its pre-MoE norm under the bert-family
            # attn_output_norm NAME but uses it in the ffn_norm ROLE of a
            # pre-norm graph (llm_build_dbrx: build_norm(ffn_inp,
            # attn_out_norm) before build_moe_ffn)
            lw.ffn_norm, lw.attn_out_norm = lw.attn_out_norm, None
            lw.ffn_norm_b, lw.attn_out_norm_b = lw.attn_out_norm_b, None
        return lw

    # embedding table keeps the row-gather layout; the (possibly tied) lm
    # head gets its own matmul-layout planes
    # layers are independent: repack them in parallel (numpy ufuncs and the
    # native C++ repacker both release the GIL). The analogue of the
    # reference's threaded tensor upload (llama-model-loader.cpp:879).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
        f_embd = ex.submit(_repack_2d, reader, "token_embd.weight", None,
                           "rows")
        # lm head planes pad N to tile_n=1024 multiples: the vocab axis is
        # the one matmul wide enough that narrow tiles dominate (32000 ->
        # npk 16000 only divides tile_n=128 => 125 grid steps; padded to
        # 16384 it runs 16 steps of 1024 for +2.4% bytes)
        if hp.post_norm:
            # bert-family encoders have no lm head; point output at the
            # embedding rows (never dispatched — embed() is the only path)
            f_out = f_embd
        elif "output.weight" in t:
            f_out = ex.submit(col, "output.weight", None, 1024)
        else:
            f_out = ex.submit(col, "token_embd.weight", None, 1024)  # tied
        layer_list = list(ex.map(layer, range(hp.n_layer)))
        tok_embd = f_embd.result()
        output = f_out.result()
    inv_freq, mscale = layers.rope_freqs(hp)
    inv_freq_long = None
    if "rope_factors_short.weight" in t:
        # phi3 longrope: per-pair factor tensors divide the base frequencies
        # (ggml-cpu.c ggml_rope_cache_init theta/ff). rope_inv_freq becomes
        # the SHORT table; the LONG table rides beside it and Context picks
        # by n_ctx (reference llama-model.cpp:1621-1622, :11434-11445).
        short_f = _f32(reader, "rope_factors_short.weight")
        long_f = _f32(reader, "rope_factors_long.weight")
        if short_f.shape != inv_freq.shape or long_f.shape != inv_freq.shape:
            raise ValueError(
                f"rope factor tensors must be [rope_dim/2]={inv_freq.shape}; "
                f"got short {short_f.shape} long {long_f.shape}")
        inv_freq_long = np.asarray(inv_freq / np.asarray(long_f), np.float32)
        inv_freq = inv_freq / np.asarray(short_f)
    inv_freq_swa = None
    if hp.rope_freq_base_swa > 0 and \
            hp.rope_freq_base_swa != hp.rope_freq_base:
        hp_swa = dataclasses.replace(hp, rope_freq_base=hp.rope_freq_base_swa,
                                     rope_scaling="none")
        inv_freq_swa = np.asarray(layers.rope_freqs(hp_swa)[0])
    w = LlamaWeights(
        tok_embd=tok_embd,
        output_norm=(_f32(reader, "output_norm.weight")
                     if "output_norm.weight" in t else None),
        output=output,
        layers=layer_list,
        rope_inv_freq=np.asarray(inv_freq),
        rope_mscale=float(mscale),
        rope_inv_freq_swa=inv_freq_swa,
        rope_inv_freq_long=inv_freq_long,
        nope_global=hp.nope_global,
        output_norm_b=(_f32(reader, "output_norm.bias")
                       if "output_norm.bias" in t else None),
        output_b=(_f32(reader, "output.bias")
                  if "output.bias" in t else None),
        pos_embd=(_f32(reader, "position_embd.weight")
                  if "position_embd.weight" in t else None),
        type_embd=(_f32(reader, "token_types.weight")
                   if "token_types.weight" in t else None),
        tok_norm=(_f32(reader, "token_embd_norm.weight")
                  if "token_embd_norm.weight" in t else None),
        tok_norm_b=(_f32(reader, "token_embd_norm.bias")
                    if "token_embd_norm.bias" in t else None),
    )
    return hp, w


def device_put_weights(w: LlamaWeights, shardings: Any | None = None) -> LlamaWeights:
    """Move all weights to device. `shardings` may be a pytree-prefix of
    jax.sharding.Sharding (see parallel/), or None for single-device.

    Single-device: dtype-normalize on host, then ONE async jax.device_put of
    the whole pytree — per-tensor puts each pay a full host<->device round
    trip on a tunneled device (the round-1 460s load)."""
    if shardings is None:
        def cast(x):
            if isinstance(x, QTensor):
                qdt, sdt = x._put_dtypes()
                conv = lambda a, dt: None if a is None else (
                    np.asarray(a) if dt is None else
                    np.asarray(np.asarray(a), dt))
                return QTensor(
                    x.kind, x.shape, x.n_orig, x.group,
                    conv(x.qs, qdt), conv(x.scale, sdt), conv(x.min_, sdt),
                    conv(x.lut, np.float32), x.ggml_type, x.layout, x.parts)
            return x
        host = jax.tree_util.tree_map(
            cast, w, is_leaf=lambda x: isinstance(x, QTensor))
        return jax.device_put(host)
    return jax.device_put(w, shardings)


# ---------------------------------------------------------------------------
# forward


def moe_ffn(x: jax.Array, lw: LayerWeights, hp: HParams,
            ep_axis: str | None = None, ep: int = 1) -> jax.Array:
    """Mixtral-style top-k expert routing (build_moe_ffn analogue,
    reference src/llama-graph.cpp build_moe_ffn + GGML_OP_MUL_MAT_ID).

    On TPU this uses the grouped kernel (ops/gmm.py): tokens are sorted into
    tile-aligned per-expert segments and ONE Pallas dispatch per projection
    streams only the experts the batch actually routed to — compute scales
    with M*top_k (not E*M) and decode HBM traffic with the chosen-expert
    union. Off-TPU the dense-masked loop below is the exact XLA fallback.

    ep_axis: expert-parallel shard_map axis — the expert stacks hold
    n_expert/ep local experts; each device computes its local experts'
    contribution and the partial outputs are psum'ed over ep_axis
    (the sharded MUL_MAT_ID the reference lacks, SURVEY.md §2.4).
    """
    b, tdim = x.shape[0], x.shape[1]
    xf = x.reshape(-1, x.shape[-1])
    router = linear(xf, lw.gate_inp)                      # [M, E] (E global)
    if hp.expert_gating == "sparsemixer":
        # phimoe inference routing (HF sparsemixer, top_k == 2): each
        # pick's weight is the MASKED softmax at that pick — experts more
        # than 2*jitter_eps RELATIVE below the running max are dropped
        # from the softmax — and the two picks' weights are NOT
        # renormalized against each other (each is ~1.0 when its max is
        # clear). NOTE divergence: the reference routes phimoe through
        # build_moe_ffn's renormalized top-2 softmax (llm_build_phi3,
        # norm_w=true), which does not match the original model; this
        # engine follows the model (cross-validated in test_convert_hf).
        eps2 = 2.0 * hp.router_jitter

        def _pick(scores):
            m = jnp.max(scores, axis=-1, keepdims=True)
            f = jnp.maximum(jnp.abs(scores), m)
            g = jnp.where((m - scores) / f > eps2, -jnp.inf, scores)
            i = jnp.argmax(scores, axis=-1)
            w = jnp.take_along_axis(jax.nn.softmax(g, axis=-1),
                                    i[:, None], axis=-1)[:, 0]
            return i, w

        i1, w1 = _pick(router)
        masked = jnp.where(
            jax.nn.one_hot(i1, router.shape[-1], dtype=bool),
            -jnp.inf, router)
        i2, w2 = _pick(masked)
        topi = jnp.stack([i1, i2], axis=-1)                  # [M, 2]
        topv = jnp.stack([w1, w2], axis=-1)
        if hp.expert_weights_scale != 1.0:
            topv = topv * hp.expert_weights_scale
        e_local = hp.n_expert // ep
        off = jax.lax.axis_index(ep_axis) * e_local \
            if ep_axis is not None and ep > 1 else 0
        if _use_pallas():
            out = _moe_grouped(xf, lw, hp, topi, topv, e_local, off)
        else:
            out = _moe_dense_masked(xf, lw, hp, topi, topv, e_local, off)
        if ep_axis is not None and ep > 1:
            out = jax.lax.psum(out, ep_axis)
        return out.reshape(b, tdim, hp.n_embd)
    if hp.expert_gating == "sigmoid":  # deepseek-v3 gating func
        probs = jax.nn.sigmoid(router)
    else:
        probs = jax.nn.softmax(router, axis=-1)
    if lw.exp_probs_b is not None:
        # deepseek-v3 e_score_correction: bias the SELECTION only; the
        # mixing weights stay unbiased (build_moe_ffn selection_probs)
        _, topi = jax.lax.top_k(probs + lw.exp_probs_b, hp.n_expert_used)
        topv = jnp.take_along_axis(probs, topi, axis=-1)
    else:
        topv, topi = jax.lax.top_k(probs, hp.n_expert_used)   # [M, k]
    if hp.norm_topk:
        # normalize selected weights (true for mixtral, false for qwen2moe)
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    if hp.expert_weights_scale != 1.0:  # deepseek routed_scaling_factor
        topv = topv * hp.expert_weights_scale
    e_local = hp.n_expert // ep
    off = jax.lax.axis_index(ep_axis) * e_local \
        if ep_axis is not None and ep > 1 else 0
    if _use_pallas():
        out = _moe_grouped(xf, lw, hp, topi, topv, e_local, off)
    else:
        out = _moe_dense_masked(xf, lw, hp, topi, topv, e_local, off)
    if ep_axis is not None and ep > 1:
        out = jax.lax.psum(out, ep_axis)
    return out.reshape(b, tdim, hp.n_embd)


def shared_expert_ffn(cur: jax.Array, lw: LayerWeights,
                      hp: HParams) -> jax.Array:
    """Always-on shared expert: SwiGLU(x), gated by a scalar sigmoid
    sigmoid(x . gate_inp_shexp) when that vector exists (qwen2moe,
    reference llama-model.cpp:6198-6221) and ungated otherwise
    (deepseek2, llm_build_deepseek2's plain ffn_shexp add).
    Weights are replicated, so the caller adds this AFTER any tp/ep psum
    of the routed output (adding inside would multiply it by the shard
    count)."""
    b, tdim = cur.shape[0], cur.shape[1]
    xf = cur.reshape(-1, cur.shape[-1])
    g = linear(xf, lw.gate_shexp)
    u = linear(xf, lw.up_shexp)
    sh = linear(layers.swiglu(g, u, hp.act_fn), lw.down_shexp)
    if lw.gate_inp_shexp is not None:
        gate = jax.nn.sigmoid(
            xf.astype(jnp.float32) @ lw.gate_inp_shexp.astype(jnp.float32))
        sh = sh * gate[:, None]
    return sh.reshape(b, tdim, hp.n_embd)


def _moe_grouped(xf, lw, hp, topi, topv, e_local, off):
    """Grouped-kernel expert compute: route once, reuse the plan for
    gate/up/down (all three share the same token->expert assignment)."""
    from ..ops import gmm as gmm_mod

    m = xf.shape[0]
    r = m * hp.n_expert_used
    tile_m = 8 if r <= 256 else 64
    routing = gmm_mod.route_tokens(
        topi, topv, n_expert=hp.n_expert, n_expert_local=e_local,
        expert_offset=off, tile_m=tile_m)
    # one gather into scratch-row space; gate -> swiglu -> down all stay
    # there; ONE weighted scatter-add combines back per token
    xs = xf[routing.tok_idx]
    if lw.gateup_exps is not None:
        g, u = gmm_mod.gmm_apply_split(xs, lw.gateup_exps,
                                       routing.tile_expert, tile_m)
    else:
        g = gmm_mod.gmm_apply(xs, lw.gate_exps, routing.tile_expert, tile_m)
        u = gmm_mod.gmm_apply(xs, lw.up_exps, routing.tile_expert, tile_m)
    h = layers.swiglu(g, u, hp.act_fn)
    y = gmm_mod.gmm_apply(h, lw.down_exps, routing.tile_expert, tile_m)
    return gmm_mod.combine(y, routing, m)


def _moe_dense_masked(xf, lw, hp, topi, topv, e_local, off):
    """Exact dense-per-expert fallback (CPU/XLA): every local expert runs
    over all tokens, masked by the routing weights."""
    m = xf.shape[0]
    weight = jnp.zeros((m, hp.n_expert), topv.dtype).at[
        jnp.arange(m)[:, None], topi].set(topv)           # [M, E]
    weight = jax.lax.dynamic_slice_in_dim(weight, off, e_local, axis=1)
    out = jnp.zeros((m, hp.n_embd), jnp.float32)
    for ei in range(e_local):
        down_e = _expert_slice(lw.down_exps, ei)
        if lw.gateup_exps is not None:
            g, u = qmm_split(xf, _expert_slice(lw.gateup_exps, ei),
                             use_pallas=False)
        else:
            g = linear(xf, _expert_slice(lw.gate_exps, ei))
            u = linear(xf, _expert_slice(lw.up_exps, ei))
        h = layers.swiglu(g, u, hp.act_fn)
        y = linear(h, down_e)
        out = out + y * weight[:, ei:ei + 1]
    return out


def _expert_slice(qt: QTensor, ei: int) -> QTensor:
    return QTensor(
        qt.kind, qt.shape, qt.n_orig, qt.group,
        qt.qs[ei],
        None if qt.scale is None else qt.scale[ei],
        None if qt.min_ is None else qt.min_[ei],
        qt.lut,
        qt.ggml_type,
        parts=qt.parts,
    )


def qkv_proj(cur: jax.Array, lw: LayerWeights, n_q: int, n_kv: int):
    """Q/K/V projections, via the fused wqkv plane when available.
    n_q/n_kv are the (local) output widths h*d and kvh*d."""
    lora = lw.lora or {}
    if lw.wqkv is not None:
        q, k, v = qmm_split(cur, lw.wqkv, out_dtype=jnp.float32,
                            use_pallas=_use_pallas())
        for name, dlt in (("wq", lora_delta(cur, lora.get("wq"))),
                          ("wk", lora_delta(cur, lora.get("wk"))),
                          ("wv", lora_delta(cur, lora.get("wv")))):
            if dlt is not None:
                if name == "wq":
                    q = q + dlt
                elif name == "wk":
                    k = k + dlt
                else:
                    v = v + dlt
    else:
        q = linear_lora(cur, lw.wq, lora.get("wq"), out_dtype=jnp.float32)
        k = linear_lora(cur, lw.wk, lora.get("wk"), out_dtype=jnp.float32)
        v = linear_lora(cur, lw.wv, lora.get("wv"), out_dtype=jnp.float32)
    return q, k, v


def mla_qkv(cur: jax.Array, lw: LayerWeights, hp: HParams,
            positions: jax.Array, inv_freq: jax.Array, mscale: float):
    """deepseek2 MLA projections -> roped q/k and dk-padded v, all
    [B, T, H, head_dim] (reference llm_build_deepseek2,
    llama-model.cpp:9247-9356; HF DeepseekV2Attention.forward).

    q: (wq_a -> rms -> wq_b) or plain wq -> per head [nope | pe];
    kv: wkv_a -> [compressed kv_lora_rank | shared k_pe(rope_dim)];
        rms(compressed) -> wkv_b -> per head [k_nope | v].
    RoPE rotates ONLY the 64-dim pe slices; k_pe is one head broadcast to
    all (MQA-style). The pe rows were load-permuted interleaved->half-split
    so the NEOX-device rotation equals the checkpoint's NORM convention.
    v is zero-padded from v_dim to head_dim so the shared paged-KV cache
    and attention kernels run unchanged; the caller slices [:v_dim] off
    the attention output. (This 'naive MLA' mirrors the reference's cache
    layout; the compressed-cache absorption variant is a possible future
    decode optimization.)"""
    b, tdim, c = cur.shape
    h, dk, rd, dv = hp.n_head, hp.head_dim, hp.rope_dim, hp.v_dim
    nope = dk - rd
    lora = lw.lora or {}
    if lw.wq_a is not None:
        qa = linear_lora(cur, lw.wq_a, lora.get("wq_a"))
        qa = layers.rms_norm(qa, lw.attn_q_a_norm, hp.rms_eps)
        q = linear_lora(qa.astype(jnp.bfloat16), lw.wq_b, lora.get("wq_b"))
    else:
        q = linear_lora(cur, lw.wq, lora.get("wq"))
    q = q.reshape(b, tdim, h, dk)
    kva = linear(cur, lw.wkv_a)                       # [B,T, rank+rd] f32
    kv_c = layers.rms_norm(kva[..., :hp.n_lora_kv], lw.attn_kv_a_norm,
                           hp.rms_eps)
    k_pe = kva[..., hp.n_lora_kv:][:, :, None, :]     # [B,T,1,rd] shared
    kvb = linear(kv_c.astype(jnp.bfloat16), lw.wkv_b)
    kvb = kvb.reshape(b, tdim, h, nope + dv)
    q_pe = layers.apply_rope(q[..., nope:], positions, inv_freq, mscale)
    k_pe = layers.apply_rope(k_pe, positions, inv_freq, mscale)
    q = jnp.concatenate([q[..., :nope], q_pe], axis=-1)
    k = jnp.concatenate([kvb[..., :nope],
                         jnp.broadcast_to(k_pe, (b, tdim, h, rd))], axis=-1)
    v = kvb[..., nope:]
    if dv < dk:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, dk - dv)))
    return q, k, v


def gateup_proj(cur: jax.Array, lw: LayerWeights):
    """SwiGLU gate/up projections, fused when available."""
    lora = lw.lora or {}
    if lw.w_gateup is not None:
        g, u = qmm_split(cur, lw.w_gateup, out_dtype=jnp.float32,
                         use_pallas=_use_pallas())
        dg = lora_delta(cur, lora.get("w_gate"))
        du = lora_delta(cur, lora.get("w_up"))
        if dg is not None:
            g = g + dg
        if du is not None:
            u = u + du
    else:
        g = linear_lora(cur, lw.w_gate, lora.get("w_gate"))
        u = linear_lora(cur, lw.w_up, lora.get("w_up"))
    return g, u


def forward_layer(
    x: jax.Array,               # [B, T, C] bf16
    lw: LayerWeights,
    hp: HParams,
    positions: jax.Array,       # [B, T] int32
    inv_freq: jax.Array,
    mscale: float,
    attend,                     # fn(q, k_cur, v_cur) -> [B,T,H,D]; writes KV
    tp_axis: str | None = None,  # shard_map axis name for tensor parallelism
    tp: int = 1,                 # static size of that axis
    ep_axis: str | None = None,  # expert-parallel axis (MoE layers)
    ep: int = 1,
    mrope_pos: jax.Array | None = None,  # [B, T, 3] qwen2vl image streams
    li: int = 0,                 # layer index (per-layer geometry archs)
) -> jax.Array:
    b, tdim, c = x.shape
    x_in = x                     # layer input (arctic's MoE branch source)
    # local head counts under tensor parallelism (weights column-sharded);
    # openelm/deci vary them per layer (hp.n_head_of — GGUF array keys)
    h = hp.n_head_of(li) // tp
    kvh = hp.n_head_kv_of(li) // tp
    d = hp.head_dim

    if hp.post_norm:
        return _forward_layer_postnorm(x, lw, hp, positions, inv_freq,
                                       mscale, attend)
    if hp.parallel_residual:
        return _forward_layer_parallel(x, lw, hp, positions, inv_freq,
                                       mscale, attend, tp_axis, tp)
    if hp.n_head_of(li) == 0:
        # deci attention-free layer (Llama-3_1-Nemotron-51B): the whole
        # block is the FFN — no norm, no attention, ffn_inp = layer input
        # (llm_build_deci n_head == 0)
        return _forward_layer_ffn(x, lw, hp, tp_axis, ep_axis, ep,
                                  lw.lora or {})
    if hp.n_head_kv_of(li) == 0 and not hp.uniform_layers:
        # deci "linear attention" layer: attention replaced by a single
        # n_embd x n_embd projection of the normed input
        # (llm_build_deci n_head > 0 && n_head_kv == 0)
        cur = layers.rms_norm(x, lw.attn_norm, hp.rms_eps)
        o = linear(cur, lw.wo, out_dtype=jnp.float32)
        x = x + o.astype(x.dtype)
        return _forward_layer_ffn(x, lw, hp, tp_axis, ep_axis, ep,
                                  lw.lora or {})

    lora = lw.lora or {}
    if hp.norm_type == "ln":
        # stablelm/gptneox: LayerNorm with weights; olmo: NON-PARAMETRIC
        # LayerNorm — no norm tensors at all (reference llm_build_olmo
        # build_norm with NULL weight)
        cur = layers.layer_norm(x, lw.attn_norm, lw.attn_norm_b, hp.rms_eps)
    elif lw.attn_norm is None:  # olmo2: post-norm only, identity pre-norm
        cur = x
    else:
        cur = layers.rms_norm(x, lw.attn_norm, hp.rms_eps)
    if lw.wkv_a is not None:
        # deepseek2 MLA attention (reference llm_build_deepseek2,
        # llama-model.cpp:9247-9356)
        q, k, v = mla_qkv(cur, lw, hp, positions, inv_freq, mscale)
        attn_out = attend(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16))
        attn_out = attn_out[..., :hp.v_dim].reshape(b, tdim, h * hp.v_dim)
        o = linear_lora(attn_out, lw.wo, lora.get("wo"),
                        out_dtype=jnp.float32)
        if lw.bo is not None:
            o = o + lw.bo
        x = x + o.astype(x.dtype)
        return _forward_layer_ffn(x, lw, hp, tp_axis, ep_axis, ep, lora)
    q, k, v = qkv_proj(cur, lw, h * d, kvh * d)
    if hp.clamp_kqv > 0.0:  # olmo clip_qkv (reference ggml_clamp on q/k/v)
        q = jnp.clip(q, -hp.clamp_kqv, hp.clamp_kqv)
        k = jnp.clip(k, -hp.clamp_kqv, hp.clamp_kqv)
        v = jnp.clip(v, -hp.clamp_kqv, hp.clamp_kqv)
    if lw.bq is not None:
        q = q + lw.bq
    if lw.bk is not None:
        k = k + lw.bk
    if lw.bv is not None:
        v = v + lw.bv
    if lw.attn_q_norm is not None and lw.attn_q_norm.shape[-1] != d:
        # olmo2: RMSNorm over the FLAT q/k vector (weight [n_head*d]),
        # before the head split — per-head [d] weights are gemma3/qwen3
        q = layers.rms_norm(q, lw.attn_q_norm, hp.rms_eps)
        k = layers.rms_norm(k, lw.attn_k_norm, hp.rms_eps)
        flat_qk = True
    else:
        flat_qk = False
    q = q.reshape(b, tdim, h, d)
    k = k.reshape(b, tdim, kvh, d)
    v = v.reshape(b, tdim, kvh, d)
    # per-head qk-norm variants: weight [d] = shared RMS (qwen3/gemma3);
    # weight [H, d] = DISTINCT per-head LayerNorms, no bias (stablelm-2-12B
    # — reference llm_build_stablelm's build_norm LLM_NORM on [d, H, T];
    # HF StableLmLayerNormPerHead)
    if not flat_qk and lw.attn_q_norm is not None:
        # 2D [H, d]: distinct per-head LayerNorms — stablelm-2-12B (no
        # bias) and chameleon (with bias, stats over d only)
        q = (layers.layer_norm(q, lw.attn_q_norm, lw.attn_q_norm_b,
                               hp.rms_eps)
             if lw.attn_q_norm.ndim == 2
             else layers.rms_norm(q, lw.attn_q_norm, hp.rms_eps))
    if not flat_qk and lw.attn_k_norm is not None:
        k = (layers.layer_norm(k, lw.attn_k_norm, lw.attn_k_norm_b,
                               hp.rms_eps)
             if lw.attn_k_norm.ndim == 2
             else layers.rms_norm(k, lw.attn_k_norm, hp.rms_eps))
    if mrope_pos is not None and hp.mrope_sections:
        # qwen2vl image M-RoPE: per-frequency-section position streams
        q = layers.apply_mrope(q, mrope_pos, inv_freq, hp.mrope_sections,
                               mscale)
        k = layers.apply_mrope(k, mrope_pos, inv_freq, hp.mrope_sections,
                               mscale)
    elif hp.pos_embd == "rope" and inv_freq is not None:
        q = layers.apply_rope(q, positions, inv_freq, mscale)
        k = layers.apply_rope(k, positions, inv_freq, mscale)
    # learned-position archs (gpt2): no rotation — positions entered at
    # the embedding (embed_extras); inv_freq None = cohere2 global layer
    attn_out = attend(q.astype(jnp.bfloat16),
                      k.astype(jnp.bfloat16),
                      v.astype(jnp.bfloat16))
    attn_out = attn_out.reshape(b, tdim, h * d)
    if lw.attn_sub_norm is not None:   # bitnet: rms BEFORE the o-proj
        attn_out = layers.rms_norm(attn_out, lw.attn_sub_norm, hp.rms_eps)
    o = linear_lora(attn_out, lw.wo, lora.get("wo"), out_dtype=jnp.float32)
    if tp_axis is not None:
        # row-parallel wo: every device holds a partial sum over its heads
        o = jax.lax.psum(o, tp_axis)
    if lw.bo is not None:  # starcoder2-style output-projection bias
        o = o + lw.bo
    if lw.attn_post_norm is not None:  # gemma2 sandwich norm
        o = layers.rms_norm(o, lw.attn_post_norm, hp.rms_eps)
    if hp.residual_scale != 1.0:  # granite mup multiplier
        o = o * hp.residual_scale
    x = x + o.astype(x.dtype)

    if lw.ffn_norm_exps is not None:
        # arctic (llm_build_arctic): the dense "residual MLP" rides the
        # post-attention sum while the MoE branch reads the LAYER INPUT
        # through its own norm; both add into the output
        dense_in = layers.rms_norm(x, lw.ffn_norm, hp.rms_eps)
        g, u = gateup_proj(dense_in, lw)
        dense = linear_lora(layers.swiglu(g, u, hp.act_fn), lw.w_down,
                            lora.get("w_down"))
        if tp_axis is not None:
            dense = jax.lax.psum(dense, tp_axis)
        ffn_out = x + dense.astype(x.dtype)
        moe_in = layers.rms_norm(x_in, lw.ffn_norm_exps, hp.rms_eps)
        moe_out = moe_ffn(moe_in, lw, hp, ep_axis=ep_axis, ep=ep)
        x = ffn_out + moe_out.astype(x.dtype)
        if lw.cvec is not None:
            x = x + lw.cvec.astype(x.dtype)
        return x

    return _forward_layer_ffn(x, lw, hp, tp_axis, ep_axis, ep, lora)


def _forward_layer_ffn(x, lw, hp, tp_axis, ep_axis, ep, lora):
    """FFN half of the sequential-residual layer (shared by the standard
    and MLA attention paths)."""
    if hp.norm_type == "ln":   # weights optional: olmo is non-parametric
        cur = layers.layer_norm(x, lw.ffn_norm, lw.ffn_norm_b, hp.rms_eps)
    elif lw.ffn_norm is None:  # olmo2: post-norm only
        cur = x
    else:
        cur = layers.rms_norm(x, lw.ffn_norm, hp.rms_eps)
    if lw.gate_inp is not None:
        ffn = moe_ffn(cur, lw, hp, ep_axis=ep_axis, ep=ep)
    elif lw.w_gate is None and lw.w_gateup is None:
        # non-gated sequential FFN (starcoder2: act(up(x)) @ down)
        ffn = ffn_nongated(cur, lw, hp, lora)
    else:
        g, u = gateup_proj(cur, lw)
        if lw.b_gate is not None:     # jais biased swiglu
            g = g + lw.b_gate
        if lw.b_up is not None:
            u = u + lw.b_up
        act = layers.swiglu(g, u, hp.act_fn)
        if lw.ffn_sub_norm is not None:   # bitnet: rms BEFORE ffn_down
            act = layers.rms_norm(act, lw.ffn_sub_norm, hp.rms_eps)
        ffn = linear_lora(act, lw.w_down, lora.get("w_down"))
    if tp_axis is not None:
        ffn = jax.lax.psum(ffn, tp_axis)  # row-parallel ffn_down partials
    if lw.b_down is not None:
        ffn = ffn + lw.b_down
    if lw.up_shexp is not None:
        ffn = ffn + shared_expert_ffn(cur, lw, hp)
    if hp.residual_scale != 1.0:  # granite mup multiplier
        ffn = ffn * hp.residual_scale
    if lw.ffn_post_norm is not None:
        ffn = layers.rms_norm(ffn, lw.ffn_post_norm, hp.rms_eps)
    x = x + ffn.astype(x.dtype)
    if lw.cvec is not None:
        x = x + lw.cvec.astype(x.dtype)
    return x


def _forward_layer_postnorm(x, lw, hp, positions, inv_freq, mscale, attend):
    """bert-family encoder layer (reference llm_build_bert,
    llama-model.cpp:5191-5350): NO pre-norms — LayerNorm is applied to the
    residual SUMS: x = LN(x + attn(x)); x = LN(x + ffn(x)). Attention runs
    bidirectional (hp.causal False via the engine's causal flag), with
    biases on every projection; positions are learned embeddings (bert,
    added in embed_extras) or NEOX rope (nomic-bert)."""
    b, tdim, c = x.shape
    h, kvh, d = hp.n_head, hp.n_head_kv, hp.head_dim
    lora = lw.lora or {}
    q, k, v = qkv_proj(x, lw, h * d, kvh * d)
    if lw.bq is not None:
        q = q + lw.bq
    if lw.bk is not None:
        k = k + lw.bk
    if lw.bv is not None:
        v = v + lw.bv
    q = q.reshape(b, tdim, h, d)
    k = k.reshape(b, tdim, kvh, d)
    v = v.reshape(b, tdim, kvh, d)
    if hp.pos_embd == "rope":  # nomic-bert; bert uses learned positions
        q = layers.apply_rope(q, positions, inv_freq, mscale)
        k = layers.apply_rope(k, positions, inv_freq, mscale)
    attn = attend(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                  v.astype(jnp.bfloat16)).reshape(b, tdim, h * d)
    o = linear_lora(attn, lw.wo, lora.get("wo"), out_dtype=jnp.float32)
    if lw.bo is not None:
        o = o + lw.bo
    x = layers.layer_norm(x.astype(jnp.float32) + o, lw.attn_out_norm,
                          lw.attn_out_norm_b, hp.rms_eps).astype(x.dtype)
    if lw.w_gate is not None or lw.w_gateup is not None:
        g, u = gateup_proj(x, lw)
        ffn = linear_lora(layers.swiglu(g, u, hp.act_fn), lw.w_down,
                          lora.get("w_down"))
    else:
        ffn = ffn_nongated(x, lw, hp, lora)
    if lw.b_down is not None:
        ffn = ffn + lw.b_down
    x = layers.layer_norm(x.astype(jnp.float32) + ffn, lw.layer_out_norm,
                          lw.layer_out_norm_b, hp.rms_eps).astype(x.dtype)
    return x


def embed_extras(w: LlamaWeights, hp: HParams, x: jax.Array,
                 positions: jax.Array) -> jax.Array:
    """bert-family input-embedding additions (reference llm_build_bert):
    token-type row 0 ("Sentence A" — the reference hardcodes type 0),
    learned absolute position rows, then the embedding LayerNorm."""
    xf = x.astype(jnp.float32)
    if w.type_embd is not None:
        xf = xf + w.type_embd[0]
    if w.pos_embd is not None:
        xf = xf + jnp.take(w.pos_embd, positions, axis=0)
    if w.tok_norm is not None:
        xf = layers.layer_norm(xf, w.tok_norm, w.tok_norm_b, hp.rms_eps)
    return xf.astype(jnp.bfloat16)


def _forward_layer_parallel(x, lw, hp, positions, inv_freq, mscale, attend,
                            tp_axis=None, tp=1):
    """phi2-family layer: ONE LayerNorm feeds both branches and the residual
    adds them in parallel — x + attn(ln(x)) + ffn(ln(x)) (reference
    llm_build_phi2, llama-model.cpp; ffn input is attn_norm_output there
    too). Partial rotary handled inside apply_rope (rope_dim < head_dim)."""
    b, tdim, c = x.shape
    h, kvh, d = hp.n_head // tp, hp.n_head_kv // tp, hp.head_dim
    # phi2/falcon/gptneox/command-r are LayerNorm archs; plamo runs the
    # same parallel-residual shape with rms norms (llm_build_plamo)
    norm = (layers.layer_norm if hp.norm_type == "ln"
            else lambda y, w, b_, eps: layers.rms_norm(y, w, eps))
    cur = norm(x, lw.attn_norm, lw.attn_norm_b, hp.rms_eps)
    # falcon-40B routes the FFN branch through its own LayerNorm; phi2 and
    # falcon-7B feed both branches from the same one (llm_build_falcon:
    # "use the attn norm, not the result")
    if lw.attn_norm_2 is not None:
        ffn_in = norm(x, lw.attn_norm_2, lw.attn_norm_2_b, hp.rms_eps)
    elif lw.ffn_norm is not None:
        # gptneox parallel residual: x + attn(ln1(x)) + ffn(ln2(x)) with a
        # DEDICATED ffn_norm on the layer input (reference
        # llm_build_gptneox:8844-8867); phi2/falcon/stablelm-parallel GGUFs
        # carry no ffn_norm and fall through to the shared attn norm
        ffn_in = norm(x, lw.ffn_norm, lw.ffn_norm_b, hp.rms_eps)
    else:
        ffn_in = cur
    q, k, v = qkv_proj(cur, lw, h * d, kvh * d)
    if lw.bq is not None:
        q = q + lw.bq
    if lw.bk is not None:
        k = k + lw.bk
    if lw.bv is not None:
        v = v + lw.bv
    q = q.reshape(b, tdim, h, d)
    k = k.reshape(b, tdim, kvh, d)
    v = v.reshape(b, tdim, kvh, d)
    if lw.attn_q_norm is not None:
        # Command R+ (use_qk_norm): distinct per-head LayerNorms before
        # rope, weights [H, d] / [KV, d], no bias (reference
        # llm_build_command_r's build_norm LLM_NORM on the head-split view)
        q = layers.layer_norm(q, lw.attn_q_norm, None, hp.rms_eps)
    if lw.attn_k_norm is not None:
        k = layers.layer_norm(k, lw.attn_k_norm, None, hp.rms_eps)
    if inv_freq is not None:  # None = cohere2 global (NoPE) layer
        q = layers.apply_rope(q, positions, inv_freq, mscale)
        k = layers.apply_rope(k, positions, inv_freq, mscale)
    attn_out = attend(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                      v.astype(jnp.bfloat16))
    o = linear(attn_out.reshape(b, tdim, h * d), lw.wo,
               out_dtype=jnp.float32)
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)
    if lw.bo is not None:
        o = o + lw.bo
    if lw.w_gate is not None or lw.w_gateup is not None:
        # command-r: parallel residual with a GATED SwiGLU FFN
        # (llm_build_command_r's build_ffn with gate)
        g, u = gateup_proj(ffn_in, lw)
        act = layers.swiglu(g, u, hp.act_fn)
        ffn = linear(act.astype(jnp.bfloat16), lw.w_down,
                     out_dtype=jnp.float32)
    else:
        ffn = ffn_nongated(ffn_in, lw, hp)
    if tp_axis is not None:
        ffn = jax.lax.psum(ffn, tp_axis)
    if lw.b_down is not None:
        ffn = ffn + lw.b_down
    return x + (o + ffn).astype(x.dtype)


def embed(w: LlamaWeights, tokens: jax.Array,
          scale: float = 1.0) -> jax.Array:
    e = qgather(tokens, w.tok_embd, dtype=jnp.bfloat16)
    if scale != 1.0:  # gemma scales embeddings by sqrt(n_embd)
        e = (e.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    return e


def final_norm(w: LlamaWeights, hp: HParams, x: jax.Array) -> jax.Array:
    """The model's output norm (RMS or LayerNorm+bias per hp.norm_type) —
    shared by lm_head and every pooled-embedding path so LayerNorm archs
    aren't silently rms-normed off the main path."""
    if hp.post_norm:
        # bert-family: every layer already ends with layer_out_norm and
        # there is no final norm tensor (llm_build_bert result_embd)
        return x
    if hp.norm_type == "ln":
        return layers.layer_norm(x, w.output_norm, w.output_norm_b,
                                 hp.rms_eps)
    return layers.rms_norm(x, w.output_norm, hp.rms_eps)


def ffn_nongated(cur, lw, hp, lora=None):
    """Non-gated FFN branch: act(up(x) + b) @ down + b (phi2 family and
    starcoder2 share this shape)."""
    lora = lora or {}
    u = linear_lora(cur, lw.w_up, lora.get("w_up"), out_dtype=jnp.float32)
    if lw.b_up is not None:
        u = u + lw.b_up
    if hp.act_fn == "gelu":
        act = jax.nn.gelu(u, approximate=True)
    elif hp.act_fn == "gelu_erf":
        # bert: HF uses the EXACT erf gelu (ACT2FN['gelu']); ggml's GELU
        # is the tanh approximation — exact form keeps HF logit parity
        act = jax.nn.gelu(u, approximate=False)
    elif hp.act_fn == "relu2":  # nemotron squared ReLU (LLM_FFN_RELU_SQR)
        act = jnp.square(jax.nn.relu(u))
    else:
        act = jax.nn.silu(u)
    return linear_lora(act.astype(jnp.bfloat16), lw.w_down,
                       lora.get("w_down"))


def lm_head(w: LlamaWeights, hp: HParams, x: jax.Array,
            tp_axis: str | None = None) -> jax.Array:
    """Final norm + output projection -> f32 logits [.., n_vocab].
    Under TP the head is column-sharded over the vocab; local logits are
    all-gathered (tiled) so every device returns full [.., n_vocab]."""
    x = final_norm(w, hp, x)
    logits = linear(x, w.output, out_dtype=jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=x.ndim - 1,
                                    tiled=True)
    if w.output_b is not None:  # phi2 LM-head bias
        logits = logits + w.output_b
    if hp.logits_scale != 1.0:  # granite: logits divided by logit_scale
        logits = logits / hp.logits_scale
    if hp.final_softcap > 0:  # gemma2 final logit softcapping
        logits = jnp.tanh(logits / hp.final_softcap) * hp.final_softcap
    return logits
