"""LoRA adapters (the llama-adapter analogue, reference src/llama-adapter.h).

Loads a LoRA GGUF (tensors `<base>.lora_a` [r, K] / `<base>.lora_b` [N, r],
metadata adapter.lora.alpha) and attaches the low-rank pairs to the model's
LayerWeights so every matmul runs y = W_q x + scale * B (A x) with
scale = alpha / r (llama-adapter.h:46-61, applied per-matmul via
build_lora_mm llama-graph.h:418).

NORM-rope models: lora_b rows for attn_q/attn_k are row-permuted exactly like
the base weights so the half-split rotation stays consistent.

Also provides merge_lora(): bake adapters into a dense GGUF
(the export-lora tool analogue).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter
from .hparams import HParams
from .llama import LlamaWeights, _unpermute_rows

# LayerWeights field <-> GGUF tensor base name
_TARGETS = {
    "wq": "attn_q.weight", "wk": "attn_k.weight", "wv": "attn_v.weight",
    "wo": "attn_output.weight", "w_gate": "ffn_gate.weight",
    "w_up": "ffn_up.weight", "w_down": "ffn_down.weight",
}


@dataclasses.dataclass
class LoraPair:
    a: Any  # [r, K]
    b: Any  # [N, r]
    scale: float


@dataclasses.dataclass
class LoraAdapter:
    """name -> LoraPair, keyed by full GGUF tensor name (blk.N.attn_q.weight)."""
    pairs: dict
    alpha: float
    rank: int


def load_lora(path: str, hp: HParams) -> LoraAdapter:
    with GGUFReader(path) as r:
        alpha = float(r.metadata.get("adapter.lora.alpha", 16.0))
        tensors = {}
        for name in r.tensors:
            tensors[name] = r.dequantize(name, np.float32)
    pairs: dict[str, LoraPair] = {}
    rank = 0
    q_perm = k_perm = None
    if hp.rope_type == "norm":
        q_perm = _unpermute_rows(hp.n_head, hp.head_dim)
        k_perm = _unpermute_rows(hp.n_head_kv, hp.head_dim)
    for name, arr in tensors.items():
        if not name.endswith(".lora_a"):
            continue
        base = name[: -len(".lora_a")]
        b_name = base + ".lora_b"
        if b_name not in tensors:
            continue
        a = arr  # [r, K] (ggml ne (K, r) -> numpy (r, K))
        b = tensors[b_name]  # [N, r]
        rank = a.shape[0]
        if base.endswith("attn_q.weight") and q_perm is not None:
            b = b[q_perm]
        elif base.endswith("attn_k.weight") and k_perm is not None:
            b = b[k_perm]
        pairs[base] = LoraPair(a=a, b=b, scale=alpha / max(rank, 1))
    if not pairs:
        raise ValueError(f"{path}: no lora_a/lora_b tensor pairs found")
    return LoraAdapter(pairs=pairs, alpha=alpha, rank=rank)


def attach_lora(weights: LlamaWeights, adapter: LoraAdapter,
                user_scale: float = 1.0) -> LlamaWeights:
    """Returns weights with .lora dicts populated (device arrays, bf16)."""
    import jax.numpy as jnp

    for li, lw in enumerate(weights.layers):
        lora = {}
        for field, suffix in _TARGETS.items():
            pair = adapter.pairs.get(f"blk.{li}.{suffix}")
            if pair is not None:
                lora[field] = (jnp.asarray(pair.a, jnp.bfloat16),
                               jnp.asarray(pair.b, jnp.bfloat16),
                               pair.scale * user_scale)
        lw.lora = lora
    return weights


def attach_loras(weights: LlamaWeights,
                 scaled: list[tuple[LoraAdapter, float]]) -> LlamaWeights:
    """Attach several adapters at once (the server /lora-adapters analogue,
    reference common_init_from_params multi-adapter loop). Pairs targeting the
    same tensor are stacked along the rank axis with user scales folded into
    B, so y = W x + sum_i s_i * B_i (A_i x) stays a single low-rank update:
    A' = concat_r(A_i), B' = concat_r(s_i * scale_i * B_i), scale' = 1."""
    import jax.numpy as jnp

    for li, lw in enumerate(weights.layers):
        lora = {}
        for field, suffix in _TARGETS.items():
            parts = []
            for adapter, s in scaled:
                if s == 0.0:
                    continue
                pair = adapter.pairs.get(f"blk.{li}.{suffix}")
                if pair is not None:
                    parts.append((pair.a, pair.b * (pair.scale * s)))
            if not parts:
                continue
            a = np.concatenate([p[0] for p in parts], axis=0)
            b = np.concatenate([p[1] for p in parts], axis=1)
            lora[field] = (jnp.asarray(a, jnp.bfloat16),
                           jnp.asarray(b, jnp.bfloat16), 1.0)
        lw.lora = lora
    return weights


def merge_lora(src_model: str, lora_path: str, dst: str,
               user_scale: float = 1.0) -> int:
    """Bake a LoRA into a dense F16 GGUF (export-lora analogue).
    Returns number of merged tensors."""
    from .hparams import hparams_from_metadata

    with GGUFReader(src_model) as r:
        hp = hparams_from_metadata(r.metadata)
        adapter = load_lora(lora_path, HParams(arch=hp.arch,
                                               rope_type="neox"))
        # merge in the model's own (unpermuted) space: load_lora with neox
        # skips permutation; base rows are raw GGUF rows here
        w = GGUFWriter(dst)
        for key, val in r.metadata.items():
            w.add_kv(key, val)
        merged = 0
        for name, info in r.tensors.items():
            dense = r.dequantize(name, np.float32)
            pair = adapter.pairs.get(name)
            if pair is not None and dense.ndim == 2:
                delta = (pair.b @ pair.a) * (pair.scale * user_scale)
                dense = dense + delta.reshape(dense.shape)
                merged += 1
            tgt = GGMLType.F16 if dense.ndim >= 2 else GGMLType.F32
            w.add_tensor(name, dense, ggml_type=tgt)
        w.write()
    return merged
