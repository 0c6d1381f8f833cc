"""Control vectors (the llama_adapter_cvec analogue, reference
src/llama-adapter.h:17 + common control-vector loading).

A control-vector GGUF carries per-layer direction tensors
`direction.<layer>` (1-based layer index, [n_embd] f32). At inference the
scaled direction is added to the hidden state after each decoder layer
(reference: cvec applied at the end of each layer via cb(cur, "l_out", il)).

Also provides the cvector-generator analogue: PCA over hidden-state
differences between positive and negative prompts (reference
examples/cvector-generator).
"""
from __future__ import annotations

import numpy as np

from ..gguf.reader import open_gguf
from ..gguf.writer import GGUFWriter
from .llama import LlamaWeights


def load_control_vector(path: str) -> dict[int, np.ndarray]:
    """layer (1-based) -> direction [n_embd] f32."""
    out: dict[int, np.ndarray] = {}
    with open_gguf(path) as r:
        for name in r.tensors:
            if not name.startswith("direction."):
                continue
            il = int(name.split(".")[1])
            out[il] = r.dequantize(name, np.float32).reshape(-1)
    if not out:
        raise ValueError(f"{path}: no direction.<layer> tensors")
    return out


def attach_control_vector(weights: LlamaWeights,
                          directions: dict[int, np.ndarray],
                          strength: float = 1.0,
                          layer_start: int = 1,
                          layer_end: int = 0) -> LlamaWeights:
    """Set per-layer cvec biases (llama_apply_adapter_cvec analogue;
    layer range mirrors --control-vector-layer-range)."""
    import jax.numpy as jnp

    n_layer = len(weights.layers)
    if layer_end <= 0:
        layer_end = n_layer
    for li, lw in enumerate(weights.layers):
        il = li + 1  # cvector files use 1-based layer ids
        d = directions.get(il)
        if d is not None and layer_start <= il <= layer_end:
            lw.cvec = jnp.asarray(d * strength, jnp.float32)
        else:
            lw.cvec = None
    return weights


def detach_control_vector(weights: LlamaWeights) -> LlamaWeights:
    for lw in weights.layers:
        lw.cvec = None
    return weights


# ---------------------------------------------------------------------------
# generator (examples/cvector-generator analogue)


def generate_control_vector(ctx, positive_prompts: list[str],
                            negative_prompts: list[str],
                            out_path: str) -> dict[int, np.ndarray]:
    """PCA control-vector extraction: for each layer, take the dominant
    principal component of (positive - negative) mean hidden states across
    prompt pairs, sign-aligned with the mean difference."""
    from ..runtime.tracing import trace_eval

    tok = ctx.model.tokenizer
    n_layer = ctx.model.hp.n_layer
    diffs: list[list[np.ndarray]] = [[] for _ in range(n_layer)]
    for pos_p, neg_p in zip(positive_prompts, negative_prompts):
        tp = trace_eval(ctx, tok.encode(pos_p), keep_values=True)
        tn = trace_eval(ctx, tok.encode(neg_p), keep_values=True)
        for li in range(n_layer):
            hp_ = tp[1 + li].values.mean(axis=0)  # mean over tokens [C]
            hn_ = tn[1 + li].values.mean(axis=0)
            diffs[li].append(hp_ - hn_)
    directions: dict[int, np.ndarray] = {}
    for li in range(n_layer):
        d = np.stack(diffs[li])  # [n_pairs, C]
        mean_diff = d.mean(axis=0)
        if d.shape[0] == 1:
            v = mean_diff
        else:
            # dominant principal component of the diff matrix
            dc = d - d.mean(axis=0, keepdims=True)
            _, _, vt = np.linalg.svd(dc, full_matrices=False)
            v = vt[0]
            if np.dot(v, mean_diff) < 0:
                v = -v
        nrm = np.linalg.norm(v)
        if nrm > 0:
            v = v / nrm
        directions[li + 1] = v.astype(np.float32)
    w = GGUFWriter(out_path, arch="controlvector")
    w.add_kv("general.architecture", "controlvector")
    w.add_kv("controlvector.model_hint", ctx.model.hp.arch)
    w.add_kv("controlvector.layer_count", n_layer)
    for il, v in directions.items():
        w.add_tensor(f"direction.{il}", v)
    w.write()
    return directions
