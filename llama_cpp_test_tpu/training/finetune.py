"""LoRA finetuning on top of a frozen quantized base model.

The TPU-native optimizer/training subsystem (the ggml-opt.cpp analogue):
the base GGUF weights stay frozen in their packed quantized form (the fused
dequant-matmul path is differentiable w.r.t. activations), and only the
low-rank LoRA A/B factors train — AdamW via optax, the whole train step one
jitted value_and_grad with per-layer jax.checkpoint (remat trades FLOPs for
HBM exactly where ggml-opt re-plans its graph allocator).

Exports the result as a LoRA GGUF that models/lora.py:load_lora round-trips,
including the NORM-rope row permutation for attn_q/attn_k.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as llama_mod
from ..models.hparams import HParams
from ..models.llama import LlamaWeights
from ..ops import layers

# trainable targets: LayerWeights field -> GGUF tensor base (models/lora.py)
TARGETS = {
    "wq": "attn_q.weight", "wk": "attn_k.weight", "wv": "attn_v.weight",
    "wo": "attn_output.weight", "w_gate": "ffn_gate.weight",
    "w_up": "ffn_up.weight", "w_down": "ffn_down.weight",
}

# field -> (out_width_fn, in_width_fn)
def _dims(hp: HParams) -> dict:
    c, ff = hp.n_embd, hp.n_ff
    nq, nkv = hp.n_head * hp.head_dim, hp.n_head_kv * hp.head_dim
    return {
        "wq": (nq, c), "wk": (nkv, c), "wv": (nkv, c), "wo": (c, nq),
        "w_gate": (ff, c), "w_up": (ff, c), "w_down": (c, ff),
    }


@dataclasses.dataclass
class TrainConfig:
    rank: int = 8
    alpha: float = 16.0
    lr: float = 1e-3
    weight_decay: float = 0.01
    targets: tuple = ("wq", "wv")   # classic LoRA default
    seed: int = 0
    remat: bool = True              # jax.checkpoint per layer


def init_lora_params(hp: HParams, cfg: TrainConfig) -> dict:
    """{"blk.{i}.{field}": {"a": [r, K] f32 (gaussian), "b": [N, r] zeros}}.
    b = 0 makes the initial delta zero (standard LoRA init)."""
    rng = np.random.default_rng(cfg.seed)
    dims = _dims(hp)
    params = {}
    for i in range(hp.n_layer):
        for f in cfg.targets:
            n, k = dims[f]
            params[f"blk.{i}.{f}"] = {
                "a": jnp.asarray(
                    rng.standard_normal((cfg.rank, k)) / math.sqrt(k),
                    jnp.float32),
                "b": jnp.zeros((n, cfg.rank), jnp.float32),
            }
    return params


def _train_forward(w: LlamaWeights, hp: HParams, params: dict, scale: float,
                   tokens: jax.Array, remat: bool) -> jax.Array:
    """Teacher-forced forward, full causal attention (no KV cache).
    tokens [B, T] -> logits [B, T, V]."""
    b, t = tokens.shape
    x = llama_mod.embed(w, tokens, hp.embd_scale)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    mask = jnp.tril(jnp.ones((t, t), bool))[None]
    mask = jnp.broadcast_to(mask, (b, t, t))
    from ..models.hparams import attn_scale_of
    att_scale = attn_scale_of(hp)

    def attend(q, k_cur, v_cur):
        return layers.attention(q, k_cur, v_cur, mask, att_scale,
                                softcap=hp.attn_softcap)

    def run_layer(x, lw2):
        return llama_mod.forward_layer(x, lw2, hp, positions,
                                       w.rope_inv_freq, w.rope_mscale, attend)

    step = jax.checkpoint(run_layer) if remat else run_layer
    for li, lw in enumerate(w.layers):
        lora = {}
        for f in TARGETS:
            p = params.get(f"blk.{li}.{f}")
            if p is not None:
                lora[f] = (p["a"].astype(jnp.bfloat16),
                           p["b"].astype(jnp.bfloat16), scale)
        lw2 = dataclasses.replace(lw, lora=lora)
        x = step(x, lw2)
    return llama_mod.lm_head(w, hp, x)


def _loss(w, hp, params, scale, tokens, remat):
    """Mean next-token cross-entropy over tokens[:, :-1] -> tokens[:, 1:]."""
    logits = _train_forward(w, hp, params, scale, tokens[:, :-1], remat)
    tgt = tokens[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - gold)


class LoraTrainer:
    """AdamW LoRA finetuner over a loaded Model (runtime.engine.Model)."""

    def __init__(self, model, cfg: TrainConfig | None = None):
        import optax

        self.model = model
        self.cfg = cfg or TrainConfig()
        self.hp = model.hp
        self.scale = self.cfg.alpha / self.cfg.rank
        self.params = init_lora_params(self.hp, self.cfg)
        self.opt = optax.adamw(self.cfg.lr,
                               weight_decay=self.cfg.weight_decay)
        self.opt_state = self.opt.init(self.params)
        w, hp, scale, remat = model.weights, self.hp, self.scale, self.cfg.remat

        @jax.jit
        def train_step(params, opt_state, tokens):
            loss, grads = jax.value_and_grad(
                lambda p: _loss(w, hp, p, scale, tokens, remat))(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = train_step

    def step(self, tokens: np.ndarray) -> float:
        """One AdamW step on a [B, T] int32 token batch. Returns the loss."""
        tokens = jnp.asarray(tokens, jnp.int32)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, tokens)
        return float(loss)

    def eval_loss(self, tokens: np.ndarray) -> float:
        tokens = jnp.asarray(tokens, jnp.int32)
        return float(_loss(self.model.weights, self.hp, self.params,
                           self.scale, tokens, False))

    def train(self, batches: Sequence[np.ndarray],
              epochs: int = 1, log=None) -> list[float]:
        losses = []
        for e in range(epochs):
            for tb in batches:
                losses.append(self.step(tb))
                if log:
                    log(f"epoch {e} step {len(losses)}: "
                        f"loss {losses[-1]:.4f}")
        return losses


def export_lora_gguf(params: dict, hp: HParams, cfg: TrainConfig,
                     path: str) -> None:
    """Write the trained factors as a LoRA GGUF loadable by load_lora.
    For NORM-rope models the attn_q/attn_k B rows are permuted into GGUF
    layout (the inverse of load_lora's unpermute)."""
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter
    from ..models.llama import _unpermute_rows

    q_perm = k_perm = None
    if hp.rope_type == "norm":
        q_perm = _unpermute_rows(hp.n_head, hp.head_dim)
        k_perm = _unpermute_rows(hp.n_head_kv, hp.head_dim)

    w = GGUFWriter(path, arch=hp.arch)
    w.add_kv("general.architecture", hp.arch)
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", float(cfg.alpha))
    for key, pair in params.items():
        # key = blk.{i}.{field}
        blk, i, field = key.split(".", 2)
        base = f"blk.{i}.{TARGETS[field]}"
        a = np.asarray(pair["a"], np.float32)
        b = np.asarray(pair["b"], np.float32)
        if field == "wq" and q_perm is not None:
            stored = np.empty_like(b)
            stored[q_perm] = b
            b = stored
        elif field == "wk" and k_perm is not None:
            stored = np.empty_like(b)
            stored[k_perm] = b
            b = stored
        w.add_tensor(base + ".lora_a", a, ggml_type=GGMLType.F32)
        w.add_tensor(base + ".lora_b", b, ggml_type=GGMLType.F32)
    w.write()
