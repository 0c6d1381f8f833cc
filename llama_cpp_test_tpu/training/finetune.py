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

    def run_layer(x, lw2, li):
        return llama_mod.forward_layer(x, lw2, hp, positions,
                                       w.rope_inv_freq, w.rope_mscale,
                                       attend, li=li)

    step = jax.checkpoint(run_layer, static_argnums=(2,)) if remat \
        else run_layer
    for li, lw in enumerate(w.layers):
        lora = {}
        for f in TARGETS:
            p = params.get(f"blk.{li}.{f}")
            if p is not None:
                lora[f] = (p["a"].astype(jnp.bfloat16),
                           p["b"].astype(jnp.bfloat16), scale)
        lw2 = dataclasses.replace(lw, lora=lora)
        x = step(x, lw2, li)
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


# ---------------------------------------------------------------------------
# full-weight training (the rest of the ggml-opt surface: every projection,
# norm, embedding and the head train — not just low-rank factors)


FULL_NORMS = ("attn_norm", "ffn_norm")


def _dense_qt(arr: jax.Array):
    """Trainable [K, N] plane -> a dense layout-'t' QTensor the existing
    linear/qmm path consumes (differentiable w.r.t. the array: QTensor is a
    registered pytree and the dense branch is one dot)."""
    from ..quant.repack import QTensor

    k, n = arr.shape
    return QTensor("dense", (n, k), n, k, arr, layout="t")


def _split_fused_dense(qt) -> list[np.ndarray]:
    """Dequantize a fused (fuse_qtensors) plane and un-interleave the
    h-major packed columns back into per-constituent [n_orig_i, K] rows."""
    from ..quant.repack import dequantize_qtensor_np

    dense = dequantize_qtensor_np(qt)          # [pack*NPK_total, K]
    npk_tot = qt.npk
    outs, off = [], 0
    for npk_i, n_orig_i in qt.parts:
        c = np.arange(n_orig_i)
        idx = (c // npk_i) * npk_tot + off + (c % npk_i)
        outs.append(dense[idx])
        off += npk_i
    return outs


def init_full_params(model) -> dict:
    """Dequantize every trainable tensor to f32 master weights.

    Layout: projections as [K, N] planes (matmul orientation), norms as
    [C], token embedding as [V, C] rows, output head as [K=C, V] plane.
    Load-time fused planes (wqkv / w_gateup) are split back into their
    constituents so training mirrors the checkpoint's tensor set."""
    from ..quant.repack import dequantize_qtensor_np

    w = model.weights
    hp = model.hp
    params: dict = {}
    params["tok_embd"] = jnp.asarray(
        dequantize_qtensor_np(w.tok_embd)[: hp.n_vocab], jnp.float32)
    params["output"] = jnp.asarray(
        np.ascontiguousarray(
            dequantize_qtensor_np(w.output)[: hp.n_vocab].T), jnp.float32)
    params["output_norm"] = jnp.asarray(w.output_norm, jnp.float32)

    def put(li, f, rows):
        params[f"blk.{li}.{f}"] = jnp.asarray(
            np.ascontiguousarray(np.asarray(rows, np.float32).T),
            jnp.float32)

    for li, lw in enumerate(w.layers):
        for f in TARGETS:
            qt = getattr(lw, f)
            if qt is not None:
                put(li, f, dequantize_qtensor_np(qt)[: qt.n_orig])
        if lw.wqkv is not None:
            for f, rows in zip(("wq", "wk", "wv"),
                               _split_fused_dense(lw.wqkv)):
                put(li, f, rows)
        if lw.w_gateup is not None:
            for f, rows in zip(("w_gate", "w_up"),
                               _split_fused_dense(lw.w_gateup)):
                put(li, f, rows)
        for f in FULL_NORMS:
            v = getattr(lw, f)
            if v is not None:
                params[f"blk.{li}.{f}"] = jnp.asarray(v, jnp.float32)
    return params


def _full_forward(w: LlamaWeights, hp: HParams, params: dict,
                  tokens: jax.Array, remat: bool) -> jax.Array:
    """Teacher-forced forward where every trainable tensor comes from
    `params` (frozen structure from `w`: rope tables, optional biases)."""
    b, t = tokens.shape
    x = (params["tok_embd"][tokens] * (hp.embd_scale or 1.0)) \
        .astype(jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None],
                                 (b, t))
    mask = jnp.broadcast_to(jnp.tril(jnp.ones((t, t), bool))[None],
                            (b, t, t))
    from ..models.hparams import attn_scale_of
    att_scale = attn_scale_of(hp)

    def attend(q, k_cur, v_cur):
        return layers.attention(q, k_cur, v_cur, mask, att_scale,
                                softcap=hp.attn_softcap)

    def run_layer(x, lw2, li):
        return llama_mod.forward_layer(x, lw2, hp, positions,
                                       w.rope_inv_freq, w.rope_mscale,
                                       attend, li=li)

    step = jax.checkpoint(run_layer, static_argnums=(2,)) if remat \
        else run_layer
    for li, lw in enumerate(w.layers):
        repl = {}
        for f in TARGETS:
            p = params.get(f"blk.{li}.{f}")
            if p is not None:
                repl[f] = _dense_qt(p)
        # trainable projections replace any load-time fused planes
        if "wq" in repl:
            repl["wqkv"] = None
        if "w_gate" in repl:
            repl["w_gateup"] = None
        for f in FULL_NORMS:
            p = params.get(f"blk.{li}.{f}")
            if p is not None:
                repl[f] = p
        x = step(x, dataclasses.replace(lw, **repl), li)
    x = layers.rms_norm(x, params["output_norm"], hp.rms_eps)
    logits = jax.lax.dot_general(
        x.astype(jnp.bfloat16), params["output"].astype(jnp.bfloat16),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if hp.final_softcap > 0:
        logits = jnp.tanh(logits / hp.final_softcap) * hp.final_softcap
    return logits


def _full_loss(w, hp, params, tokens, remat):
    logits = _full_forward(w, hp, params, tokens[:, :-1], remat)
    tgt = tokens[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - gold)


class FullTrainer:
    """Full-weight AdamW finetuner: the complete ggml-opt surface (every
    projection/norm/embedding trains on f32 master weights dequantized from
    the loaded checkpoint; optimizer state rides the same pytree). The
    train step is one jitted value_and_grad with optional per-layer remat.
    Export with export_full_gguf -> a plain GGUF the engine reloads."""

    def __init__(self, model, cfg: TrainConfig | None = None):
        import optax

        self.model = model
        self.cfg = cfg or TrainConfig()
        self.hp = model.hp
        if self.hp.norm_type != "rms":
            raise NotImplementedError(
                "FullTrainer trains RMSNorm architectures; LayerNorm "
                "archs (stablelm/phi2-family) are not wired yet")
        self.params = init_full_params(model)
        self.opt = optax.adamw(self.cfg.lr,
                               weight_decay=self.cfg.weight_decay)
        self.opt_state = self.opt.init(self.params)
        w, hp, remat = model.weights, self.hp, self.cfg.remat

        @jax.jit
        def train_step(params, opt_state, tokens):
            loss, grads = jax.value_and_grad(
                lambda p: _full_loss(w, hp, p, tokens, remat))(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = train_step

    def step(self, tokens: np.ndarray) -> float:
        tokens = jnp.asarray(tokens, jnp.int32)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, tokens)
        return float(loss)

    def eval_loss(self, tokens: np.ndarray) -> float:
        return float(_full_loss(self.model.weights, self.hp, self.params,
                                jnp.asarray(tokens, jnp.int32), False))

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


def export_full_gguf(trainer: FullTrainer, path: str,
                     dtype: str = "F16") -> None:
    """Write the trained weights as a plain GGUF the engine reloads.
    NORM-rope models un-permute attn_q/attn_k rows back to GGUF layout
    (inverse of load_weights' load-time permutation)."""
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter
    from ..models.llama import _unpermute_rows

    hp = trainer.hp
    reader = trainer.model.reader
    gt = {"F16": GGMLType.F16, "F32": GGMLType.F32,
          "BF16": GGMLType.BF16}[dtype]
    q_perm = k_perm = None
    if hp.rope_type == "norm":
        q_perm = _unpermute_rows(hp.n_head, hp.head_dim)
        k_perm = _unpermute_rows(hp.n_head_kv, hp.head_dim)

    w = GGUFWriter(path, arch=hp.arch)
    for key, val in reader.metadata.items():
        w.add_kv(key, val)
    p = trainer.params
    emb = np.asarray(p["tok_embd"], np.float32)
    w.add_tensor("token_embd.weight", emb, ggml_type=gt)
    w.add_tensor("output_norm.weight", np.asarray(p["output_norm"],
                                                  np.float32),
                 ggml_type=GGMLType.F32)
    w.add_tensor("output.weight",
                 np.ascontiguousarray(np.asarray(p["output"]).T),
                 ggml_type=gt)
    names = {"wq": "attn_q", "wk": "attn_k", "wv": "attn_v",
             "wo": "attn_output", "w_gate": "ffn_gate", "w_up": "ffn_up",
             "w_down": "ffn_down", "attn_norm": "attn_norm",
             "ffn_norm": "ffn_norm"}
    for li in range(hp.n_layer):
        for f, base in names.items():
            key = f"blk.{li}.{f}"
            if key not in p:
                continue
            arr = np.asarray(p[key], np.float32)
            if f in FULL_NORMS:
                w.add_tensor(f"blk.{li}.{base}.weight", arr,
                             ggml_type=GGMLType.F32)
                continue
            rows = np.ascontiguousarray(arr.T)      # [N, K] GGUF rows
            if f == "wq" and q_perm is not None:
                stored = np.empty_like(rows)
                stored[q_perm] = rows
                rows = stored
            elif f == "wk" and k_perm is not None:
                stored = np.empty_like(rows)
                stored[k_perm] = rows
                rows = stored
            w.add_tensor(f"blk.{li}.{base}.weight", rows, ggml_type=gt)
    w.write()
