"""Importance-matrix collection (the examples/imatrix analogue,
reference examples/imatrix/imatrix.cpp:37-72).

The reference intercepts every MUL_MAT through the scheduler's eval callback
and accumulates per-column second moments of the activations feeding each
weight. Here the equivalent is a dedicated jitted forward pass that returns
those sums directly (XLA fuses the squared-reductions into the layer
compute): for each layer, the RMS-normed attention input (feeds wq/wk/wv),
the attention output (feeds wo), the RMS-normed FFN input (feeds gate/up)
and the SwiGLU activation (feeds ffn_down).

Saved as .npz {tensor_name: sumsq[K], __counts__}; consumed by
quant.quantize_model for weighted (imatrix-aware) requantization.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as llama_mod
from ..models.hparams import HParams
from ..models.llama import LlamaWeights
from ..ops import layers


@functools.partial(jax.jit, static_argnames=("hp",))
def _imatrix_step(w: LlamaWeights, tokens, *, hp: HParams):
    """tokens [1, T] -> dict name -> per-column sum of squares."""
    b, t = tokens.shape
    x = llama_mod.embed(w, tokens)
    from ..models.hparams import attn_scale_of, layer_window

    pos = jnp.arange(t, dtype=jnp.int32)[None, :]
    scale = attn_scale_of(hp)
    mask = jnp.tril(jnp.ones((t, t), bool))[None]
    stats = {}

    def record(name, act):
        stats[name] = jnp.sum(
            act.astype(jnp.float32) ** 2, axis=tuple(range(act.ndim - 1)))

    for li, lw in enumerate(w.layers):
        p = f"blk.{li}."
        cur = layers.rms_norm(x, lw.attn_norm, hp.rms_eps)
        record(p + "attn_q.weight", cur)
        record(p + "attn_k.weight", cur)
        record(p + "attn_v.weight", cur)

        def attend(q, k, v):
            return layers.attention(q, k, v, mask, scale)

        # replicate forward_layer's attention inline so we can tap attn_out
        h, kvh, d = hp.n_head, hp.n_head_kv, hp.head_dim
        from ..models.llama import linear, qkv_proj

        q, k, v = qkv_proj(cur, lw, h * d, kvh * d)
        q = q.reshape(b, t, h, d)
        k = k.reshape(b, t, kvh, d)
        v = v.reshape(b, t, kvh, d)
        ifr = w.inv_freq_for(layer_window(hp, li))
        q = layers.apply_rope(q, pos, ifr, w.rope_mscale)
        k = layers.apply_rope(k, pos, ifr, w.rope_mscale)
        att = attend(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16)).reshape(b, t, h * d)
        record(p + "attn_output.weight", att)
        x = x + linear(att, lw.wo).astype(x.dtype)

        cur = layers.rms_norm(x, lw.ffn_norm, hp.rms_eps)
        if lw.gate_inp is not None:
            record(p + "ffn_gate_inp.weight", cur)
            record(p + "ffn_gate_exps.weight", cur)
            record(p + "ffn_up_exps.weight", cur)
            ffn = llama_mod.moe_ffn(cur, lw, hp)
            x = x + ffn.astype(x.dtype)
        else:
            record(p + "ffn_gate.weight", cur)
            record(p + "ffn_up.weight", cur)
            from ..models.llama import gateup_proj

            g, u = gateup_proj(cur, lw)
            act = layers.swiglu(g, u)
            record(p + "ffn_down.weight", act)
            x = x + linear(act, lw.w_down).astype(x.dtype)
    x = llama_mod.final_norm(w, hp, x)
    record("output.weight", x)
    return stats


class IMatrixCollector:
    def __init__(self, model):
        self.model = model
        self.sums: dict[str, np.ndarray] = {}
        self.counts: dict[str, int] = {}

    def collect(self, tokens: list[int], chunk: int = 512) -> None:
        for i in range(0, len(tokens) - 1, chunk):
            part = tokens[i:i + chunk]
            if len(part) < 16:
                break
            arr = np.asarray(part, np.int32)[None]
            stats = _imatrix_step(self.model.weights, arr, hp=self.model.hp)
            for name, v in stats.items():
                v = np.asarray(v)
                if name in self.sums:
                    self.sums[name] += v
                else:
                    self.sums[name] = v.copy()
                self.counts[name] = self.counts.get(name, 0) + len(part)

    def save(self, path: str) -> None:
        arrays = {f"sum::{k}": v for k, v in self.sums.items()}
        arrays["__counts__"] = np.asarray(
            [[hash(k) & 0x7FFFFFFF, c] for k, c in self.counts.items()])
        arrays["__names__"] = np.asarray(list(self.sums), dtype=object)
        np.savez(path, **{k: v for k, v in arrays.items()
                          if k != "__names__"},
                 __names__=np.array("\n".join(self.sums), dtype="U"))

    @staticmethod
    def load(path: str) -> dict[str, np.ndarray]:
        data = np.load(path)
        names = str(data["__names__"]).split("\n")
        return {n: data[f"sum::{n}"] for n in names if f"sum::{n}" in data}


def main(argv=None) -> int:
    import argparse
    import sys

    ap = argparse.ArgumentParser("llama-imatrix (tpu)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="calibration text")
    ap.add_argument("-o", "--output", default="imatrix.npz")
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args(argv)

    from .engine import Model

    model = Model(args.model)
    with open(args.file, encoding="utf-8") as f:
        text = f.read()
    tokens = model.tokenizer.encode(text, add_special=True)
    coll = IMatrixCollector(model)
    coll.collect(tokens, chunk=args.chunk)
    coll.save(args.output)
    print(f"collected imatrix for {len(coll.sums)} tensors over "
          f"{len(tokens)} tokens -> {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
