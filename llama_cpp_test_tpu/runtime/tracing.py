"""Per-layer activation tracing — the eval-callback analogue.

The reference hooks the backend scheduler's eval callback to observe every
tensor during graph execution (examples/eval-callback/eval-callback.cpp;
ggml_backend_sched_eval_callback ggml-backend.h:289). Under XLA there is no
node-by-node execution to hook, so the tracer runs a dedicated jitted
forward that returns every layer's hidden state (plus embeddings and final
logits) and summarizes them host-side — same observability, one dispatch.

Used for debugging numerics and as the collection point for tools that need
activation statistics (the imatrix collector has its own hook in
runtime/imatrix.py).
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as llama_mod
from ..models.hparams import HParams
from .engine import TOKEN_BUCKETS, Context, _bucket
from . import kv_cache


@functools.partial(jax.jit, static_argnames=("hp",))
def _trace_step(w, pools, tokens, positions, block_table, slots, kv_len,
                *, hp: HParams):
    """Prefill forward that also returns per-layer hidden states.
    Pools are NOT donated (the trace must not disturb engine state)."""
    from ..models.hparams import attn_scale_of, layer_window

    x = llama_mod.embed(w, tokens)
    scale = attn_scale_of(hp)
    traces = [x]
    new_k, new_v = list(pools.k), list(pools.v)
    for li, lw in enumerate(w.layers):
        wind = layer_window(hp, li)

        def attend(q, k_cur, v_cur, _li=li, _w=wind):
            new_k[_li] = kv_cache.write_kv(new_k[_li], k_cur, slots)
            new_v[_li] = kv_cache.write_kv(new_v[_li], v_cur, slots)
            return kv_cache.attend_prefill(
                q, new_k[_li], new_v[_li], block_table, positions, kv_len,
                scale, _w)

        x = llama_mod.forward_layer(
            x, lw, hp, positions, w.inv_freq_for(wind), w.rope_mscale,
            attend, li=li)
        traces.append(x)
    logits = llama_mod.lm_head(w, hp, x)
    traces.append(logits)
    return traces


@dataclasses.dataclass
class TensorTrace:
    name: str
    shape: tuple
    mean: float
    std: float
    amax: float
    values: np.ndarray  # the tensor itself (fp32)


def trace_eval(ctx: Context, tokens: list[int],
               keep_values: bool = False) -> list[TensorTrace]:
    """Run one traced prefill of `tokens` on a throwaway sequence and return
    per-layer summaries (eval-callback's ggml_debug printout, structured)."""
    if ctx.mesh is not None:
        raise NotImplementedError("trace_eval: single-device only")
    hp = ctx.model.hp
    s = ctx.new_seq()
    try:
        n = len(tokens)
        slots = s.table.append_tokens(n)
        ctx._drain_copies([s])
        tb = _bucket(n, TOKEN_BUCKETS)
        tok = np.zeros((1, tb), np.int32)
        tok[0, :n] = tokens
        pos = np.zeros((1, tb), np.int32)
        pos[0, :n] = np.arange(n)
        slot_arr = np.full((1, tb), -1, np.int32)
        slot_arr[0, :n] = slots
        bt = ctx._table_arr([s])
        kv_len = np.asarray([n], np.int32)
        tensors = _trace_step(ctx.w, ctx.pools, tok, pos, bt,
                              slot_arr, kv_len, hp=hp)
        names = ["inp_embd"] + \
            [f"l_out-{i}" for i in range(hp.n_layer)] + ["result_output"]
        out = []
        for name, t in zip(names, tensors):
            a = np.asarray(t[0, :n] if t.ndim == 3 else t,
                           dtype=np.float32)
            out.append(TensorTrace(
                name=name, shape=tuple(a.shape),
                mean=float(a.mean()), std=float(a.std()),
                amax=float(np.abs(a).max()),
                values=a if keep_values else np.empty(0, np.float32)))
        return out
    finally:
        ctx.free_seq(s)


def print_traces(traces: list[TensorTrace], file=None) -> None:
    for t in traces:
        print(f"{t.name:>16} {str(t.shape):>18}  mean={t.mean:+.4f} "
              f"std={t.std:.4f} absmax={t.amax:.4f}", file=file)
