"""Mamba (selective state-space) architecture — the reference
llm_build_mamba analogue (llama-model.cpp MAMBA; tensor names
llama-arch.cpp:817-827, hparams llama-arch.cpp:151-154).

A state-space layer carries RECURRENT state (a depthwise-conv tail and a
[d_inner, d_state] SSM state per layer) instead of a KV cache, so it does
not ride the paged-KV engine: MambaModel/MambaContext below provide the
load + prefill + decode surface (llama-cli-style generation); the
scheduler/server integration — the recurrent-cache analogue of
llama-kv-cache.h:146 — is runtime/recurrent.py's RecurrentContext,
which runs the SAME continuous-batching Scheduler over a device-side
state pool.

Math per layer (HF MambaMixer slow path, cross-validated in
tests/test_mamba.py):

    h, z = split(in_proj(x))                  # [T, d_in] each
    h    = silu(causal_depthwise_conv(h))     # kernel d_conv, per channel
    dt, B, C = split(x_proj(h))               # [dt_rank | d_state | d_state]
    dt   = softplus(dt_proj(dt))              # [T, d_in]
    dA   = exp(dt ⊗ A)                        # A = -exp(A_log), [d_in, N]
    s_t  = dA * s_{t-1} + (dt ⊗ B_t) * h_t    # selective scan
    y_t  = s_t · C_t + D * h_t
    out  = out_proj(y * silu(z))

Prefill runs the scan with jax.lax.scan over T (one jitted dispatch);
decode is a single fused state update per token.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import open_gguf
from ..ops import layers
from ..tokenizer import load_tokenizer


@dataclasses.dataclass(frozen=True)
class MambaHParams:
    arch: str
    n_vocab: int
    n_embd: int          # d_model
    n_layer: int
    d_inner: int
    d_conv: int
    d_state: int
    dt_rank: int
    rms_eps: float


@dataclasses.dataclass
class MambaLayer:
    norm: np.ndarray         # [d_model]
    in_w: np.ndarray         # [2*d_inner, d_model]
    conv_w: np.ndarray       # [d_inner, d_conv] (depthwise taps)
    conv_b: np.ndarray | None
    x_w: np.ndarray          # [dt_rank + 2*d_state, d_inner]
    dt_w: np.ndarray         # [d_inner, dt_rank]
    dt_b: np.ndarray | None
    a: np.ndarray            # [d_inner, d_state] (= -exp(A_log), stored)
    d: np.ndarray            # [d_inner]
    out_w: np.ndarray        # [d_model, d_inner]


@dataclasses.dataclass
class MambaWeights:
    tok_embd: np.ndarray     # [V, d_model]
    output_norm: np.ndarray
    output: np.ndarray       # [V, d_model] (possibly the tied embedding)
    layers: list


class MambaModel:
    """Loaded mamba GGUF: hparams + dense-dequantized weights + tokenizer.
    SSM tensors are small relative to attention models; they load as f32
    and the matmuls run bf16 on the MXU inside the jitted scan."""

    def __init__(self, path: str):
        self.path = path
        r = open_gguf(path)
        self.reader = r          # server chat-template/metadata access
        md = r.metadata
        arch = md.get("general.architecture")
        if arch != "mamba":
            raise ValueError(f"not a mamba GGUF (arch {arch!r})")

        def g(key, default=None):
            v = md.get(f"{arch}.{key}", default)
            if v is None:
                raise KeyError(f"mamba GGUF missing {arch}.{key}")
            return int(v)

        toks = md.get("tokenizer.ggml.tokens")
        n_vocab = int(md.get(f"{arch}.vocab_size",
                             len(toks) if toks is not None else 0))
        self.hp = MambaHParams(
            arch="mamba",
            n_vocab=n_vocab,
            n_embd=g("embedding_length"),
            n_layer=g("block_count"),
            d_inner=g("ssm.inner_size"),
            d_conv=g("ssm.conv_kernel"),
            d_state=g("ssm.state_size"),
            dt_rank=g("ssm.time_step_rank"),
            rms_eps=float(md.get(
                f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)),
        )

        def t(name):
            a = r.dequantize(name, np.float32)
            info = r.tensors[name]
            if len(info.shape) > 1:
                a = a.reshape(tuple(reversed(info.shape)))
            return a

        def opt(name):
            return t(name) if name in r.tensors else None

        lys = []
        for i in range(self.hp.n_layer):
            p = f"blk.{i}."
            conv = t(p + "ssm_conv1d.weight")
            # ggml stores the conv taps ne=(d_conv, d_inner) -> row-major
            # numpy [d_inner, d_conv]
            conv = conv.reshape(self.hp.d_inner, self.hp.d_conv)
            lys.append(MambaLayer(
                norm=t(p + "attn_norm.weight"),
                in_w=t(p + "ssm_in.weight"),
                conv_w=conv,
                conv_b=opt(p + "ssm_conv1d.bias"),
                x_w=t(p + "ssm_x.weight"),
                dt_w=t(p + "ssm_dt.weight"),
                dt_b=opt(p + "ssm_dt.bias"),
                a=t(p + "ssm_a.weight").reshape(self.hp.d_inner,
                                                self.hp.d_state),
                d=t(p + "ssm_d.weight"),
                out_w=t(p + "ssm_out.weight"),
            ))
        embd = t("token_embd.weight")
        self.weights = MambaWeights(
            tok_embd=embd,
            output_norm=t("output_norm.weight"),
            output=(t("output.weight") if "output.weight" in r.tensors
                    else embd),
            layers=lys,
        )
        try:
            self.tokenizer = load_tokenizer(r)
        except Exception:
            self.tokenizer = None


def _layer_ws(ly: MambaLayer) -> tuple:
    return (ly.norm, ly.in_w, ly.conv_w,
            ly.conv_b if ly.conv_b is not None else np.zeros(
                ly.conv_w.shape[0], np.float32),
            ly.x_w, ly.dt_w,
            ly.dt_b if ly.dt_b is not None else np.zeros(
                ly.dt_w.shape[0], np.float32),
            ly.a, ly.d, ly.out_w)


def _mixer_step(ws, conv_state, ssm_state, x, *, hp: MambaHParams):
    """One token through one mixer. x [d_model]; conv_state
    [d_inner, d_conv-1]; ssm_state [d_inner, d_state]. Returns
    (y [d_model], conv_state', ssm_state')."""
    (norm, in_w, conv_w, conv_b, x_w, dt_w, dt_b, a, d_skip, out_w) = ws
    di, n = hp.d_inner, hp.d_state
    xn = layers.rms_norm(x[None, None, :], norm, hp.rms_eps)[0, 0]
    proj = in_w @ xn                                  # [2*d_inner]
    h, z = proj[:di], proj[di:]
    # causal depthwise conv: taps over [state..., h]
    win = jnp.concatenate([conv_state, h[:, None]], axis=1)  # [di, d_conv]
    hc = jnp.sum(win * conv_w, axis=1) + conv_b
    hc = jax.nn.silu(hc)
    sp = x_w @ hc                                     # [dt_rank + 2N]
    dt = jax.nn.softplus(dt_w @ sp[:hp.dt_rank] + dt_b)      # [di]
    b = sp[hp.dt_rank:hp.dt_rank + n]                 # [N]
    c = sp[hp.dt_rank + n:]                           # [N]
    da = jnp.exp(dt[:, None] * a)                     # [di, N]
    new_state = da * ssm_state + (dt[:, None] * b[None, :]) * hc[:, None]
    y = new_state @ c + d_skip * hc
    y = y * jax.nn.silu(z)
    out = out_w @ y                                   # [d_model]
    return x + out, win[:, 1:], new_state


@functools.partial(jax.jit, static_argnames=("hp",))
def _forward_tokens(weights_t, states, tokens, *, hp: MambaHParams):
    """tokens [T] -> (logits [T, V], states'). states = (conv [L, di,
    d_conv-1], ssm [L, di, N]). One lax.scan over T; layers unrolled."""
    tok_embd, out_norm, out_w, layer_ws = weights_t
    conv0, ssm0 = states

    def step(carry, tok):
        conv, ssm = carry
        x = tok_embd[tok]
        new_conv, new_ssm = [], []
        for li, ws in enumerate(layer_ws):
            x, c1, s1 = _mixer_step(ws, conv[li], ssm[li], x, hp=hp)
            new_conv.append(c1)
            new_ssm.append(s1)
        xn = layers.rms_norm(x[None, None, :], out_norm, hp.rms_eps)[0, 0]
        logits = out_w @ xn
        return (jnp.stack(new_conv), jnp.stack(new_ssm)), logits

    (conv1, ssm1), logits = jax.lax.scan(step, (conv0, ssm0), tokens)
    return logits, (conv1, ssm1)


class MambaContext:
    """Minimal recurrent-state context: prefill / decode / greedy window
    (the llama-cli surface for SSM archs). State is the per-layer conv
    tail + SSM state — O(1) in sequence length, the property the paged-KV
    engine's block tables exist to approximate."""

    def __init__(self, model: MambaModel):
        self.model = model
        hp = model.hp
        self._wt = (
            jnp.asarray(model.weights.tok_embd, jnp.float32),
            jnp.asarray(model.weights.output_norm, jnp.float32),
            jnp.asarray(model.weights.output, jnp.float32),
            tuple(tuple(jnp.asarray(a, jnp.float32)
                        for a in _layer_ws(ly))
                  for ly in model.weights.layers),
        )
        self.reset()

    def reset(self) -> None:
        hp = self.model.hp
        self.states = (
            jnp.zeros((hp.n_layer, hp.d_inner, hp.d_conv - 1), jnp.float32),
            jnp.zeros((hp.n_layer, hp.d_inner, hp.d_state), jnp.float32),
        )
        self.n_past = 0

    def prefill(self, tokens: list[int],
                all_logits: bool = False) -> np.ndarray:
        logits, self.states = _forward_tokens(
            self._wt, self.states, jnp.asarray(tokens, jnp.int32),
            hp=self.model.hp)
        self.n_past += len(tokens)
        out = np.asarray(logits)
        return out if all_logits else out[-1]

    def decode(self, token: int) -> np.ndarray:
        return self.prefill([int(token)])


def generate(ctx: MambaContext, prompt: list[int],
             max_new_tokens: int) -> Iterator[int]:
    logits = ctx.prefill(prompt)
    for _ in range(max_new_tokens):
        tok = int(np.argmax(logits))
        yield tok
        logits = ctx.decode(tok)
