"""RWKV7 "goose" + ARWKV7 hybrid architectures — the reference
llm_build_rwkv7 / llm_build_arwkv7 analogue (llama-model.cpp:10736-11100;
wkv kernel ggml-cpu.c ggml_compute_forward_rwkv_wkv7_f32).

RWKV7 replaces rwkv6's data-dependent-decay outer-product update with a
DeltaNet-style rank-1 state transition ("in-context learning rate"):

  time mix:
    x_i  = xa + (shift - xa) * lerp_i       for i in (r, w, k, v, a[, g])
    r    = Wr x_r
    w    = exp(-0.606531 * sigmoid(w2 @ tanh(w1 @ x_w) + w0))
    k, v = Wk x_k, Wv x_v
    v    = v + (v_first - v) * sigmoid(v2 @ (v1 @ x_v) + v0)   (layers > 0;
           v_first is layer 0's raw v for the SAME token)
    a    = sigmoid(a2 @ (a1 @ x_a) + a0)     # per-channel ICL rate
    g    = g2 @ sigmoid(g1 @ x_g)            # optional output gate
    kk   = l2norm_per_head(k * k_k)
    k    = k * (1 + k_a * (a - 1))
    per head, S [D_v, D_k] (kernel a-input = -kk, b-input = kk*a):
      sa_i   = sum_j (-kk_j) S_ij
      S_ij  <- S_ij w_j + v_i k_j + sa_i (kk_j a_j)
      out_i  = sum_j S_ij r_j
    out  = groupnorm_per_head(out, 64e-5) * ln_x_w + ln_x_b   (if present)
    out += v * sum_per_head(k * r * r_k)     # bonus term
    x   += Wo (out * g)
  channel mix (rwkv7 only — NO receptance):
    x_k  = xf + (shift_f - xf) * cm_lerp_k
    x   += Wv relu(Wk x_k)^2

arwkv7 (RwkvHybridForCausalLM, qwen-distilled): the same time mix inside
an RMS-norm llama body — no embedding norm, ONE token shift per layer
(token_shift_count 1), and a gated SwiGLU FFN instead of channel mix.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import open_gguf
from ..tokenizer import load_tokenizer


@dataclasses.dataclass(frozen=True)
class Rwkv7HParams:
    arch: str                # rwkv7 | arwkv7
    n_vocab: int
    n_embd: int
    n_layer: int
    head_size: int
    n_ff: int
    ln_eps: float

    @property
    def n_head(self) -> int:
        return self.n_embd // self.head_size

    @property
    def rms(self) -> bool:
        return self.arch == "arwkv7"


@dataclasses.dataclass
class Rwkv7Layer:
    ln1_w: np.ndarray
    ln1_b: np.ndarray | None
    ln2_w: np.ndarray | None         # rwkv7 channel-mix norm / arwkv7 ffn_norm
    ln2_b: np.ndarray | None
    lerp_fused: np.ndarray           # [6 or 5, C] (r, w, k, v, a[, g])
    w0: np.ndarray                   # [C]
    w1: np.ndarray                   # [rank, C]
    w2: np.ndarray                   # [C, rank]
    a0: np.ndarray
    a1: np.ndarray
    a2: np.ndarray
    v0: np.ndarray | None            # None on layer 0
    v1: np.ndarray | None
    v2: np.ndarray | None
    g1: np.ndarray | None            # optional gate
    g2: np.ndarray | None
    k_k: np.ndarray                  # [C]
    k_a: np.ndarray
    r_k: np.ndarray
    key_w: np.ndarray
    value_w: np.ndarray
    recept_w: np.ndarray
    ln_x_w: np.ndarray | None
    ln_x_b: np.ndarray | None
    out_w: np.ndarray
    # rwkv7 channel mix
    cm_lerp_k: np.ndarray | None
    cm_key_w: np.ndarray | None
    cm_value_w: np.ndarray | None
    # arwkv7 swiglu ffn
    ffn_gate: np.ndarray | None = None
    ffn_up: np.ndarray | None = None
    ffn_down: np.ndarray | None = None


# Rwkv7Layer rides through jit as a pytree (None fields flatten to empty
# subtrees, so the per-layer None pattern is part of the static structure)
jax.tree_util.register_dataclass(
    Rwkv7Layer,
    data_fields=[f.name for f in dataclasses.fields(Rwkv7Layer)],
    meta_fields=[])


@dataclasses.dataclass
class Rwkv7Weights:
    tok_embd: np.ndarray
    tok_norm_w: np.ndarray | None     # rwkv7 only
    tok_norm_b: np.ndarray | None
    output_norm_w: np.ndarray
    output_norm_b: np.ndarray | None
    output: np.ndarray
    layers: list


class Rwkv7Model:
    """Loaded rwkv7/arwkv7 GGUF: hparams + dense f32 weights +
    tokenizer. LoRA ranks derive from the tensor shapes (the GGUF
    *_lora_rank keys are written for reference parity but not needed)."""

    def __init__(self, path: str):
        self.path = path
        r = open_gguf(path)
        self.reader = r
        md = r.metadata
        arch = md.get("general.architecture")
        if arch not in ("rwkv7", "arwkv7"):
            raise ValueError(f"not a rwkv7/arwkv7 GGUF (arch {arch!r})")
        toks = md.get("tokenizer.ggml.tokens")
        n_vocab = int(md.get(f"{arch}.vocab_size",
                             len(toks) if toks is not None else 0))
        eps_key = (f"{arch}.attention.layer_norm_rms_epsilon"
                   if arch == "arwkv7"
                   else f"{arch}.attention.layer_norm_epsilon")
        self.hp = Rwkv7HParams(
            arch=arch,
            n_vocab=n_vocab,
            n_embd=int(md[f"{arch}.embedding_length"]),
            n_layer=int(md[f"{arch}.block_count"]),
            head_size=int(md[f"{arch}.wkv.head_size"]),
            n_ff=int(md.get(f"{arch}.feed_forward_length", 0)),
            ln_eps=float(md.get(eps_key, 1e-5)),
        )
        C = self.hp.n_embd

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
            nl = t(p + "time_mix_lerp_fused.weight")
            lys.append(Rwkv7Layer(
                ln1_w=t(p + "attn_norm.weight"),
                ln1_b=opt(p + "attn_norm.bias"),
                ln2_w=opt(p + "attn_norm_2.weight") if arch == "rwkv7"
                else opt(p + "ffn_norm.weight"),
                ln2_b=opt(p + "attn_norm_2.bias"),
                lerp_fused=nl.reshape(-1, C),
                w0=t(p + "time_mix_w0.weight").reshape(C),
                w1=t(p + "time_mix_w1.weight"),
                w2=t(p + "time_mix_w2.weight"),
                a0=t(p + "time_mix_a0.weight").reshape(C),
                a1=t(p + "time_mix_a1.weight"),
                a2=t(p + "time_mix_a2.weight"),
                # layer 0 carries dummy v0/v1/v2 in reference GGUFs
                # (unused: v_first IS layer 0's v) — load anyway, skip in
                # the step
                v0=(opt(p + "time_mix_v0.weight").reshape(C)
                    if p + "time_mix_v0.weight" in r.tensors and i > 0
                    else None),
                v1=opt(p + "time_mix_v1.weight") if i > 0 else None,
                v2=opt(p + "time_mix_v2.weight") if i > 0 else None,
                g1=opt(p + "time_mix_g1.weight"),
                g2=opt(p + "time_mix_g2.weight"),
                k_k=t(p + "time_mix_k_k.weight").reshape(C),
                k_a=t(p + "time_mix_k_a.weight").reshape(C),
                r_k=t(p + "time_mix_r_k.weight").reshape(C),
                key_w=t(p + "time_mix_key.weight"),
                value_w=t(p + "time_mix_value.weight"),
                recept_w=t(p + "time_mix_receptance.weight"),
                ln_x_w=opt(p + "time_mix_ln.weight"),
                ln_x_b=opt(p + "time_mix_ln.bias"),
                out_w=t(p + "time_mix_output.weight"),
                cm_lerp_k=(opt(p + "channel_mix_lerp_k.weight")),
                cm_key_w=opt(p + "channel_mix_key.weight"),
                cm_value_w=opt(p + "channel_mix_value.weight"),
                ffn_gate=opt(p + "ffn_gate.weight"),
                ffn_up=opt(p + "ffn_up.weight"),
                ffn_down=opt(p + "ffn_down.weight"),
            ))
        embd = t("token_embd.weight")
        self.weights = Rwkv7Weights(
            tok_embd=embd,
            tok_norm_w=opt("token_embd_norm.weight"),
            tok_norm_b=opt("token_embd_norm.bias"),
            output_norm_w=t("output_norm.weight"),
            output_norm_b=opt("output_norm.bias"),
            output=(t("output.weight") if "output.weight" in r.tensors
                    else embd),
            layers=lys,
        )
        try:
            self.tokenizer = load_tokenizer(r)
        except Exception:
            self.tokenizer = None


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * w
    return y + b if b is not None else y


def _rms(x, w, eps):
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True)
                             + eps) * w


def _time_mix(ly, shift_a, S, x, v_first, *, hp: Rwkv7HParams):
    """rwkv7 time mix for one token. Returns (dx, xa, S', v_first')."""
    H, D, C = hp.n_head, hp.head_size, hp.n_embd
    xa_n = (_rms(x, ly.ln1_w, hp.ln_eps) if hp.rms
            else _ln(x, ly.ln1_w, ly.ln1_b, hp.ln_eps))
    sx = shift_a - xa_n
    xi = xa_n[None, :] + sx[None, :] * ly.lerp_fused   # [5 or 6, C]
    xr, xw, xk, xv, x_a = xi[0], xi[1], xi[2], xi[3], xi[4]
    r = ly.recept_w @ xr
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(
        ly.w2 @ jnp.tanh(ly.w1 @ xw) + ly.w0))
    k = ly.key_w @ xk
    v = ly.value_w @ xv
    if v_first is None:
        v_first = v
    else:
        v = v + (v_first - v) * jax.nn.sigmoid(
            ly.v2 @ (ly.v1 @ xv) + ly.v0)
    a = jax.nn.sigmoid(ly.a2 @ (ly.a1 @ x_a) + ly.a0)
    g = None
    if ly.g1 is not None:
        g = ly.g2 @ jax.nn.sigmoid(ly.g1 @ xi[5])
    kk = (k * ly.k_k).reshape(H, D)
    kk = kk / jnp.sqrt(jnp.sum(kk * kk, axis=-1, keepdims=True) + 1e-12)
    k = k * (1.0 + ly.k_a * (a - 1.0))
    rh = r.reshape(H, D)
    wh = w.reshape(H, D)
    kh = k.reshape(H, D)
    vh = v.reshape(H, D)
    ah = a.reshape(H, D)
    # wkv7 step (S [H, D_v, D_k]; kernel inputs a=-kk, b=kk*a):
    #   sa_i = sum_j (-kk_j) S_ij;  S_ij <- S_ij w_j + v_i k_j + sa_i b_j
    #   out_i = sum_j S_ij r_j
    sa = jnp.einsum("hij,hj->hi", S, -kk)
    S = S * wh[:, None, :] + vh[:, :, None] * kh[:, None, :] \
        + sa[:, :, None] * (kk * ah)[:, None, :]
    out = jnp.einsum("hij,hj->hi", S, rh)
    if ly.ln_x_w is not None:
        out = _ln(out, 1.0, 0.0, 64e-5).reshape(C)
        out = out * ly.ln_x_w + ly.ln_x_b
    else:
        out = out.reshape(C)
    rk = jnp.sum(kh * rh * ly.r_k.reshape(H, D), axis=-1)   # [H]
    out = out + (vh * rk[:, None]).reshape(C)
    if g is not None:
        out = out * g
    return ly.out_w @ out, xa_n, S, v_first


def _layer_step(ly, shift_a, shift_f, S, x, v_first, *,
                hp: Rwkv7HParams):
    dx, xa_n, S, v_first = _time_mix(ly, shift_a, S, x, v_first, hp=hp)
    x = x + dx
    if hp.arch == "rwkv7":
        xf = _ln(x, ly.ln2_w, ly.ln2_b, hp.ln_eps)
        sx2 = shift_f - xf
        xk2 = xf + sx2 * ly.cm_lerp_k.reshape(-1)
        kk2 = jnp.square(jax.nn.relu(ly.cm_key_w @ xk2))
        x = x + ly.cm_value_w @ kk2
        return x, xa_n, xf, S, v_first
    # arwkv7: gated swiglu FFN, rms norms, no ffn token shift
    cur = _rms(x, ly.ln2_w, hp.ln_eps)
    act = jax.nn.silu(ly.ffn_gate @ cur) * (ly.ffn_up @ cur)
    x = x + ly.ffn_down @ act
    return x, xa_n, shift_f, S, v_first


def token_chain(weights_t, state, tok, *, hp: Rwkv7HParams):
    """One token through all layers (v_first threads per token inside).
    state = (shift_a [L, C], shift_f [L, C], wkv [L, H, D, D]). Returns
    (hidden [C], state') — the LM head is head()."""
    (tok_embd, tnw, tnb, onw, onb, out_w, layers) = weights_t
    sa, sf, S = state
    x = tok_embd[tok]
    if tnw is not None:
        x = _ln(x, tnw, tnb, hp.ln_eps)
    v_first = None
    new_a, new_f, new_s = [], [], []
    for li, ly in enumerate(layers):
        x, a1, f1, S1, v_first = _layer_step(
            ly, sa[li], sf[li], S[li], x, v_first, hp=hp)
        new_a.append(a1)
        new_f.append(f1)
        new_s.append(S1)
    return x, (jnp.stack(new_a), jnp.stack(new_f), jnp.stack(new_s))


def head(weights_t, x, *, hp: Rwkv7HParams):
    """Final norm + LM head over hidden x [..., C] -> [..., V]."""
    (_, _, _, onw, onb, out_w, _) = weights_t
    xn = (_rms(x, onw, hp.ln_eps) if hp.rms
          else _ln(x, onw, onb, hp.ln_eps))
    return xn @ out_w.T


def zero_state(hp: Rwkv7HParams):
    """Per-sequence zero recurrent state."""
    H, D = hp.n_head, hp.head_size
    return (jnp.zeros((hp.n_layer, hp.n_embd), jnp.float32),
            jnp.zeros((hp.n_layer, hp.n_embd), jnp.float32),
            jnp.zeros((hp.n_layer, H, D, D), jnp.float32))


@functools.partial(jax.jit, static_argnames=("hp",))
def _forward_tokens(weights_t, states, tokens, *, hp: Rwkv7HParams):
    """tokens [T] -> (logits [T, V], states')."""

    def step(carry, tok):
        x, carry = token_chain(weights_t, carry, tok, hp=hp)
        return carry, head(weights_t, x, hp=hp)

    states, logits = jax.lax.scan(step, states, tokens)
    return logits, states


class Rwkv7Context:
    """Recurrent-state context for rwkv7/arwkv7 (prefill / decode /
    greedy generation)."""

    def __init__(self, model: Rwkv7Model):
        self.model = model
        w = model.weights
        self._wt = (
            jnp.asarray(w.tok_embd, jnp.float32),
            (jnp.asarray(w.tok_norm_w, jnp.float32)
             if w.tok_norm_w is not None else None),
            (jnp.asarray(w.tok_norm_b, jnp.float32)
             if w.tok_norm_b is not None else None),
            jnp.asarray(w.output_norm_w, jnp.float32),
            (jnp.asarray(w.output_norm_b, jnp.float32)
             if w.output_norm_b is not None else None),
            jnp.asarray(w.output, jnp.float32),
            tuple(w.layers),   # Rwkv7Layer is a registered pytree
        )
        self.reset()

    def reset(self) -> None:
        hp = self.model.hp
        H, D = hp.n_head, hp.head_size
        self.states = (
            jnp.zeros((hp.n_layer, hp.n_embd), jnp.float32),
            jnp.zeros((hp.n_layer, hp.n_embd), jnp.float32),
            jnp.zeros((hp.n_layer, H, D, D), jnp.float32),
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


def generate(ctx: Rwkv7Context, prompt: list[int],
             max_new_tokens: int) -> Iterator[int]:
    logits = ctx.prefill(prompt)
    for _ in range(max_new_tokens):
        tok = int(np.argmax(logits))
        yield tok
        logits = ctx.decode(tok)
