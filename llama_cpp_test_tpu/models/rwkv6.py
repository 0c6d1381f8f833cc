"""RWKV6 (linear-attention RNN) architecture — the reference
llm_build_rwkv6 analogue (llama-model.cpp:10340-10647; tensor names
llama-arch.cpp LLM_ARCH_RWKV6 block; wkv kernel semantics
ggml/src/ggml-cpu/ggml-cpu.c ggml_compute_forward_rwkv_wkv6_f32).

An RWKV layer carries three recurrent states instead of a KV cache:
the TIME-MIX token shift (last token's attn-norm output, [C]), the
CHANNEL-MIX token shift (last token's ffn-norm output, [C]) and the
per-head wkv matrix state ([H, D, D] with D = wkv head_size). Like
mamba, it does not ride the paged-KV engine: Rwkv6Model/Rwkv6Context
provide load + prefill + decode (llama-cli surface), and
runtime/recurrent.py's pooled scheduler integration is the
llama-kv-cache recurrent-mode analogue.

Math per layer (original RWKV-v6 "finch"; cross-validated against an
independent torch reference in tests/test_rwkv6.py):

  time mix (att):
    xa   = LN(x, ln1);  sx = shift_a - xa
    xxx  = xa + sx * lerp_x
    five = w2[i] @ tanh(w1 @ xxx)            # 5 token-dependent lerps
    x_i  = xa + sx * (five_i + lerp_i)        for i in (w, k, v, r, g)
    r, k, v = Wr x_r, Wk x_k, Wv x_v;  g = silu(Wg x_g)
    w    = exp(-exp(decay_w2 @ tanh(decay_w1 @ x_w) + decay))
    per head h:  out_j = sum_i r_i (first_i k_i v_j + S_ij)
                 S_ij <- S_ij * w_i + k_i v_j
    out  = groupnorm_per_head(out, eps 64e-5) * ln_x_w + ln_x_b
    x   += Wo (out * g)
  channel mix (ffn):
    xf   = LN(x, ln2);  sx = shift_f - xf
    x_k  = xf + sx * cm_lerp_k;  x_r = xf + sx * cm_lerp_r
    x   += sigmoid(Wr x_r) * (Wv relu(Wk x_k)^2)
  every rescale_every_n_layers layers: x *= 0.5 (the weights were
  pre-divided by 2^(il//rescale) at convert, so the composition equals
  the unscaled model — the fp16-overflow rescale trick, reference
  Rwkv6Model.modify_tensors + llm_build_rwkv6's ggml_scale 0.5).

Embeddings pass through token_embd_norm (LN); the final LN + lm head
are standard. Prefill is ONE jitted lax.scan over T; decode is a single
fused step per token.
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
class Rwkv6HParams:
    arch: str
    n_vocab: int
    n_embd: int
    n_layer: int
    head_size: int           # wkv.head_size (D); H = n_embd // D
    n_ff: int
    ln_eps: float
    rescale_every: int       # 0 = no activation rescaling

    @property
    def n_head(self) -> int:
        return self.n_embd // self.head_size


@dataclasses.dataclass
class Rwkv6Layer:
    ln1_w: np.ndarray            # attn_norm (LayerNorm w/b)
    ln1_b: np.ndarray
    ln2_w: np.ndarray            # attn_norm_2 = ffn norm
    ln2_b: np.ndarray
    lerp_x: np.ndarray           # [C]
    lerp_fused: np.ndarray       # [5, C] (w, k, v, r, g order)
    w1: np.ndarray               # [5*extra, C]
    w2: np.ndarray               # [5, C, extra]
    decay: np.ndarray            # [C] bias
    decay_w1: np.ndarray         # [extra_d, C]
    decay_w2: np.ndarray         # [C, extra_d]
    first: np.ndarray            # time_mix_first (time_faaaa) [H, D]
    key_w: np.ndarray            # [C, C]
    value_w: np.ndarray
    recept_w: np.ndarray
    gate_w: np.ndarray
    ln_x_w: np.ndarray           # per-head groupnorm affine [C]
    ln_x_b: np.ndarray
    out_w: np.ndarray            # [C, C]
    cm_lerp_k: np.ndarray        # [C]
    cm_lerp_r: np.ndarray
    cm_key_w: np.ndarray         # [FF, C]
    cm_recept_w: np.ndarray      # [C, C]
    cm_value_w: np.ndarray       # [C, FF]


@dataclasses.dataclass
class Rwkv6Weights:
    tok_embd: np.ndarray
    tok_norm_w: np.ndarray
    tok_norm_b: np.ndarray
    output_norm_w: np.ndarray
    output_norm_b: np.ndarray
    output: np.ndarray
    layers: list


class Rwkv6Model:
    """Loaded rwkv6 GGUF: hparams + dense f32 weights + tokenizer.
    Accepts both this converter's GGUFs and reference-converted ones
    (fused or separate time_mix_lerp tensors)."""

    def __init__(self, path: str):
        self.path = path
        r = open_gguf(path)
        self.reader = r
        md = r.metadata
        arch = md.get("general.architecture")
        if arch != "rwkv6":
            raise ValueError(f"not a rwkv6 GGUF (arch {arch!r})")
        toks = md.get("tokenizer.ggml.tokens")
        n_vocab = int(md.get(f"{arch}.vocab_size",
                             len(toks) if toks is not None else 0))
        self.hp = Rwkv6HParams(
            arch="rwkv6",
            n_vocab=n_vocab,
            n_embd=int(md[f"{arch}.embedding_length"]),
            n_layer=int(md[f"{arch}.block_count"]),
            head_size=int(md[f"{arch}.wkv.head_size"]),
            n_ff=int(md.get(f"{arch}.feed_forward_length", 0)),
            ln_eps=float(md.get(f"{arch}.attention.layer_norm_epsilon",
                                1e-5)),
            rescale_every=int(md.get(f"{arch}.rescale_every_n_layers", 0)),
        )
        C, D = self.hp.n_embd, self.hp.head_size
        H = self.hp.n_head

        def t(name):
            a = r.dequantize(name, np.float32)
            info = r.tensors[name]
            if len(info.shape) > 1:
                a = a.reshape(tuple(reversed(info.shape)))
            return a

        lys = []
        for i in range(self.hp.n_layer):
            p = f"blk.{i}."
            if p + "time_mix_lerp_fused.weight" in r.tensors:
                fused = t(p + "time_mix_lerp_fused.weight").reshape(5, C)
            else:   # separate lerp tensors (w, k, v, r, g)
                fused = np.stack([
                    t(p + f"time_mix_lerp_{s}.weight").reshape(C)
                    for s in ("w", "k", "v", "r", "g")])
            extra = t(p + "time_mix_w1.weight").shape[0] // 5
            lys.append(Rwkv6Layer(
                ln1_w=t(p + "attn_norm.weight"),
                ln1_b=t(p + "attn_norm.bias"),
                ln2_w=t(p + "attn_norm_2.weight"),
                ln2_b=t(p + "attn_norm_2.bias"),
                lerp_x=t(p + "time_mix_lerp_x.weight").reshape(C),
                lerp_fused=fused,
                w1=t(p + "time_mix_w1.weight"),
                w2=t(p + "time_mix_w2.weight").reshape(5, C, extra),
                decay=t(p + "time_mix_decay.weight").reshape(C),
                decay_w1=t(p + "time_mix_decay_w1.weight"),
                decay_w2=t(p + "time_mix_decay_w2.weight"),
                first=t(p + "time_mix_first.weight").reshape(H, D),
                key_w=t(p + "time_mix_key.weight"),
                value_w=t(p + "time_mix_value.weight"),
                recept_w=t(p + "time_mix_receptance.weight"),
                gate_w=t(p + "time_mix_gate.weight"),
                ln_x_w=t(p + "time_mix_ln.weight"),
                ln_x_b=t(p + "time_mix_ln.bias"),
                out_w=t(p + "time_mix_output.weight"),
                cm_lerp_k=t(p + "channel_mix_lerp_k.weight").reshape(C),
                cm_lerp_r=t(p + "channel_mix_lerp_r.weight").reshape(C),
                cm_key_w=t(p + "channel_mix_key.weight"),
                cm_recept_w=t(p + "channel_mix_receptance.weight"),
                cm_value_w=t(p + "channel_mix_value.weight"),
            ))
        embd = t("token_embd.weight")
        self.weights = Rwkv6Weights(
            tok_embd=embd,
            tok_norm_w=t("token_embd_norm.weight"),
            tok_norm_b=t("token_embd_norm.bias"),
            output_norm_w=t("output_norm.weight"),
            output_norm_b=t("output_norm.bias"),
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
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _layer_ws(ly: Rwkv6Layer) -> tuple:
    return (ly.ln1_w, ly.ln1_b, ly.ln2_w, ly.ln2_b, ly.lerp_x,
            ly.lerp_fused, ly.w1, ly.w2, ly.decay, ly.decay_w1,
            ly.decay_w2, ly.first, ly.key_w, ly.value_w, ly.recept_w,
            ly.gate_w, ly.ln_x_w, ly.ln_x_b, ly.out_w, ly.cm_lerp_k,
            ly.cm_lerp_r, ly.cm_key_w, ly.cm_recept_w, ly.cm_value_w)


def _layer_step(ws, shift_a, shift_f, S, x, *, hp: Rwkv6HParams,
                rescale: bool):
    """One token through one rwkv6 layer. x [C]; shift_a/shift_f [C];
    S [H, D, D] (i = key channel, j = value channel). Returns
    (x', shift_a', shift_f', S')."""
    (ln1_w, ln1_b, ln2_w, ln2_b, lerp_x, lerp_fused, w1, w2, decay,
     decay_w1, decay_w2, first, key_w, value_w, recept_w, gate_w,
     ln_x_w, ln_x_b, out_w, cm_lerp_k, cm_lerp_r, cm_key_w,
     cm_recept_w, cm_value_w) = ws
    H, D = hp.n_head, hp.head_size
    eps = hp.ln_eps

    # ---- time mix -------------------------------------------------------
    xa = _ln(x, ln1_w, ln1_b, eps)
    sx = shift_a - xa
    xxx = xa + sx * lerp_x
    tmp = jnp.tanh(w1 @ xxx).reshape(5, -1)          # [5, extra]
    five = jnp.einsum("sce,se->sc", w2, tmp)         # [5, C]
    xi = xa[None, :] + sx[None, :] * (five + lerp_fused)   # [5, C]
    xw, xk, xv, xr, xg = xi[0], xi[1], xi[2], xi[3], xi[4]
    r = (recept_w @ xr).reshape(H, D)
    k = (key_w @ xk).reshape(H, D)
    v = (value_w @ xv).reshape(H, D)
    g = jax.nn.silu(gate_w @ xg)
    w = decay_w2 @ jnp.tanh(decay_w1 @ xw) + decay
    w = jnp.exp(-jnp.exp(w)).reshape(H, D)
    # wkv6: out_j = sum_i r_i (first_i k_i v_j + S_ij);
    #       S_ij <- S_ij w_i + k_i v_j  (ggml_rwkv_wkv6 scalar loop)
    kv = k[:, :, None] * v[:, None, :]               # [H, D, D]
    out = jnp.einsum("hi,hij->hj", r, first[:, :, None] * kv + S)
    S = S * w[:, :, None] + kv
    # per-head groupnorm (ggml_norm eps 64e-5 on the [D]-head view)
    out = _ln(out, 1.0, 0.0, 64e-5).reshape(H * D)
    out = out * ln_x_w + ln_x_b
    x = x + out_w @ (out * g)

    # ---- channel mix ----------------------------------------------------
    xf = _ln(x, ln2_w, ln2_b, eps)
    sx2 = shift_f - xf
    xk2 = xf + sx2 * cm_lerp_k
    xr2 = xf + sx2 * cm_lerp_r
    rr = jax.nn.sigmoid(cm_recept_w @ xr2)
    kk = jnp.square(jax.nn.relu(cm_key_w @ xk2))
    x = x + rr * (cm_value_w @ kk)
    if rescale:
        x = x * 0.5
    return x, xa, xf, S


@functools.partial(jax.jit, static_argnames=("hp",))
def _forward_tokens(weights_t, states, tokens, *, hp: Rwkv6HParams):
    """tokens [T] -> (logits [T, V], states'). states = (shift_a [L, C],
    shift_f [L, C], wkv [L, H, D, D]). One lax.scan over T."""
    tok_embd, tnw, tnb, onw, onb, out_w, layer_ws = weights_t
    sa0, sf0, S0 = states

    def step(carry, tok):
        sa, sf, S = carry
        x = _ln(tok_embd[tok], tnw, tnb, hp.ln_eps)
        new_a, new_f, new_s = [], [], []
        for li, ws in enumerate(layer_ws):
            resc = hp.rescale_every > 0 and \
                (li + 1) % hp.rescale_every == 0
            x, a1, f1, S1 = _layer_step(ws, sa[li], sf[li], S[li], x,
                                        hp=hp, rescale=resc)
            new_a.append(a1)
            new_f.append(f1)
            new_s.append(S1)
        xn = _ln(x, onw, onb, hp.ln_eps)
        logits = out_w @ xn
        return (jnp.stack(new_a), jnp.stack(new_f),
                jnp.stack(new_s)), logits

    (sa1, sf1, S1), logits = jax.lax.scan(step, (sa0, sf0, S0), tokens)
    return logits, (sa1, sf1, S1)


class Rwkv6Context:
    """Minimal recurrent-state context (prefill / decode / greedy
    generation) for RWKV6 — O(1) state in sequence length."""

    def __init__(self, model: Rwkv6Model):
        self.model = model
        self._wt = (
            jnp.asarray(model.weights.tok_embd, jnp.float32),
            jnp.asarray(model.weights.tok_norm_w, jnp.float32),
            jnp.asarray(model.weights.tok_norm_b, jnp.float32),
            jnp.asarray(model.weights.output_norm_w, jnp.float32),
            jnp.asarray(model.weights.output_norm_b, jnp.float32),
            jnp.asarray(model.weights.output, jnp.float32),
            tuple(tuple(jnp.asarray(a, jnp.float32)
                        for a in _layer_ws(ly))
                  for ly in model.weights.layers),
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


def generate(ctx: Rwkv6Context, prompt: list[int],
             max_new_tokens: int) -> Iterator[int]:
    logits = ctx.prefill(prompt)
    for _ in range(max_new_tokens):
        tok = int(np.argmax(logits))
        yield tok
        logits = ctx.decode(tok)
