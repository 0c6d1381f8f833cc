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
    arch: str                # rwkv6 | rwkv6qwen2
    n_vocab: int
    n_embd: int
    n_layer: int
    head_size: int           # wkv.head_size (D); H = n_embd // D
    n_ff: int
    ln_eps: float
    rescale_every: int       # 0 = no activation rescaling
    n_head_kv: int = 0       # rwkv6qwen2 GQA kv heads (0 = n_head)

    @property
    def n_head(self) -> int:
        return self.n_embd // self.head_size

    @property
    def qrwkv(self) -> bool:
        """rwkv6qwen2 (QRWKV): rms/swiglu qwen body, gated-linear-attn
        time mix — no time_mix_first, sigmoid gate, k scaled by (1-w),
        no per-head group norm, ONE token shift (llm_build_rwkv6qwen2 +
        ggml_gated_linear_attn)."""
        return self.arch == "rwkv6qwen2"


@dataclasses.dataclass
class Rwkv6Layer:
    ln1_w: np.ndarray            # attn_norm (LayerNorm w/b; rms for qrwkv)
    ln1_b: np.ndarray | None
    ln2_w: np.ndarray | None     # attn_norm_2 (rwkv6) / ffn_norm (qrwkv)
    ln2_b: np.ndarray | None
    lerp_x: np.ndarray           # [C]
    lerp_fused: np.ndarray       # [5, C] (w, k, v, r, g order)
    w1: np.ndarray               # [5*extra, C]
    w2: np.ndarray               # [5, C, extra]
    decay: np.ndarray            # [C] bias
    decay_w1: np.ndarray         # [extra_d, C]
    decay_w2: np.ndarray         # [C, extra_d]
    first: np.ndarray | None     # time_mix_first [H, D]; None for qrwkv
    key_w: np.ndarray            # [C or KV*D, C]
    value_w: np.ndarray
    recept_w: np.ndarray
    gate_w: np.ndarray
    key_b: np.ndarray | None = None       # qrwkv qwen-style biases
    value_b: np.ndarray | None = None
    recept_b: np.ndarray | None = None
    ln_x_w: np.ndarray | None = None      # per-head groupnorm affine [C]
    ln_x_b: np.ndarray | None = None
    out_w: np.ndarray = None              # [C, C]
    cm_lerp_k: np.ndarray | None = None   # [C]
    cm_lerp_r: np.ndarray | None = None
    cm_key_w: np.ndarray | None = None    # [FF, C]
    cm_recept_w: np.ndarray | None = None # [C, C]
    cm_value_w: np.ndarray | None = None  # [C, FF]
    ffn_gate: np.ndarray | None = None    # qrwkv swiglu ffn
    ffn_up: np.ndarray | None = None
    ffn_down: np.ndarray | None = None


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
        if arch not in ("rwkv6", "rwkv6qwen2"):
            raise ValueError(f"not a rwkv6/rwkv6qwen2 GGUF (arch {arch!r})")
        toks = md.get("tokenizer.ggml.tokens")
        n_vocab = int(md.get(f"{arch}.vocab_size",
                             len(toks) if toks is not None else 0))
        eps_key = (f"{arch}.attention.layer_norm_rms_epsilon"
                   if arch == "rwkv6qwen2"
                   else f"{arch}.attention.layer_norm_epsilon")
        self.hp = Rwkv6HParams(
            arch=arch,
            n_vocab=n_vocab,
            n_embd=int(md[f"{arch}.embedding_length"]),
            n_layer=int(md[f"{arch}.block_count"]),
            head_size=int(md[f"{arch}.wkv.head_size"]),
            n_ff=int(md.get(f"{arch}.feed_forward_length", 0)),
            ln_eps=float(md.get(eps_key, 1e-5)),
            rescale_every=int(md.get(f"{arch}.rescale_every_n_layers", 0)),
            n_head_kv=int(md.get(f"{arch}.attention.head_count_kv", 0)),
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

            def opt(name):
                return t(name) if name in r.tensors else None

            lys.append(Rwkv6Layer(
                ln1_w=t(p + "attn_norm.weight"),
                ln1_b=opt(p + "attn_norm.bias"),
                ln2_w=(t(p + "attn_norm_2.weight")
                       if p + "attn_norm_2.weight" in r.tensors
                       else opt(p + "ffn_norm.weight")),
                ln2_b=opt(p + "attn_norm_2.bias"),
                lerp_x=t(p + "time_mix_lerp_x.weight").reshape(C),
                lerp_fused=fused,
                w1=t(p + "time_mix_w1.weight"),
                w2=t(p + "time_mix_w2.weight").reshape(5, C, extra),
                decay=t(p + "time_mix_decay.weight").reshape(C),
                decay_w1=t(p + "time_mix_decay_w1.weight"),
                decay_w2=t(p + "time_mix_decay_w2.weight"),
                first=(t(p + "time_mix_first.weight").reshape(H, D)
                       if p + "time_mix_first.weight" in r.tensors
                       else None),
                key_w=t(p + "time_mix_key.weight"),
                value_w=t(p + "time_mix_value.weight"),
                recept_w=t(p + "time_mix_receptance.weight"),
                gate_w=t(p + "time_mix_gate.weight"),
                key_b=opt(p + "time_mix_key.bias"),
                value_b=opt(p + "time_mix_value.bias"),
                recept_b=opt(p + "time_mix_receptance.bias"),
                ln_x_w=opt(p + "time_mix_ln.weight"),
                ln_x_b=opt(p + "time_mix_ln.bias"),
                out_w=t(p + "time_mix_output.weight"),
                cm_lerp_k=(t(p + "channel_mix_lerp_k.weight").reshape(C)
                           if p + "channel_mix_lerp_k.weight" in r.tensors
                           else None),
                cm_lerp_r=(t(p + "channel_mix_lerp_r.weight").reshape(C)
                           if p + "channel_mix_lerp_r.weight" in r.tensors
                           else None),
                cm_key_w=opt(p + "channel_mix_key.weight"),
                cm_recept_w=opt(p + "channel_mix_receptance.weight"),
                cm_value_w=opt(p + "channel_mix_value.weight"),
                ffn_gate=opt(p + "ffn_gate.weight"),
                ffn_up=opt(p + "ffn_up.weight"),
                ffn_down=opt(p + "ffn_down.weight"),
            ))
        embd = t("token_embd.weight")
        self.weights = Rwkv6Weights(
            tok_embd=embd,
            tok_norm_w=(t("token_embd_norm.weight")
                        if "token_embd_norm.weight" in r.tensors
                        else None),
            tok_norm_b=(t("token_embd_norm.bias")
                        if "token_embd_norm.bias" in r.tensors
                        else None),
            output_norm_w=t("output_norm.weight"),
            output_norm_b=(t("output_norm.bias")
                           if "output_norm.bias" in r.tensors else None),
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


# Rwkv6Layer rides through jit as a pytree (None fields flatten to
# empty subtrees, so the per-arch None pattern is static structure)
jax.tree_util.register_dataclass(
    Rwkv6Layer,
    data_fields=[f.name for f in dataclasses.fields(Rwkv6Layer)],
    meta_fields=[])


def _norm1(x, ly, hp):
    if hp.qrwkv:   # rms, no bias
        return x * jax.lax.rsqrt(
            jnp.mean(x * x, axis=-1, keepdims=True) + hp.ln_eps) * ly.ln1_w
    return _ln(x, ly.ln1_w, ly.ln1_b, hp.ln_eps)


def _layer_step(ly: Rwkv6Layer, shift_a, shift_f, S, x, *,
                hp: Rwkv6HParams, rescale: bool):
    """One token through one rwkv6/rwkv6qwen2 layer. x [C];
    shift_a/shift_f [C]; S [H, D, D]. Returns (x', shift_a', shift_f',
    S'). rwkv6: S indexed (key, value), wkv6 update. qrwkv: S indexed
    the same, gated-linear-attn update (no first bonus, decayed state
    read, scale head_size^-0.5)."""
    H, D = hp.n_head, hp.head_size
    KV = hp.n_head_kv or H
    eps = hp.ln_eps

    # ---- time mix -------------------------------------------------------
    xa = _norm1(x, ly, hp)
    sx = shift_a - xa
    xxx = xa + sx * ly.lerp_x
    tmp = jnp.tanh(ly.w1 @ xxx).reshape(5, -1)          # [5, extra]
    five = jnp.einsum("sce,se->sc", ly.w2, tmp)         # [5, C]
    xi = xa[None, :] + sx[None, :] * (five + ly.lerp_fused)   # [5, C]
    xw, xk, xv, xr, xg = xi[0], xi[1], xi[2], xi[3], xi[4]
    r = ly.recept_w @ xr
    k = ly.key_w @ xk
    v = ly.value_w @ xv
    if ly.recept_b is not None:
        r = r + ly.recept_b
    if ly.key_b is not None:
        k = k + ly.key_b
    if ly.value_b is not None:
        v = v + ly.value_b
    r = r.reshape(H, D)
    if KV != H:   # qrwkv GQA: repeat kv heads (build_rwkv6_time_mix)
        k = jnp.repeat(k.reshape(KV, D), H // KV, axis=0)
        v = jnp.repeat(v.reshape(KV, D), H // KV, axis=0)
    else:
        k = k.reshape(H, D)
        v = v.reshape(H, D)
    g = ly.gate_w @ xg
    g = jax.nn.sigmoid(g) if hp.qrwkv else jax.nn.silu(g)
    w = ly.decay_w2 @ jnp.tanh(ly.decay_w1 @ xw) + ly.decay
    w = jnp.exp(-jnp.exp(w)).reshape(H, D)
    if hp.qrwkv:
        # gated linear attention (ggml_gated_linear_attn scalar loop):
        # k scaled by (1-w); S <- diag(w) S + k v^T read AFTER update;
        # out = scale * r^T S
        k = k - k * w
        S = S * w[:, :, None] + k[:, :, None] * v[:, None, :]
        out = jnp.einsum("hi,hij->hj", r, S) * (D ** -0.5)
        out = out.reshape(H * D)
    else:
        # wkv6: out_j = sum_i r_i (first_i k_i v_j + S_ij);
        #       S_ij <- S_ij w_i + k_i v_j  (ggml_rwkv_wkv6 scalar loop)
        kv = k[:, :, None] * v[:, None, :]               # [H, D, D]
        out = jnp.einsum("hi,hij->hj", r,
                         ly.first[:, :, None] * kv + S)
        S = S * w[:, :, None] + kv
        # per-head groupnorm (ggml_norm eps 64e-5 on the [D]-head view)
        out = _ln(out, 1.0, 0.0, 64e-5).reshape(H * D)
        out = out * ly.ln_x_w + ly.ln_x_b
    x = x + ly.out_w @ (out * g)

    # ---- ffn ------------------------------------------------------------
    if hp.qrwkv:
        # qwen swiglu FFN on an rms norm; no ffn token shift
        cur = x * jax.lax.rsqrt(
            jnp.mean(x * x, axis=-1, keepdims=True) + eps) * ly.ln2_w
        act = jax.nn.silu(ly.ffn_gate @ cur) * (ly.ffn_up @ cur)
        return x + ly.ffn_down @ act, xa, shift_f, S
    xf = _ln(x, ly.ln2_w, ly.ln2_b, eps)
    sx2 = shift_f - xf
    xk2 = xf + sx2 * ly.cm_lerp_k
    xr2 = xf + sx2 * ly.cm_lerp_r
    rr = jax.nn.sigmoid(ly.cm_recept_w @ xr2)
    kk = jnp.square(jax.nn.relu(ly.cm_key_w @ xk2))
    x = x + rr * (ly.cm_value_w @ kk)
    if rescale:
        x = x * 0.5
    return x, xa, xf, S


def token_chain(weights_t, state, tok, *, hp: Rwkv6HParams):
    """One token through all layers. state = (shift_a [L, C],
    shift_f [L, C], wkv [L, H, D, D]). Returns (hidden [C], state') —
    the LM head is head() (applied once per prefill; batched in the
    scheduler's decode, runtime/recurrent.py)."""
    tok_embd, tnw, tnb, onw, onb, out_w, layers = weights_t
    sa, sf, S = state
    x = tok_embd[tok]
    if tnw is not None:
        x = _ln(x, tnw, tnb, hp.ln_eps)
    new_a, new_f, new_s = [], [], []
    for li, ly in enumerate(layers):
        resc = not hp.qrwkv and hp.rescale_every > 0 and \
            (li + 1) % hp.rescale_every == 0
        x, a1, f1, S1 = _layer_step(ly, sa[li], sf[li], S[li], x,
                                    hp=hp, rescale=resc)
        new_a.append(a1)
        new_f.append(f1)
        new_s.append(S1)
    return x, (jnp.stack(new_a), jnp.stack(new_f), jnp.stack(new_s))


def head(weights_t, x, *, hp: Rwkv6HParams):
    """Final norm + LM head over hidden x [..., C] -> [..., V]."""
    _, _, _, onw, onb, out_w, _ = weights_t
    if hp.qrwkv:
        xn = x * jax.lax.rsqrt(
            jnp.mean(x * x, axis=-1, keepdims=True) + hp.ln_eps) * onw
    else:
        xn = _ln(x, onw, onb, hp.ln_eps)
    return xn @ out_w.T


def zero_state(hp: Rwkv6HParams):
    """Per-sequence zero recurrent state (the shapes the scheduler's
    state pool stacks over rows)."""
    H, D = hp.n_head, hp.head_size
    return (jnp.zeros((hp.n_layer, hp.n_embd), jnp.float32),
            jnp.zeros((hp.n_layer, hp.n_embd), jnp.float32),
            jnp.zeros((hp.n_layer, H, D, D), jnp.float32))


@functools.partial(jax.jit, static_argnames=("hp",))
def _forward_tokens(weights_t, states, tokens, *, hp: Rwkv6HParams):
    """tokens [T] -> (logits [T, V], states'). One lax.scan over T."""

    def step(carry, tok):
        x, carry = token_chain(weights_t, carry, tok, hp=hp)
        return carry, head(weights_t, x, hp=hp)

    states, logits = jax.lax.scan(step, states, tokens)
    return logits, states


class Rwkv6Context:
    """Minimal recurrent-state context (prefill / decode / greedy
    generation) for RWKV6 — O(1) state in sequence length."""

    def __init__(self, model: Rwkv6Model):
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
            tuple(w.layers),   # Rwkv6Layer is a registered pytree
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
