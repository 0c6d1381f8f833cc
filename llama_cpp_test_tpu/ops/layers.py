"""Transformer building blocks (XLA ops): RMSNorm, RoPE (incl. YaRN/linear
scaling), SwiGLU, attention over gathered KV.

The analogue of the reference's llm_graph_context helpers (build_norm,
build_ffn, build_attn_mha — llama-graph.h:413-468, llama-graph.cpp:1160-1240)
as pure jnp functions. Hot paths get Pallas twins; these are the reference
semantics and the CPU/test path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hparams import HParams


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x: jax.Array, weight: jax.Array | None,
               bias: jax.Array | None, eps: float) -> jax.Array:
    """Mean-centered LayerNorm with optional weight/bias (phi2/falcon-style
    archs — reference build_norm with LLM_NORM, llama-graph.cpp; olmo's
    non-parametric norm passes weight=None)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


# -- RoPE --------------------------------------------------------------------


def _yarn_ramp(low: float, high: float, dim: int) -> np.ndarray:
    i = np.arange(dim // 2, dtype=np.float32)
    y = (i - low) / max(high - low, 1e-3)
    return 1.0 - np.clip(y, 0.0, 1.0)


def rope_freqs(hp: HParams) -> tuple[np.ndarray, float]:
    """Per-pair inverse frequencies (dim/2,) and magnitude scale (YaRN mscale).

    Mirrors ggml_rope_ext's NEOX mode frequency computation with
    linear / YaRN scaling (reference ggml-cpu.c rope + llama-hparams.h:85-90).

    Pure numpy ON PURPOSE: this runs on the model-load path, and on a
    remote-compile device link every stray jnp op is a multi-minute XLA
    program compile (observed: 269s of the bench load stuck in np.asarray
    of a device-computed 32-float table).
    """
    half = hp.rope_dim // 2
    i = np.arange(half, dtype=np.float32)
    inv_freq = hp.rope_freq_base ** (-2.0 * i / hp.rope_dim)
    # attn_factor scales cos/sin unconditionally in ggml (rope_yarn's mscale
    # param, ggml-cpu.c:10596-10604); longrope (phi3) sets it to
    # sqrt(1 + ln(scale)/ln(orig_ctx)) at convert time — the factor tensors
    # themselves are folded into inv_freq by load_weights.
    mscale = float(hp.rope_attn_factor or 1.0)
    scaling = (hp.rope_scaling or "none").lower()
    factor = hp.rope_scale_factor or 1.0
    if scaling == "linear" and factor != 1.0:
        inv_freq = inv_freq / factor
    elif scaling == "yarn" and factor != 1.0:
        orig = hp.rope_orig_ctx or hp.n_ctx_train
        lo_rot = hp.yarn_beta_fast
        hi_rot = hp.yarn_beta_slow
        # dims rotating less than beta_fast/slow full cycles over orig ctx
        def corr_dim(n_rot):
            return (hp.rope_dim * math.log(orig / (n_rot * 2 * math.pi))
                    / (2 * math.log(hp.rope_freq_base)))
        low = max(0.0, math.floor(corr_dim(lo_rot)))
        high = min(half - 1.0, math.ceil(corr_dim(hi_rot)))
        ramp = _yarn_ramp(low, high, hp.rope_dim)
        inv_freq_interp = inv_freq / factor
        inv_freq = inv_freq_interp * (1 - ramp) + inv_freq * ramp
        if hp.arch != "deepseek2":
            # deepseek2 folds the yarn magnitude into the ATTENTION scale
            # (mscale^2 in hparams.attn_scale); its rope runs at magnitude
            # 1 — the reference cancels the rope-side mscale with
            # attn_factor_scaled (llama-model.cpp:9219)
            mscale *= 1.0 + 0.1 * math.log(factor)
    return np.asarray(inv_freq, np.float32), mscale


def apply_rope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array,
               mscale: float = 1.0) -> jax.Array:
    """NEOX-style rotary embedding, partial when rope_dim < head_dim.

    x: [..., T, H, D]; positions: [..., T]. Rotates pairs (i, i+R/2) within
    the first R = 2*len(inv_freq) dims, passing the rest through unchanged —
    the GGML_ROPE_TYPE_NEOX convention incl. phi2's partial rotary
    (reference ggml rope with n_rot < n_embd_head)."""
    d = x.shape[-1]
    half = inv_freq.shape[-1]
    rot = 2 * half
    theta = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, half]
    cos = (jnp.cos(theta) * mscale)[..., None, :]  # [..., T, 1, half]
    sin = (jnp.sin(theta) * mscale)[..., None, :]
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:rot].astype(jnp.float32)
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    parts = [o1, o2]
    if rot < d:
        parts.append(x[..., rot:].astype(jnp.float32))
    return jnp.concatenate(parts, axis=-1).astype(x.dtype)


def apply_mrope(x: jax.Array, pos3: jax.Array, inv_freq: jax.Array,
                sections: tuple, mscale: float = 1.0) -> jax.Array:
    """Multi-stream (M-RoPE) rotary embedding for qwen2vl image tokens.

    x: [..., T, H, D]; pos3: [..., T, 3] (t, h, w) position streams;
    sections (s_t, s_h, s_w) partition the D/2 frequency indices — each
    frequency rotates with its section's stream (reference
    GGML_ROPE_TYPE_MROPE / HF apply_multimodal_rotary_pos_emb: the cos/sin
    tables are section-concatenated from the per-stream tables). Equal
    streams reduce exactly to apply_rope."""
    half = inv_freq.shape[-1]
    s_t, s_h, s_w = sections
    assert s_t + s_h + s_w == half, (sections, half)
    p = pos3.astype(jnp.float32)
    theta = jnp.concatenate([
        p[..., 0:1] * inv_freq[:s_t],
        p[..., 1:2] * inv_freq[s_t:s_t + s_h],
        p[..., 2:3] * inv_freq[s_t + s_h:],
    ], axis=-1)                                    # [..., T, half]
    d = x.shape[-1]
    rot = 2 * half
    cos = (jnp.cos(theta) * mscale)[..., None, :]
    sin = (jnp.sin(theta) * mscale)[..., None, :]
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:rot].astype(jnp.float32)
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    parts = [o1, o2]
    if rot < d:
        parts.append(x[..., rot:].astype(jnp.float32))
    return jnp.concatenate(parts, axis=-1).astype(x.dtype)


def swiglu(gate: jax.Array, up: jax.Array, act: str = "silu") -> jax.Array:
    """Gated FFN activation: act(gate) * up. act 'silu' (llama SwiGLU) or
    'gelu' (gemma GeGLU, tanh approximation like gelu_pytorch_tanh)."""
    g = gate.astype(jnp.float32)
    if act == "gelu":
        a = jax.nn.gelu(g, approximate=True)
    else:
        a = jax.nn.silu(g)
    return (a * up.astype(jnp.float32)).astype(gate.dtype)


def alibi_slopes(n_head: int, max_bias: float = 8.0,
                 style: str = "bloom") -> np.ndarray:
    """Per-head ALiBi slopes.

    'bloom' (HF build_alibi_tensor / ggml soft_max_ext max_bias): the
    closest power-of-two head count gets 2^(-max_bias*(i+1)/n); extra
    heads interleave at half the step. 'mpt' (HF build_mpt_alibi_tensor):
    slopes computed for the NEXT power of two, then odd-index slopes
    first — slightly different for non-power-of-two head counts."""
    if style == "mpt":
        n = 2 ** int(math.ceil(math.log2(n_head)))
        slopes = [2.0 ** (-(i + 1) * max_bias / n) for i in range(n)]
        if n != n_head:
            slopes = slopes[1::2] + slopes[::2]
        return np.asarray(slopes[:n_head], np.float32)
    n = 2 ** int(math.floor(math.log2(n_head)))
    base = 2.0 ** (-max_bias / n)
    slopes = [base ** (i + 1) for i in range(n)]
    if n < n_head:
        base2 = 2.0 ** (-(max_bias / 2.0) / n)
        slopes += [base2 ** (2 * i + 1) for i in range(n_head - n)]
    return np.asarray(slopes[:n_head], np.float32)


def attention(q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array,
              scale: float | None = None, softcap: float = 0.0,
              alibi: jax.Array | None = None,
              alibi_sym_pos: jax.Array | None = None) -> jax.Array:
    """Masked multi-head attention with GQA broadcast.

    q: [B, T, H, D]; k/v: [B, S, KV, D]; mask: [B, T, S] bool (True = attend).
    alibi: optional [H] slopes — adds slope_h * kv_index to the logits
    (row-constant shift-equivalent to slope * (kv_pos - q_pos), HF Bloom
    semantics). Returns [B, T, H, D].
    alibi_sym_pos: true query positions [B, T] — switches ALiBi to the
    SYMMETRIC bidirectional form -slope_h * |q_pos - kv_pos| used by
    jina-bert-v2 (non-causal encoders; the causal row-constant trick
    does not apply there).
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    kv = k.shape[2]
    rep = h // kv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qf = q.astype(jnp.float32).reshape(b, t, kv, rep, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("btgrd,bsgd->bgrts", qf, kf) * scale
    if softcap > 0:
        logits = jnp.tanh(logits / softcap) * softcap
    if alibi is not None:
        sl = alibi.astype(jnp.float32).reshape(kv, rep)
        if alibi_sym_pos is not None:
            dist = -jnp.abs(alibi_sym_pos[:, :, None].astype(jnp.float32)
                            - jnp.arange(s, dtype=jnp.float32))  # [B,T,S]
            logits = logits + sl[None, :, :, None, None] \
                * dist[:, None, None, :, :]
        else:
            logits = logits + (sl[:, :, None, None] *
                               jnp.arange(s, dtype=jnp.float32))[None]
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(mask[:, None, None, :, :], logits, neg)
    p = jax.nn.softmax(logits, axis=-1)
    # rows where nothing is attendable produce NaN-free zeros
    p = jnp.where(jnp.any(mask[:, None, None, :, :], axis=-1, keepdims=True), p, 0.0)
    out = jnp.einsum("bgrts,bsgd->btgrd", p, vf)
    return out.reshape(b, t, h, d).astype(q.dtype)
