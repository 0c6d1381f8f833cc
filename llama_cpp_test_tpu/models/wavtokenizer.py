"""WavTokenizer-dec vocoder — the TTS audio decoder (reference
llm_build_wavtokenizer_dec, src/llama-model.cpp:11265-11400, and
examples/tts/tts.cpp embd_to_audio).

Graph (per the reference): token-embedding gather -> conv1d(k=7, same) ->
posnet (resnet blocks with GroupNorm+swish+conv3 at layers 0/1/3/4, a
1x1-conv self-attention block at layer 2, final GroupNorm at 5) ->
token-wise LayerNorm -> convnext stack (depthwise conv7 + LN + pw1-GELU-pw2
* gamma, residual) -> final LayerNorm -> output head to n_fft+2 channels
(log-magnitude ; phase) -> host-side iSTFT (hann window, overlap-add fold,
envelope normalization) at 24kHz.

The whole network forward is one jitted jnp pass (lax.conv for the 1-D
convolutions); iSTFT runs in numpy on the host like the reference's
embd_to_audio.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import open_gguf


@dataclasses.dataclass
class WavTokenizer:
    n_embd_features: int
    posnet_embd: int
    posnet_layers: int
    convnext_embd: int
    convnext_layers: int
    n_ff: int
    group_eps: float
    n_groups: int
    ln_eps: float
    tensors: dict = dataclasses.field(default_factory=dict)

    @property
    def n_fft(self) -> int:
        return self.tensors["output.weight"].shape[0] - 2


def load_wavtokenizer(path: str) -> WavTokenizer:
    r = open_gguf(path)
    md = r.metadata
    a = "wavtokenizer-dec"

    def g(k, default=None):
        return md.get(f"{a}.{k}", default)

    tensors = {}
    for name, info in r.tensors.items():
        t = r.dequantize(name, np.float32)
        if len(info.shape) > 1:
            t = t.reshape(tuple(reversed(info.shape)))
        tensors[name] = t
    return WavTokenizer(
        n_embd_features=int(g("features_length", 512)),
        posnet_embd=int(g("posnet.embedding_length", 768)),
        posnet_layers=int(g("posnet.block_count", 6)),
        convnext_embd=int(g("convnext.embedding_length", 768)),
        convnext_layers=int(g("convnext.block_count", 12)),
        n_ff=int(g("feed_forward_length", 2304)),
        group_eps=float(g("attention.group_norm_epsilon", 1e-6)),
        n_groups=int(g("attention.group_norm_groups", 32)),
        ln_eps=float(g("attention.layer_norm_epsilon", 1e-6)),
        tensors=tensors,
    )


def _conv1d_same(x, w, b):
    """x [C_in, T], w [C_out, C_in, K] (ggml ne (K, C_in, C_out)), 'same'."""
    k = w.shape[-1]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"))[0]
    return y + b.reshape(-1, 1)


def _dw_conv1d_same(x, w, b):
    """Depthwise conv: x [C, T], w [C, 1, K]."""
    k = w.shape[-1]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=x.shape[0])[0]
    return y + b.reshape(-1, 1)


def _group_norm(x, w, b, groups, eps):
    """x [C, T], per-group over (C/groups, T) (ggml_group_norm)."""
    c, t = x.shape
    xg = x.reshape(groups, c // groups, t)
    mu = xg.mean(axis=(1, 2), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(1, 2), keepdims=True)
    y = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(c, t)
    return y * w.reshape(-1, 1) + b.reshape(-1, 1)


def _ln(x, w, b, eps):
    """LayerNorm over the last axis."""
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _swish(x):
    return x * jax.nn.sigmoid(x)


def forward(m: WavTokenizer, codes: jax.Array) -> jax.Array:
    """codes [T] int32 -> spectrum embeddings [T, n_fft + 2] f32."""
    t = m.tensors
    ge, ng, le = m.group_eps, m.n_groups, m.ln_eps
    x = jnp.asarray(t["token_embd.weight"])[codes]      # [T, feat]
    cur = x.T                                           # [C, T]
    cur = _conv1d_same(cur, jnp.asarray(t["conv1d.weight"]),
                       jnp.asarray(t["conv1d.bias"]))
    for il in range(m.posnet_layers):
        p = f"posnet.{il}."
        inp = cur
        if il == 2:                                     # 1x1-conv attention
            h = _group_norm(cur, jnp.asarray(t[p + "attn_norm.weight"]),
                            jnp.asarray(t[p + "attn_norm.bias"]), ng, ge)
            q = _conv1d_same(h, jnp.asarray(t[p + "attn_q.weight"]),
                             jnp.asarray(t[p + "attn_q.bias"]))
            k = _conv1d_same(h, jnp.asarray(t[p + "attn_k.weight"]),
                             jnp.asarray(t[p + "attn_k.bias"]))
            v = _conv1d_same(h, jnp.asarray(t[p + "attn_v.weight"]),
                             jnp.asarray(t[p + "attn_v.bias"]))
            att = jax.nn.softmax(
                (q.T @ k) / jnp.sqrt(float(m.posnet_embd)), axis=-1)
            h = (v @ att.T)                             # [C, T]
            h = _conv1d_same(h, jnp.asarray(t[p + "attn_output.weight"]),
                             jnp.asarray(t[p + "attn_output.bias"]))
            cur = h + inp
        elif il == m.posnet_layers - 1:                 # final group norm
            cur = _group_norm(cur, jnp.asarray(t[p + "norm.weight"]),
                              jnp.asarray(t[p + "norm.bias"]), ng, ge)
        else:                                           # resnet block
            h = _group_norm(cur, jnp.asarray(t[p + "norm1.weight"]),
                            jnp.asarray(t[p + "norm1.bias"]), ng, ge)
            h = _swish(h)
            h = _conv1d_same(h, jnp.asarray(t[p + "conv1.weight"]),
                             jnp.asarray(t[p + "conv1.bias"]))
            h = _group_norm(h, jnp.asarray(t[p + "norm2.weight"]),
                            jnp.asarray(t[p + "norm2.bias"]), ng, ge)
            h = _swish(h)
            h = _conv1d_same(h, jnp.asarray(t[p + "conv2.weight"]),
                             jnp.asarray(t[p + "conv2.bias"]))
            cur = h + inp
    # token-wise LayerNorm over channels
    cur = _ln(cur.T, jnp.asarray(t["token_embd_norm.weight"]),
              jnp.asarray(t["token_embd_norm.bias"]), le).T
    for il in range(m.convnext_layers):
        p = f"convnext.{il}."
        inp = cur
        h = _dw_conv1d_same(cur, jnp.asarray(t[p + "dw.weight"]),
                            jnp.asarray(t[p + "dw.bias"]))
        h = _ln(h.T, jnp.asarray(t[p + "norm.weight"]),
                jnp.asarray(t[p + "norm.bias"]), le)    # [T, C]
        h = h @ jnp.asarray(t[p + "pw1.weight"]).T + \
            jnp.asarray(t[p + "pw1.bias"])
        h = jax.nn.gelu(h, approximate=True)
        h = h @ jnp.asarray(t[p + "pw2.weight"]).T + \
            jnp.asarray(t[p + "pw2.bias"])
        h = h * jnp.asarray(t[p + "gamma"])
        cur = h.T + inp
    out = _ln(cur.T, jnp.asarray(t["output_norm.weight"]),
              jnp.asarray(t["output_norm.bias"]), le)   # [T, C]
    out = out @ jnp.asarray(t["output.weight"]).T + \
        jnp.asarray(t["output.bias"])
    return out                                          # [T, n_fft + 2]


def decode_codes(m: WavTokenizer, codes: np.ndarray) -> np.ndarray:
    """codes [T] int -> spectrum embeddings [T, n_fft+2] (jitted)."""
    fn = jax.jit(functools.partial(forward, m))
    return np.asarray(fn(jnp.asarray(codes, jnp.int32)))


def embd_to_audio(embd: np.ndarray, n_fft: int = 1280,
                  n_hop: int = 320) -> np.ndarray:
    """[T, n_fft+2] (log-mag ; phase) -> waveform (tts.cpp embd_to_audio:
    hann-windowed iSTFT with overlap-add fold and envelope division)."""
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    n_win = n_fft
    n_pad = (n_win - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_win
    mag = np.minimum(np.exp(embd[:, :half]), 1e2)
    phi = embd[:, half:]
    spec = mag * np.cos(phi) + 1j * mag * np.sin(phi)   # [T, half]
    frames = np.fft.irfft(spec, n=n_fft, axis=1)        # [T, n_fft]
    hann = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    res = frames * hann
    env_f = np.broadcast_to(hann * hann, frames.shape)
    audio = np.zeros(n_out)
    env = np.zeros(n_out)
    for l in range(n_codes):
        audio[l * n_hop: l * n_hop + n_win] += res[l]
        env[l * n_hop: l * n_hop + n_win] += env_f[l]
    audio = audio[n_pad: n_out - n_pad]
    env = np.maximum(env[n_pad: n_out - n_pad], 1e-12)
    return (audio / env).astype(np.float32)


def write_wav(path: str, audio: np.ndarray, rate: int = 24000) -> None:
    """16-bit mono WAV (tts.cpp save_wav16)."""
    import wave

    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
