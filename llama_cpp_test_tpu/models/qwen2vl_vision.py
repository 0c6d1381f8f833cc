"""Qwen2-VL vision tower + merger (the clip.cpp qwen2vl branches:
reference examples/llava/clip.cpp has_qwen2vl_merger paths and
examples/llava/qwen2_vl_surgery.py tensor naming).

Structure (HF Qwen2VisionTransformerPretrainedModel):
  patch_embed  — Conv3d(3, embed, k=(2,14,14)) == a bias-free linear on
                 the processor's flattened [N, 3*2*14*14] patches
  blocks       — pre-LN ViT blocks: x += attn(ln1(x)); x += mlp(ln2(x));
                 fused qkv with bias, FULL (non-causal) attention over the
                 image's patches, 2D vision rope (first hd/4 freqs rotate
                 with the patch's h index, next hd/4 with w — NEOX layout)
  merger       — ln_q, then each 2x2 spatial merge group's 4 embeddings
                 concatenate -> mm.0 -> GELU -> mm.2 -> text hidden size

Patch SEQUENCE order is the processor's merged-group order
(h_group-major, then w_group, then the 2x2 within-group patches) — the
rope h/w indices below mirror HF rot_pos_emb exactly.

On-disk naming follows the reference surgery script (so real-world
qwen2vl mmproj GGUFs load): v.patch_embd.weight/.weight.1 (two temporal
conv frames), v.blk.N.{ln1,ln2,attn_q/k/v,attn_out}, and the SWAPPED MLP
names — "ffn_down" is fc1 (the UP projection) and "ffn_up" is fc2 (the
down projection), a reference quirk kept for file compatibility
(qwen2_vl_surgery.py:25). Merger: v.post_ln (= HF ln_q), mm.0, mm.2.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import open_gguf


@dataclasses.dataclass
class Qwen2VLVisionLayer:
    ln1_w: np.ndarray
    ln1_b: np.ndarray
    wq: np.ndarray
    bq: np.ndarray
    wk: np.ndarray
    bk: np.ndarray
    wv: np.ndarray
    bv: np.ndarray
    wo: np.ndarray
    bo: np.ndarray
    ln2_w: np.ndarray
    ln2_b: np.ndarray
    fc1_w: np.ndarray   # on-disk "ffn_down" (surgery quirk)
    fc1_b: np.ndarray
    fc2_w: np.ndarray   # on-disk "ffn_up"
    fc2_b: np.ndarray


@dataclasses.dataclass
class Qwen2VLVision:
    embed: int
    n_head: int
    n_layer: int
    out_dim: int          # text-model hidden size (projection_dim)
    patch_size: int
    merge_size: int
    temporal: int
    eps: float
    act: str              # 'quick_gelu' | 'gelu' | 'silu'
    patch_w: np.ndarray   # [embed, 3*temporal*P*P] (conv3d as linear)
    post_ln_w: np.ndarray
    post_ln_b: np.ndarray
    mm0_w: np.ndarray
    mm0_b: np.ndarray
    mm2_w: np.ndarray
    mm2_b: np.ndarray
    image_mean: np.ndarray
    image_std: np.ndarray
    layers: list = dataclasses.field(default_factory=list)

    @property
    def head_dim(self) -> int:
        return self.embed // self.n_head


def load_qwen2vl_vision(path: str) -> Qwen2VLVision:
    """Load a qwen2vl mmproj GGUF (surgery-script naming)."""
    r = open_gguf(path)
    md = r.metadata
    if not md.get("clip.has_qwen2vl_merger"):
        raise ValueError("not a qwen2vl mmproj (clip.has_qwen2vl_merger "
                         "missing) — use models.clip.load_clip")

    def key(name, default=None):
        return md.get(f"clip.vision.{name}", default)

    def t(name):
        if name not in r.tensors:
            raise KeyError(f"qwen2vl mmproj missing tensor {name}")
        a = r.dequantize(name, np.float32)
        info = r.tensors[name]
        if len(info.shape) > 1:
            a = a.reshape(tuple(reversed(info.shape)))
        return a

    embed = int(key("embedding_length"))
    patch = int(key("patch_size"))
    n_layer = int(key("block_count"))
    # the surgery writes the Conv3d as two per-frame conv2d tensors;
    # rebuild the [embed, 3, T, P, P] linear in the processor's
    # (C, T, ph, pw) flatten order
    f0 = t("v.patch_embd.weight").reshape(embed, 3, patch, patch)
    f1 = t("v.patch_embd.weight.1").reshape(embed, 3, patch, patch)
    patch_w = np.stack([f0, f1], axis=2).reshape(embed, -1)
    if md.get("clip.use_silu"):
        act = "silu"
    elif md.get("clip.use_gelu"):
        act = "gelu"
    else:
        act = "quick_gelu"
    m = Qwen2VLVision(
        embed=embed,
        n_head=int(key("attention.head_count")),
        n_layer=n_layer,
        out_dim=int(key("projection_dim")),
        patch_size=patch,
        merge_size=2,
        temporal=2,
        eps=float(key("attention.layer_norm_epsilon", 1e-6)),
        act=act,
        patch_w=patch_w,
        post_ln_w=t("v.post_ln.weight"), post_ln_b=t("v.post_ln.bias"),
        mm0_w=t("mm.0.weight"), mm0_b=t("mm.0.bias"),
        mm2_w=t("mm.2.weight"), mm2_b=t("mm.2.bias"),
        image_mean=np.asarray(key("image_mean", [0.48145466, 0.4578275,
                                                 0.40821073]), np.float32),
        image_std=np.asarray(key("image_std", [0.26862954, 0.26130258,
                                               0.27577711]), np.float32),
    )
    for i in range(n_layer):
        p = f"v.blk.{i}."
        m.layers.append(Qwen2VLVisionLayer(
            ln1_w=t(p + "ln1.weight"), ln1_b=t(p + "ln1.bias"),
            wq=t(p + "attn_q.weight"), bq=t(p + "attn_q.bias"),
            wk=t(p + "attn_k.weight"), bk=t(p + "attn_k.bias"),
            wv=t(p + "attn_v.weight"), bv=t(p + "attn_v.bias"),
            wo=t(p + "attn_out.weight"), bo=t(p + "attn_out.bias"),
            ln2_w=t(p + "ln2.weight"), ln2_b=t(p + "ln2.bias"),
            fc1_w=t(p + "ffn_down.weight"), fc1_b=t(p + "ffn_down.bias"),
            fc2_w=t(p + "ffn_up.weight"), fc2_b=t(p + "ffn_up.bias"),
        ))
    return m


def vision_patch_hw(grid_h: int, grid_w: int,
                    merge: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Per-patch (h, w) indices in the processor's merged-group sequence
    order (HF Qwen2VisionTransformer.rot_pos_emb)."""
    h = np.arange(grid_h)[:, None] + np.zeros((1, grid_w), np.int64)
    w = np.arange(grid_w)[None, :] + np.zeros((grid_h, 1), np.int64)

    def grp(a):
        return (a.reshape(grid_h // merge, merge, grid_w // merge, merge)
                 .transpose(0, 2, 1, 3).reshape(-1))

    return grp(h), grp(w)


def _act(x, kind):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if kind == "silu":
        return jax.nn.silu(x)
    return jax.nn.gelu(x, approximate=False)


def _ln(x, w, b, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


@functools.partial(jax.jit, static_argnames=("meta",))
def _encode_jit(patches, hpos, wpos, weights, *, meta):
    embed, n_head, eps, act, merge, out_dim = meta
    d = embed // n_head
    (patch_w, post_ln_w, post_ln_b, mm0_w, mm0_b, mm2_w, mm2_b,
     layer_ws) = weights
    x = patches @ patch_w.T                              # [N, embed]
    n = x.shape[0]
    # 2D vision rope: theta = [hpos * f | wpos * f], f = base^(-4i/d)
    quarter = d // 4
    inv = 10000.0 ** (-jnp.arange(0, quarter, dtype=jnp.float32) * 4.0 / d)
    theta = jnp.concatenate([hpos[:, None] * inv, wpos[:, None] * inv], -1)
    cos = jnp.cos(theta)[:, None, :]                     # [N, 1, d/2]
    sin = jnp.sin(theta)[:, None, :]

    def rope(v):                                         # [N, H, d]
        v1, v2 = v[..., : d // 2], v[..., d // 2:]
        return jnp.concatenate([v1 * cos - v2 * sin,
                                v2 * cos + v1 * sin], -1)

    scale = 1.0 / np.sqrt(d)
    for (ln1_w, ln1_b, wq, bq, wk, bk, wv, bv, wo, bo,
         ln2_w, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b) in layer_ws:
        h = _ln(x, ln1_w, ln1_b, eps)
        q = (h @ wq.T + bq).reshape(n, n_head, d)
        k = (h @ wk.T + bk).reshape(n, n_head, d)
        v = (h @ wv.T + bv).reshape(n, n_head, d)
        q, k = rope(q), rope(k)
        att = jnp.einsum("qhd,khd->hqk", q, k) * scale
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(n, embed)
        x = x + (o @ wo.T + bo)
        h = _ln(x, ln2_w, ln2_b, eps)
        x = x + (_act(h @ fc1_w.T + fc1_b, act) @ fc2_w.T + fc2_b)
    # merger: ln_q then 2x2 group concat -> mm.0 -> GELU -> mm.2
    y = _ln(x, post_ln_w, post_ln_b, eps)
    y = y.reshape(n // (merge * merge), merge * merge * embed)
    y = jax.nn.gelu(y @ mm0_w.T + mm0_b, approximate=False)
    return y @ mm2_w.T + mm2_b                           # [N/4, out_dim]


def encode_image(m: Qwen2VLVision, patches: np.ndarray,
                 grid_h: int, grid_w: int) -> np.ndarray:
    """Flattened patches [N, 3*T*P*P] (processor order) ->
    [grid_h*grid_w/4, text_hidden] merged image embeddings."""
    hpos, wpos = vision_patch_hw(grid_h, grid_w, m.merge_size)
    layer_ws = tuple(
        tuple(np.asarray(getattr(ly, f.name), np.float32)
              for f in dataclasses.fields(Qwen2VLVisionLayer))
        for ly in m.layers)
    weights = (m.patch_w, m.post_ln_w, m.post_ln_b, m.mm0_w, m.mm0_b,
               m.mm2_w, m.mm2_b, layer_ws)
    meta = (m.embed, m.n_head, m.eps, m.act, m.merge_size, m.out_dim)
    out = _encode_jit(jnp.asarray(patches, jnp.float32),
                      jnp.asarray(hpos, jnp.float32),
                      jnp.asarray(wpos, jnp.float32), weights, meta=meta)
    return np.asarray(out, np.float32)


def mrope_image_positions(t0: int, grid_h: int, grid_w: int,
                          merge: int = 2) -> np.ndarray:
    """Text-model M-RoPE streams [(grid_h*grid_w)/merge^2, 3] for one
    image's MERGED tokens starting at text position t0: t is constant t0,
    h/w walk the merged grid row-major (HF get_rope_index; reference
    qwen2vl-cli.cpp:28-60)."""
    gh, gw = grid_h // merge, grid_w // merge
    h = np.repeat(np.arange(gh), gw)
    w = np.tile(np.arange(gw), gh)
    out = np.stack([np.full(gh * gw, 0), h, w], axis=1).astype(np.int32)
    out += t0
    return out


def mrope_delta_after_image(t0: int, grid_h: int, grid_w: int,
                            merge: int = 2) -> int:
    """Next text rope position after the image is t0 + max(llm_grid):
    returns that position (callers derive pos_offset = next - n_cached)."""
    return t0 + max(grid_h // merge, grid_w // merge)


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> tuple[int, int]:
    """HF Qwen2VLImageProcessor.smart_resize: round each side to the
    patch*merge factor keeping the pixel count within bounds."""
    import math

    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be < 200")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def preprocess_image(m: Qwen2VLVision, img) -> tuple[np.ndarray, int, int]:
    """PIL image -> (flattened patches [N, 3*T*P*P], grid_h, grid_w) in
    the HF processor's merged-group order."""
    import PIL.Image

    if not isinstance(img, PIL.Image.Image):
        raise TypeError("preprocess_image expects a PIL image")
    img = img.convert("RGB")
    p, mg = m.patch_size, m.merge_size
    h, w = smart_resize(img.height, img.width, factor=p * mg)
    img = img.resize((w, h), PIL.Image.BICUBIC)
    a = np.asarray(img, np.float32) / 255.0              # [H, W, 3]
    a = (a - m.image_mean) / m.image_std
    a = a.transpose(2, 0, 1)                             # [3, H, W]
    frames = np.stack([a] * m.temporal)                  # [T, 3, H, W]
    gh, gw = h // p, w // p
    pt = frames.reshape(m.temporal, 3, gh // mg, mg, p, gw // mg, mg, p)
    # (h_group, w_group, mh, mw, C, T, ph, pw) then flatten
    pt = pt.transpose(2, 5, 3, 6, 1, 0, 4, 7)
    return pt.reshape(gh * gw, 3 * m.temporal * p * p), gh, gw
