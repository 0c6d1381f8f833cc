"""CLIP vision encoder + LLaVA projector (the clip.cpp analogue).

Loads the mmproj GGUF the reference's convert tools emit
(/root/reference/examples/llava/clip.cpp:80-150 key/tensor naming:
`clip.vision.*` metadata, `v.blk.%d.*` tensors, `mm.%d.*` projector) and
runs the ViT forward as plain jnp: the encoder is a few hundred MFLOPs per
image — one jitted dense-bf16 pass, no custom kernels needed.

Forward (legacy llava path, clip_image_build_graph_legacy):
  non-overlapping patch conv (== unfold + matmul) -> [class_embd] + pos_embd
  -> pre-LN -> N x (LN1 -> biased MHA -> res -> LN2 -> GELU MLP -> res)
  -> drop CLS -> mm MLP projector (mm.0 -> GELU -> mm.2) -> [n_patches, C_llm]

Preprocessing mirrors clip_image_preprocess's llava-1.5 "pad" mode:
pad-to-square with the mean color, bicubic resize to image_size, normalize
with clip.vision.image_mean/std.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader, open_gguf


@dataclasses.dataclass
class ClipLayer:
    ln1_w: Any
    ln1_b: Any
    wq: Any
    bq: Any
    wk: Any
    bk: Any
    wv: Any
    bv: Any
    wo: Any
    bo: Any
    ln2_w: Any
    ln2_b: Any
    ffn_up_w: Any
    ffn_up_b: Any
    ffn_down_w: Any
    ffn_down_b: Any


@dataclasses.dataclass
class ClipModel:
    # hparams
    image_size: int
    patch_size: int
    hidden: int
    n_head: int
    n_layer: int
    n_ff: int
    eps: float
    use_gelu: bool
    image_mean: np.ndarray
    image_std: np.ndarray
    proj_type: str
    # weights
    patch_w: Any           # [hidden, 3*P*P]
    patch_b: Any | None
    class_embd: Any | None
    pos_embd: Any          # [n_pos, hidden]
    pre_ln_w: Any | None
    pre_ln_b: Any | None
    post_ln_w: Any | None
    post_ln_b: Any | None
    layers: list[ClipLayer] = dataclasses.field(default_factory=list)
    # llava MLP projector
    mm0_w: Any = None
    mm0_b: Any = None
    mm2_w: Any = None
    mm2_b: Any = None
    # gemma3 projector: avg-pool the patch grid, RMSNorm, one projection
    # (reference clip.cpp PROJECTOR_TYPE_GEMMA3: mm_input_projection +
    # mm_soft_emb_norm; pool factor from projector.scale_factor)
    mm_input_proj: Any = None
    mm_soft_emb_norm: Any = None
    proj_scale: int = 4
    # minicpmv resampler (clip.cpp PROJECTOR_TYPE_RESAMPLER): dict of the
    # resampler.* tensors, or None
    resampler: Any = None

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def load_clip(path: str) -> ClipModel:
    """Load an mmproj GGUF (clip.cpp key/tensor naming)."""
    r = open_gguf(path)
    md = r.metadata

    def key(name, default=None):
        return md.get(f"clip.vision.{name}", default)

    def t(name, required=True):
        if name not in r.tensors:
            if required:
                raise KeyError(f"mmproj missing tensor {name}")
            return None
        # clip tensors are small: dense f32/f16 dequantize
        a = r.dequantize(name, np.float32)
        info = r.tensors[name]
        if len(info.shape) > 1:
            a = a.reshape(tuple(reversed(info.shape)))
        return a

    n_layer = int(key("block_count"))
    hidden = int(key("embedding_length"))
    patch = int(key("patch_size"))
    m = ClipModel(
        image_size=int(key("image_size")),
        patch_size=patch,
        hidden=hidden,
        n_head=int(key("attention.head_count")),
        n_layer=n_layer,
        n_ff=int(key("feed_forward_length")),
        eps=float(key("attention.layer_norm_epsilon", 1e-5)),
        use_gelu=bool(md.get("clip.use_gelu", True)),
        image_mean=np.asarray(key("image_mean", [0.48145466, 0.4578275,
                                                 0.40821073]), np.float32),
        image_std=np.asarray(key("image_std", [0.26862954, 0.26130258,
                                               0.27577711]), np.float32),
        proj_type=str(md.get("clip.projector_type", "mlp")),
        # ggml conv2d weight ne = (P, P, 3, hidden) -> [hidden, 3*P*P]
        patch_w=t("v.patch_embd.weight").reshape(hidden, 3 * patch * patch),
        patch_b=t("v.patch_embd.bias", required=False),
        class_embd=t("v.class_embd", required=False),
        pos_embd=t("v.position_embd.weight"),
        pre_ln_w=t("v.pre_ln.weight", required=False),
        pre_ln_b=t("v.pre_ln.bias", required=False),
        post_ln_w=t("v.post_ln.weight", required=False),
        post_ln_b=t("v.post_ln.bias", required=False),
    )
    for i in range(n_layer):
        p = f"v.blk.{i}."
        m.layers.append(ClipLayer(
            ln1_w=t(p + "ln1.weight"), ln1_b=t(p + "ln1.bias"),
            wq=t(p + "attn_q.weight"), bq=t(p + "attn_q.bias"),
            wk=t(p + "attn_k.weight"), bk=t(p + "attn_k.bias"),
            wv=t(p + "attn_v.weight"), bv=t(p + "attn_v.bias"),
            wo=t(p + "attn_out.weight"), bo=t(p + "attn_out.bias"),
            ln2_w=t(p + "ln2.weight"), ln2_b=t(p + "ln2.bias"),
            ffn_up_w=t(p + "ffn_up.weight"), ffn_up_b=t(p + "ffn_up.bias"),
            ffn_down_w=t(p + "ffn_down.weight"),
            ffn_down_b=t(p + "ffn_down.bias"),
        ))
    m.mm0_w = t("mm.0.weight", required=False)
    m.mm0_b = t("mm.0.bias", required=False)
    m.mm2_w = t("mm.2.weight", required=False)
    m.mm2_b = t("mm.2.bias", required=False)
    m.mm_input_proj = t("mm.input_projection.weight", required=False)
    m.mm_soft_emb_norm = t("mm.soft_emb_norm.weight", required=False)
    m.proj_scale = int(key("projector.scale_factor", 4))
    if md.get("clip.has_minicpmv_projector") or m.proj_type == "resampler":
        # minicpmv perceiver resampler (clip.cpp:1828-1846)
        rs = {}
        for short, name in (
                ("query", "resampler.query"),
                ("proj", "resampler.proj.weight"),
                ("kv_proj", "resampler.kv.weight"),
                ("q_w", "resampler.attn.q.weight"),
                ("k_w", "resampler.attn.k.weight"),
                ("v_w", "resampler.attn.v.weight"),
                ("q_b", "resampler.attn.q.bias"),
                ("k_b", "resampler.attn.k.bias"),
                ("v_b", "resampler.attn.v.bias"),
                ("o_w", "resampler.attn.out.weight"),
                ("o_b", "resampler.attn.out.bias"),
                ("ln_q_w", "resampler.ln_q.weight"),
                ("ln_q_b", "resampler.ln_q.bias"),
                ("ln_kv_w", "resampler.ln_kv.weight"),
                ("ln_kv_b", "resampler.ln_kv.bias"),
                ("ln_post_w", "resampler.ln_post.weight"),
                ("ln_post_b", "resampler.ln_post.bias")):
            rs[short] = t(name)
        m.resampler = rs
    return m


def sincos_pos_embed_2d(dim: int, side: int) -> np.ndarray:
    """2D sincos position embedding [side*side, dim] (the minicpmv
    resampler's per-image pos table). Matches clip.cpp
    get_2d_sincos_pos_embed EXACTLY, including its column-major flatten
    (pos_embed[w*H + h] = [sincos(h) | sincos(w)]): at row-major index i
    the first half encodes i % side and the second half i // side."""
    assert dim % 4 == 0
    quarter = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter) / quarter))
    pos = np.arange(side, dtype=np.float32)
    first = np.tile(pos, side)[:, None] * omega[None]    # i %  side ("h")
    second = np.repeat(pos, side)[:, None] * omega[None]  # i // side ("w")
    return np.concatenate(
        [np.sin(first), np.cos(first), np.sin(second), np.cos(second)],
        axis=1).astype(np.float32)


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * w
    return y + b if b is not None else y


def _linear(x, w, b):
    y = x @ w.T
    return y + b if b is not None else y


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


def clip_forward(m: ClipModel, pixels: jax.Array) -> jax.Array:
    """pixels: [B, 3, S, S] normalized f32 -> patch features
    [B, n_patches(+1 cls), hidden] after the encoder (before projector)."""
    b, c, s, _ = pixels.shape
    p = m.patch_size
    np_side = s // p
    # unfold: non-overlapping conv == matmul over flattened patches in
    # (channel, py, px) order — matches ggml_conv_2d + reshape
    x = pixels.reshape(b, c, np_side, p, np_side, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, np_side * np_side,
                                              c * p * p)
    x = _linear(x, jnp.asarray(m.patch_w), None if m.patch_b is None
                else jnp.asarray(m.patch_b))
    if m.class_embd is not None:
        cls = jnp.broadcast_to(jnp.asarray(m.class_embd)[None, None, :],
                               (b, 1, m.hidden))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + jnp.asarray(m.pos_embd)[None, : x.shape[1]]
    if m.pre_ln_w is not None:
        x = _ln(x, jnp.asarray(m.pre_ln_w), jnp.asarray(m.pre_ln_b), m.eps)
    h = m.n_head
    d = m.hidden // h
    scale = 1.0 / np.sqrt(d)
    for lw in m.layers:
        cur = _ln(x, jnp.asarray(lw.ln1_w), jnp.asarray(lw.ln1_b), m.eps)
        q = _linear(cur, jnp.asarray(lw.wq), jnp.asarray(lw.bq)) * scale
        k = _linear(cur, jnp.asarray(lw.wk), jnp.asarray(lw.bk))
        v = _linear(cur, jnp.asarray(lw.wv), jnp.asarray(lw.bv))
        t_len = q.shape[1]
        q = q.reshape(b, t_len, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, t_len, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t_len, h, d).transpose(0, 2, 1, 3)
        att = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2), axis=-1)
        out = (att @ v).transpose(0, 2, 1, 3).reshape(b, t_len, m.hidden)
        x = x + _linear(out, jnp.asarray(lw.wo), jnp.asarray(lw.bo))
        cur = _ln(x, jnp.asarray(lw.ln2_w), jnp.asarray(lw.ln2_b), m.eps)
        cur = _linear(cur, jnp.asarray(lw.ffn_up_w),
                      jnp.asarray(lw.ffn_up_b))
        cur = _gelu(cur) if m.use_gelu else jax.nn.silu(cur)
        cur = _linear(cur, jnp.asarray(lw.ffn_down_w),
                      jnp.asarray(lw.ffn_down_b))
        x = x + cur
    return x


@functools.partial(jax.jit, static_argnames=("meta",))
def _encode_jit(pixels, weights, *, meta):
    m = meta.hydrate(weights)
    x = clip_forward(m, pixels)
    if m.class_embd is not None:
        x = x[:, 1:]                        # drop CLS for the projector
    if m.resampler is not None:
        # perceiver resampler (clip.cpp:1243-1308): learned queries
        # cross-attend over kv-projected vision features; keys carry a 2D
        # sincos position embedding; LN everywhere; final projection
        rs = m.resampler
        eps = m.eps
        q = _ln(rs["query"], rs["ln_q_w"], rs["ln_q_b"], eps)  # [Q, Hr]
        v = _linear(x, rs["kv_proj"], None)                    # [B, N, Hr]
        v = _ln(v, rs["ln_kv_w"], rs["ln_kv_b"], eps)
        k = v + rs["pos_embed"][None]
        d_head = 128
        hr = q.shape[-1]
        nh = hr // d_head
        nq = q.shape[0]
        b2, n2, _ = v.shape
        scale = 1.0 / np.sqrt(d_head)
        Q = (_linear(q, rs["q_w"], rs["q_b"]) * scale)         # [Q, Hr]
        K = _linear(k, rs["k_w"], rs["k_b"])                   # [B, N, Hr]
        V = _linear(v, rs["v_w"], rs["v_b"])
        Qh = Q.reshape(nq, nh, d_head).transpose(1, 0, 2)      # [nh, Q, d]
        Kh = K.reshape(b2, n2, nh, d_head).transpose(0, 2, 1, 3)
        Vh = V.reshape(b2, n2, nh, d_head).transpose(0, 2, 1, 3)
        att = jax.nn.softmax(
            jnp.einsum("hqd,bhnd->bhqn", Qh, Kh), axis=-1)
        out = jnp.einsum("bhqn,bhnd->bhqd", att, Vh)
        out = out.transpose(0, 2, 1, 3).reshape(b2, nq, hr)
        out = _linear(out, rs["o_w"], rs["o_b"])
        out = _ln(out, rs["ln_post_w"], rs["ln_post_b"], eps)
        return _linear(out, rs["proj"], None)
    if m.proj_type == "gemma3" and m.mm_input_proj is not None:
        if m.mm_soft_emb_norm is None:
            raise ValueError("gemma3 mmproj: mm.soft_emb_norm.weight "
                             "missing alongside mm.input_projection")
        # gemma3: avg-pool the patch grid by proj_scale (896px/14 = 64-side
        # grid -> 16x16 = 256 soft tokens), RMSNorm, project to the text
        # width (reference clip.cpp build_gemma3 / SigLIP multimodal head)
        b2, n, hdim = x.shape
        side = int(round(n ** 0.5))
        kp = m.proj_scale
        if side * side != n or side % kp:
            raise ValueError(
                f"gemma3 projector: patch grid {n} (side {side}) is not "
                f"divisible by scale_factor {kp}")
        g = x.reshape(b2, side // kp, kp, side // kp, kp, hdim)
        pooled = g.mean(axis=(2, 4)).reshape(b2, -1, hdim)
        w_n = jnp.asarray(m.mm_soft_emb_norm)
        rms = jax.lax.rsqrt(jnp.mean(pooled * pooled, axis=-1,
                                     keepdims=True) + m.eps)
        pooled = pooled * rms * w_n
        return _linear(pooled, jnp.asarray(m.mm_input_proj), None)
    if m.mm0_w is not None:                 # llava MLP projector
        x = _linear(x, m.mm0_w, m.mm0_b)
        x = _gelu(x)
        x = _linear(x, m.mm2_w, m.mm2_b)
    return x


class _Meta:
    """Hashable static half of a ClipModel for jit (weights passed as a
    pytree, metadata captured here)."""

    def __init__(self, m: ClipModel):
        self.m = m
        self._key = (m.image_size, m.patch_size, m.hidden, m.n_head,
                     m.n_layer, m.n_ff, m.eps, m.use_gelu, m.proj_type,
                     m.class_embd is not None, m.pre_ln_w is not None,
                     m.mm0_w is not None, m.mm_input_proj is not None,
                     m.proj_scale, m.resampler is not None)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _Meta) and self._key == other._key

    def hydrate(self, weights) -> ClipModel:
        m = dataclasses.replace(self.m)
        (m.patch_w, m.patch_b, m.class_embd, m.pos_embd, m.pre_ln_w,
         m.pre_ln_b, m.post_ln_w, m.post_ln_b, m.mm0_w, m.mm0_b, m.mm2_w,
         m.mm2_b, m.mm_input_proj, m.mm_soft_emb_norm, m.resampler,
         layer_leaves) = weights
        m.layers = [ClipLayer(*lv) for lv in layer_leaves]
        return m


def encode_image(m: ClipModel, pixels: np.ndarray) -> np.ndarray:
    """[3, S, S] or [B, 3, S, S] normalized pixels -> [B*patches, C_llm]
    projected embeddings ready for Context.prefill_embeds."""
    if pixels.ndim == 3:
        pixels = pixels[None]
    rs = None
    if m.resampler is not None:
        # per-image 2D sincos table for the resampler keys (host-built;
        # the side is static per image size)
        side = pixels.shape[-1] // m.patch_size
        hr = m.resampler["kv_proj"].shape[0]
        rs = dict(m.resampler,
                  pos_embed=sincos_pos_embed_2d(hr, side))
    weights = (
        m.patch_w, m.patch_b, m.class_embd, m.pos_embd, m.pre_ln_w,
        m.pre_ln_b, m.post_ln_w, m.post_ln_b, m.mm0_w, m.mm0_b, m.mm2_w,
        m.mm2_b, m.mm_input_proj, m.mm_soft_emb_norm, rs,
        [tuple(getattr(lw, f.name) for f in dataclasses.fields(lw))
         for lw in m.layers],
    )
    out = _encode_jit(jnp.asarray(pixels, jnp.float32), weights,
                      meta=_Meta(m))
    return np.asarray(out).reshape(-1, out.shape[-1])


def preprocess_image(m: ClipModel, img) -> np.ndarray:
    """PIL image / [H, W, 3] uint8 -> [3, S, S] normalized f32 (llava-1.5
    pad-to-square + bicubic resize, clip.cpp clip_image_preprocess)."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img = img.convert("RGB")
    w, h = img.size
    if w != h:
        side = max(w, h)
        bg = tuple(int(round(255 * x)) for x in m.image_mean)
        sq = Image.new("RGB", (side, side), bg)
        sq.paste(img, ((side - w) // 2, (side - h) // 2))
        img = sq
    img = img.resize((m.image_size, m.image_size), Image.BICUBIC)
    a = np.asarray(img, np.float32) / 255.0            # [S, S, 3]
    a = (a - m.image_mean) / m.image_std
    return a.transpose(2, 0, 1)                        # [3, S, S]
