"""Repack GGUF packed blocks into TPU-friendly plane layouts.

The ggml block layouts (interleaved nibbles, 6-bit packed scales, codebook
indices) are great for SIMD byte shuffles but hostile to (8,128) lane tiling.
At load time we decompose every quantized tensor into flat *planes*.

Two layouts exist, selected per use:

layout "t" (default — all matmul weights). K on sublanes, N on lanes, the
natural MXU rhs orientation:

  qs     — int8 [K, N], or nibbles packed along the OUTPUT dim:
           uint8 [K, N/2] (byte b[k,j] = q[k,j] | q[k,j+N/2] << 4), or
           crumbs uint8 [K, N/4]. Packing along N means the matmul output for
           the packed sub-values is out.reshape(M, pack, N/pack) -> (M, N),
           and the in-kernel per-group scale expansion is a SUBLANE broadcast
           (scale row g copies to rows [g*group, (g+1)*group)) — cheap on the
           VPU, unlike lane-axis repeats.
  scale  — bfloat16 [pack, K/group, N/pack]: per-group effective scale
           (super-block d pre-multiplied with packed sub-scales at repack
           time), group-major so a kernel tile (tile_k/group, tile_n) is
           lane-aligned. bf16 (not f32) halves the scale-plane HBM traffic;
           the ~2^-9 relative rounding is far below the format's own
           quantization error (reference stores d as fp16 anyway,
           ggml-common.h:279).
  min_   — optional, same layout: x = scale * q - min_. The kernels never
           expand min_ per-element; the affine term folds into
           (x-group-sums) @ min_ (the bsums trick of ggml_vec_dot_q4_K_q8_K,
           reference ggml-cpu/ggml-cpu-quants.c:6511).
  lut    — optional float32 [16] codebook (IQ4_NL/IQ4_XS).

layout "rows" (embedding tables — row gathers, never matmuls). The round-1
layout: qs int8/packed [N(/pack), K] with f32 scales [pack, K/group, N/pack];
token j's row is one plane row + sub-value select, so qgather is cheap.

This is the TPU-native analogue of llama.cpp's runtime weight repacking
(ggml-cpu-aarch64.cpp repack_q4_0_to_q4_0_4_bl etc.) — reshaping for the
target ISA's tiling at load time.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import ml_dtypes
import numpy as np

bfloat16 = ml_dtypes.bfloat16

from ..gguf.constants import GGML_BLOCK_SIZES, GGMLType
from . import codecs
from .codecs import (
    KVALUES_IQ4NL,
    _k4_unpack_scale_min,
    _q3k_unpack_scales,
    _read_f16,
    _unpack_qh32,
)


@dataclasses.dataclass
class QTensor:
    """A quantized weight in TPU plane layout. Logical matmul shape: (N, K),
    i.e. y[m, n] = sum_k x[m, k] * w[n, k] (ggml stores weights K-major the
    same way)."""

    kind: str  # 'dense' | 'int8' | 'u4' | 'u2' | 'u4lut' | 'u2lut'
    shape: tuple[int, int]  # (N, K) logical (N possibly padded; see n_orig)
    n_orig: int
    group: int
    qs: Any  # numpy or jax array, see module docstring
    scale: Any | None = None
    min_: Any | None = None
    lut: Any | None = None
    ggml_type: GGMLType | None = None
    layout: str = "t"  # 't' (K-major planes, matmul) | 'rows' (gather)
    # fused tensors (wqkv, gate|up): (npk_i, n_orig_i) per constituent, in
    # plane column order; None for plain tensors
    parts: tuple | None = None

    @property
    def pack(self) -> int:
        return {"dense": 1, "int8": 1, "u4": 2, "u2": 4, "u4lut": 2,
                "u2lut": 4}[self.kind]

    @property
    def npk(self) -> int:
        """Packed-plane width: padded N / pack."""
        return self.shape[0] // self.pack

    def astree(self):
        """(leaves, static) split for jit closures."""
        leaves = {"qs": self.qs}
        if self.scale is not None:
            leaves["scale"] = self.scale
        if self.min_ is not None:
            leaves["min_"] = self.min_
        if self.lut is not None:
            leaves["lut"] = self.lut
        return leaves

    # QTensor is a jax pytree: arrays are leaves, layout metadata is static.
    # This lets whole models (dicts of QTensor) pass through jit/pjit/donation.
    def tree_flatten(self):
        leaves = (self.qs, self.scale, self.min_, self.lut)
        aux = (self.kind, self.shape, self.n_orig, self.group, self.ggml_type,
               self.layout, self.parts)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        qs, scale, min_, lut = leaves
        kind, shape, n_orig, group, ggml_type, layout, parts = aux
        return cls(kind, shape, n_orig, group, qs, scale, min_, lut,
                   ggml_type, layout, parts)

    def _put_dtypes(self):
        import jax.numpy as jnp
        sdt = jnp.bfloat16 if self.layout == "t" else jnp.float32
        return (jnp.bfloat16 if self.kind == "dense" else None, sdt)

    def device_put(self, sharding=None) -> "QTensor":
        """Move planes to device (optionally with a jax.sharding.Sharding)."""
        import jax
        import jax.numpy as jnp

        qdt, sdt = self._put_dtypes()

        def put(a, dtype=None):
            if a is None:
                return None
            arr = jnp.asarray(a, dtype=dtype)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            return arr

        return QTensor(
            self.kind, self.shape, self.n_orig, self.group,
            put(self.qs, qdt),
            put(self.scale, sdt),
            put(self.min_, sdt),
            put(self.lut, jnp.float32),
            self.ggml_type, self.layout, self.parts,
        )


def _register_pytree():
    import jax

    jax.tree_util.register_pytree_node(
        QTensor,
        lambda qt: qt.tree_flatten(),
        QTensor.tree_unflatten,
    )


_register_pytree()


# ---------------------------------------------------------------------------
# decomposition: packed GGUF bytes -> (q int [N,K], scale f32 [N,G], min f32|None)
# x = scale*q - min  (or scale*LUT[q] for lut kinds)


def _blocks(raw: np.ndarray, t: GGMLType, n: int, k: int) -> np.ndarray:
    blk, nbytes = GGML_BLOCK_SIZES[t]
    return np.ascontiguousarray(raw, dtype=np.uint8).reshape(n * (k // blk), nbytes)


def _d_q4_0(b, n, k):
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:18]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1)
    s = d.reshape(n, k // 32)
    return q.reshape(n, k), s, 8.0 * s, 32


def _d_q4_1(b, n, k):
    d = _read_f16(b[:, 0:2])
    m = _read_f16(b[:, 2:4])
    qs = b[:, 4:20]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1)
    return q.reshape(n, k), d.reshape(n, k // 32), -m.reshape(n, k // 32), 32


def _d_q5_0(b, n, k):
    d = _read_f16(b[:, 0:2])
    qh = _unpack_qh32(b[:, 2:6])
    qs = b[:, 6:22]
    lo = np.concatenate([qs & 0xF, qs >> 4], axis=1)
    q = lo | (qh << 4)
    s = d.reshape(n, k // 32)
    return q.reshape(n, k), s, 16.0 * s, 32


def _d_q5_1(b, n, k):
    d = _read_f16(b[:, 0:2])
    m = _read_f16(b[:, 2:4])
    qh = _unpack_qh32(b[:, 4:8])
    qs = b[:, 8:24]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1) | (qh << 4)
    return q.reshape(n, k), d.reshape(n, k // 32), -m.reshape(n, k // 32), 32


def _d_q8_0(b, n, k):
    d = _read_f16(b[:, 0:2])
    q = b[:, 2:34].view(np.int8)
    return q.reshape(n, k), d.reshape(n, k // 32), None, 32


def _d_q2_k(b, n, k):
    nb = b.shape[0]
    scales = b[:, 0:16]
    qs = b[:, 16:80].reshape(nb, 2, 1, 32)
    d = _read_f16(b[:, 80:82])[:, None]
    dmin = _read_f16(b[:, 82:84])[:, None]
    shifts = np.arange(4, dtype=np.uint8).reshape(1, 1, 4, 1) * 2
    q = ((qs >> shifts) & 3).reshape(nb, 256)
    s = (d * (scales & 0xF)).astype(np.float32)
    m = (dmin * (scales >> 4)).astype(np.float32)
    return q.reshape(n, k), s.reshape(n, k // 16), m.reshape(n, k // 16), 16


def _d_q3_k(b, n, k):
    nb = b.shape[0]
    hm = b[:, 0:32]
    qs = b[:, 32:96].reshape(nb, 2, 1, 32)
    s6 = _q3k_unpack_scales(b[:, 96:108]).astype(np.int32) - 32
    d = _read_f16(b[:, 108:110])[:, None]
    shifts = np.arange(4, dtype=np.uint8).reshape(1, 1, 4, 1) * 2
    q2 = ((qs >> shifts) & 3).astype(np.int8)
    bit = np.arange(8, dtype=np.uint8).reshape(1, 2, 4, 1)
    hbit = ((hm[:, None, None, :] >> bit) & 1).astype(np.int8)
    q = (q2 + 4 * hbit - 4).reshape(nb, 256)  # signed [-4, 3]
    s = (d * s6.astype(np.float32)).astype(np.float32)
    return q.reshape(n, k), s.reshape(n, k // 16), None, 16


def _d_q4_k(b, n, k):
    nb = b.shape[0]
    d = _read_f16(b[:, 0:2])[:, None]
    dmin = _read_f16(b[:, 2:4])[:, None]
    sc, m = _k4_unpack_scale_min(b[:, 4:16])
    qs = b[:, 16:144].reshape(nb, 4, 32)
    q = np.stack([qs & 0xF, qs >> 4], axis=2).reshape(nb, 256)
    s = (d * sc).astype(np.float32)
    mm = (dmin * m).astype(np.float32)
    return q.reshape(n, k), s.reshape(n, k // 32), mm.reshape(n, k // 32), 32


def _d_q5_k(b, n, k):
    nb = b.shape[0]
    d = _read_f16(b[:, 0:2])[:, None]
    dmin = _read_f16(b[:, 2:4])[:, None]
    sc, m = _k4_unpack_scale_min(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176].reshape(nb, 4, 32)
    lo = np.stack([qs & 0xF, qs >> 4], axis=2).reshape(nb, 8, 32)
    gbit = np.arange(8, dtype=np.uint8).reshape(1, 8, 1)
    hi = ((qh[:, None, :] >> gbit) & 1).astype(np.uint8)
    q = (lo | (hi << 4)).reshape(nb, 256)
    s = (d * sc).astype(np.float32)
    mm = (dmin * m).astype(np.float32)
    return q.reshape(n, k), s.reshape(n, k // 32), mm.reshape(n, k // 32), 32


def _d_q6_k(b, n, k):
    nb = b.shape[0]
    ql = b[:, 0:128].reshape(nb, 2, 64)
    qh = b[:, 128:192].reshape(nb, 2, 32)
    s8 = b[:, 192:208].view(np.int8).astype(np.float32)
    d = _read_f16(b[:, 208:210])[:, None]
    q1 = (ql[:, :, 0:32] & 0xF) | (((qh >> 0) & 3) << 4)
    q2 = (ql[:, :, 32:64] & 0xF) | (((qh >> 2) & 3) << 4)
    q3 = (ql[:, :, 0:32] >> 4) | (((qh >> 4) & 3) << 4)
    q4 = (ql[:, :, 32:64] >> 4) | (((qh >> 6) & 3) << 4)
    q = (np.stack([q1, q2, q3, q4], axis=2).astype(np.int16) - 32).reshape(nb, 256)
    s = (d * s8).astype(np.float32)
    return q.reshape(n, k).astype(np.int8), s.reshape(n, k // 16), None, 16


def _d_iq4_nl(b, n, k):
    d = _read_f16(b[:, 0:2])
    qs = b[:, 2:18]
    q = np.concatenate([qs & 0xF, qs >> 4], axis=1)
    return q.reshape(n, k), d.reshape(n, k // 32), None, 32


def _d_iq4_xs(b, n, k):
    nb = b.shape[0]
    d = _read_f16(b[:, 0:2])
    sh = b[:, 2:4].copy().view(np.uint16)
    sl = b[:, 4:8]
    gi = np.arange(8)
    lo = (sl[:, gi // 2] >> (4 * (gi % 2))[None, :].astype(np.uint8)) & 0xF
    hi = (sh >> (2 * gi)[None, :].astype(np.uint16)) & 3
    ls = (lo.astype(np.int32) | (hi.astype(np.int32) << 4)) - 32
    qs = b[:, 8:136].reshape(nb, 8, 16)
    q = np.concatenate([qs & 0xF, qs >> 4], axis=2).reshape(nb, 256)
    s = (d[:, None] * ls).astype(np.float32)
    return q.reshape(n, k), s.reshape(n, k // 32), None, 32


_DECOMPOSERS = {
    GGMLType.Q4_0: ("u4", _d_q4_0),
    GGMLType.Q4_1: ("u4", _d_q4_1),
    GGMLType.Q5_0: ("int8", _d_q5_0),
    GGMLType.Q5_1: ("int8", _d_q5_1),
    GGMLType.Q8_0: ("int8", _d_q8_0),
    GGMLType.Q2_K: ("u2", _d_q2_k),
    GGMLType.Q3_K: ("int8", _d_q3_k),
    GGMLType.Q4_K: ("u4", _d_q4_k),
    GGMLType.Q5_K: ("int8", _d_q5_k),
    GGMLType.Q6_K: ("int8", _d_q6_k),
    GGMLType.IQ4_NL: ("u4lut", _d_iq4_nl),
    GGMLType.IQ4_XS: ("u4lut", _d_iq4_xs),
}

# i-quants: decode grid+signs to int8 values with per-group scale at repack.
_IQ_GROUPS = {
    GGMLType.IQ2_XXS: 32,
    GGMLType.IQ2_XS: 16,
    GGMLType.IQ2_S: 16,
    GGMLType.IQ3_XXS: 32,
    GGMLType.IQ3_S: 32,
    GGMLType.IQ1_S: 32,
    GGMLType.IQ1_M: 16,
    GGMLType.TQ1_0: 256,
    GGMLType.TQ2_0: 256,
}


def _pack_n(q: np.ndarray, pack: int, bits: int) -> np.ndarray:
    """(N, K) unsigned ints -> (N/pack, K) bytes, value j in bits [j*bits, ...)."""
    n, k = q.shape
    parts = q.reshape(pack, n // pack, k).astype(np.uint8)
    out = np.zeros((n // pack, k), dtype=np.uint8)
    for h in range(pack):
        out |= (parts[h] & ((1 << bits) - 1)) << (bits * h)
    return out


def _pad_rows(a: np.ndarray, n_to: int) -> np.ndarray:
    if a.shape[0] == n_to:
        return a
    pad = np.zeros((n_to - a.shape[0],) + a.shape[1:], dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def _to_group_major(s: np.ndarray, pack: int) -> np.ndarray:
    """[N, G] row-major scales -> [pack, G, N/pack] group-major planes."""
    n, g = s.shape
    return np.ascontiguousarray(
        s.reshape(pack, n // pack, g).transpose(0, 2, 1))


def scale_row_view(qt: "QTensor") -> np.ndarray:
    """Group-major planes back to [N, G] logical row order (host/tests)."""
    s = np.asarray(np.asarray(qt.scale), np.float32)
    pack, g, npk = s.shape
    return s.transpose(0, 2, 1).reshape(pack * npk, g)


def required_n_multiple(ggml_type: GGMLType, tile_n: int = 256) -> int:
    kind = _DECOMPOSERS.get(ggml_type, ("int8", None))[0]
    pack = {"dense": 1, "int8": 1, "u4": 2, "u2": 4, "u4lut": 2,
            "u2lut": 4}[kind]
    return pack * tile_n


USE_NATIVE = True  # C++ fast path (native/ggufio.cpp) when available
_NATIVE_WARNED = False


def _assemble(kind: str, q: np.ndarray, s: np.ndarray, m, g: int,
              n: int, k: int, tile_n: int, layout: str, lut,
              ggml_type: GGMLType) -> QTensor:
    """Decomposed (q [N,K] ints, s/m [N,G]) -> QTensor in the given layout."""
    pack = {"int8": 1, "u4": 2, "u2": 4, "u4lut": 2, "u2lut": 4}[kind]
    mult = pack * tile_n
    n_full = n + (-n % mult)
    q = _pad_rows(q, n_full)
    sdt = bfloat16 if layout == "t" else np.float32
    s = _to_group_major(_pad_rows(s.astype(np.float32), n_full),
                        pack).astype(sdt)
    m = None if m is None else _to_group_major(
        _pad_rows(m.astype(np.float32), n_full), pack).astype(sdt)
    if kind == "int8":
        qs = q.astype(np.int8)
    else:
        bits = {"u4": 4, "u2": 2, "u4lut": 4, "u2lut": 2}[kind]
        qs = _pack_n(q, pack, bits)
    if layout == "t":
        qs = np.ascontiguousarray(qs.T)  # [K, NPK]
    return QTensor(kind, (n_full, k), n, g, qs, s, m, lut,
                   ggml_type=ggml_type, layout=layout)


def repack(raw: np.ndarray, ggml_type: GGMLType, n: int, k: int,
           tile_n: int = 256, layout: str = "t") -> QTensor:
    """Packed GGUF row-major bytes for an (N=n rows, K=k cols) weight ->
    TPU plane layout (see module docstring). Rows padded so N/pack is a
    multiple of tile_n."""
    assert layout in ("t", "rows")
    if USE_NATIVE:
        try:
            from ..native import native_repack

            qt = native_repack(raw, int(ggml_type), n, k, tile_n, layout)
            if qt is not None:
                return qt
        except ImportError as e:
            # Fall back to numpy, but say so ONCE: a broken .so would
            # otherwise show up only as a silent load-time perf regression.
            global _NATIVE_WARNED
            if not _NATIVE_WARNED:
                _NATIVE_WARNED = True
                import warnings

                from ..common import log

                log.warn("native repacker unavailable (%s); using the "
                         "slower numpy path", e)
                warnings.warn(
                    f"native repacker unavailable ({e}); using the slower "
                    "numpy path", RuntimeWarning)
    if ggml_type in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        w = codecs.dequantize(np.ascontiguousarray(raw), ggml_type).reshape(n, k)
        n_pad = -n % tile_n
        w = _pad_rows(w.astype(np.float32), n + n_pad)
        if layout == "t":
            w = np.ascontiguousarray(w.T.astype(bfloat16))  # [K, N]
        return QTensor("dense", (n + n_pad, k), n, k, w,
                       ggml_type=ggml_type, layout=layout)

    if ggml_type in _IQ_GROUPS:
        # exact native-bitwidth decomposition (u4lut 4bpw / u2 2bpw planes;
        # quant/iq_repack.py) — the round-1/2 int8 re-encode inflated these
        # 1.5-3.4 bpw formats to 8+ bpw of serve-time HBM traffic
        from .iq_repack import IQ_DECOMPOSERS

        fn = IQ_DECOMPOSERS[ggml_type]
        b = _blocks(raw, ggml_type, n, k)
        kind, q, s, m, g, lut = fn(b, n, k)
        return _assemble(kind, q, s, m, g, n, k, tile_n, layout, lut,
                         ggml_type)

    kind, fn = _DECOMPOSERS[ggml_type]
    b = _blocks(raw, ggml_type, n, k)
    q, s, m, g = fn(b, n, k)
    lut = KVALUES_IQ4NL.copy() if kind == "u4lut" else None
    return _assemble(kind, q, s, m, g, n, k, tile_n, layout, lut, ggml_type)


def fuse_qtensors(parts: list[QTensor]) -> QTensor | None:
    """Concatenate already-repacked layout-'t' tensors along the plane-column
    axis so decode runs ONE fused kernel for QKV / gate+up instead of 2-3.

    The fused logical output is h-major per constituent: slice constituent i's
    packed columns out of [M, pack, NPK_total] and reshape — see
    ops/qmatmul.qmm_split. Requires identical kind/group/K/lut. Returns None
    when the tensors can't fuse (mixed quant types)."""
    q0 = parts[0]
    # ggml_type equality (not just kind/group) matters: Q4_0/Q4_1/Q4_K all
    # decompose to kind 'u4' group 32 but differ in min_ presence — fusing
    # them would silently drop (or crash on) the affine minimum.
    if any(p.layout != "t" or p.kind != q0.kind or p.group != q0.group
           or p.ggml_type != q0.ggml_type
           or (p.min_ is None) != (q0.min_ is None)
           or p.shape[1] != q0.shape[1] or p.parts is not None
           for p in parts):
        return None
    if any((p.lut is None) != (q0.lut is None) or
           (p.lut is not None and not np.array_equal(p.lut, q0.lut))
           for p in parts):
        return None
    cat = lambda xs, ax: None if xs[0] is None else np.concatenate(
        [np.asarray(x) for x in xs], axis=ax)
    n_full = sum(p.shape[0] for p in parts)
    return QTensor(
        q0.kind, (n_full, q0.shape[1]), n_full, q0.group,
        cat([p.qs for p in parts], 1),
        cat([p.scale for p in parts], -1),
        cat([p.min_ for p in parts], -1),
        q0.lut, ggml_type=q0.ggml_type, layout="t",
        parts=tuple((p.npk, p.n_orig) for p in parts),
    )


def fuse_expert_qtensors(parts: list[QTensor]) -> QTensor | None:
    """fuse_qtensors for expert-STACKED tensors (leading E axis on every
    plane, models/llama._repack_3d): concatenates along the plane-column
    axis per expert so the MoE grouped kernel runs ONE fused gate|up pass
    per routed tile instead of two (ops/gmm.gmm_apply_split slices)."""
    q0 = parts[0]
    if any(p.kind != q0.kind or p.group != q0.group
           or p.ggml_type != q0.ggml_type
           or (p.min_ is None) != (q0.min_ is None)
           or p.shape[1] != q0.shape[1] or p.parts is not None
           or np.asarray(p.qs).ndim != 3
           or np.asarray(p.qs).shape[0] != np.asarray(q0.qs).shape[0]
           for p in parts):
        return None
    if any((p.lut is None) != (q0.lut is None) or
           (p.lut is not None and not np.array_equal(p.lut, q0.lut))
           for p in parts):
        return None
    cat = lambda xs, ax: None if xs[0] is None else np.concatenate(
        [np.asarray(x) for x in xs], axis=ax)
    n_full = sum(p.shape[0] for p in parts)
    return QTensor(
        q0.kind, (n_full, q0.shape[1]), n_full, q0.group,
        cat([p.qs for p in parts], -1),
        cat([p.scale for p in parts], -1),
        cat([p.min_ for p in parts], -1),
        q0.lut, ggml_type=q0.ggml_type, layout="t",
        parts=tuple((p.npk, p.n_orig) for p in parts),
    )


def dequantize_qtensor_np(qt: QTensor) -> np.ndarray:
    """Reference decode of the plane layout back to float (numpy), logical
    row-major [n_orig, K]. Used by tests; the XLA path mirrors this math."""
    n, k = qt.shape
    if qt.kind == "dense":
        w = np.asarray(np.asarray(qt.qs), dtype=np.float32)
        if qt.layout == "t":
            w = w.T
        return w[: qt.n_orig]
    pack = qt.pack
    qs = np.asarray(qt.qs)
    if qt.layout == "t":
        qs = qs.T  # back to [NPK, K]
    if qt.kind == "int8":
        q = qs.astype(np.float32)
    else:
        bits = {"u4": 4, "u2": 2, "u4lut": 4, "u2lut": 2}[qt.kind]
        mask = (1 << bits) - 1
        q = np.concatenate(
            [((qs >> (bits * h)) & mask) for h in range(pack)], axis=0
        ).astype(np.float32)
    if qt.kind in ("u4lut", "u2lut"):
        q = np.asarray(qt.lut)[q.astype(np.int32)]
    s = np.repeat(scale_row_view(qt), qt.group, axis=1)
    w = s * q
    if qt.min_ is not None:
        mrow = np.asarray(np.asarray(qt.min_), np.float32)
        mrow = mrow.transpose(0, 2, 1).reshape(s.shape[0], -1)
        w = w - np.repeat(mrow, qt.group, axis=1)
    return w[: qt.n_orig]
