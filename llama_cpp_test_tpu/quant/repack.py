"""Repack GGUF packed blocks into TPU-friendly plane layouts.

The ggml block layouts (interleaved nibbles, 6-bit packed scales, codebook
indices) are great for SIMD byte shuffles but hostile to (8,128) lane tiling.
At load time we decompose every quantized tensor into flat *planes*:

  qs     — integer values: int8 [N, K], or nibbles packed along the OUTPUT
           dim: uint8 [N/2, K] (byte b[j,k] = q[j,k] | q[j+N/2,k] << 4), or
           crumbs uint8 [N/4, K]. Packing along N (not K) means a lane tile of
           the packed plane unpacks to `pack` full row-tiles — no lane
           interleave needed in the kernel, and the matmul output for the
           packed halves is just out.reshape(M, pack, N/pack) -> (M, N).
  scale  — float32 [pack, K/group, N/pack]: per-group effective scale
           (super-block d pre-multiplied with packed sub-scales at repack
           time), stored group-major so a kernel tile of shape
           (tile_k/group, tile_n) is TPU lane-aligned (last dim 128).
  min_   — optional float32, same layout: x = scale * q - min_.
  lut    — optional float32 [16] codebook (IQ4_NL/IQ4_XS).

This is the TPU-native analogue of llama.cpp's runtime weight repacking
(ggml-cpu-aarch64.cpp repack_q4_0_to_q4_0_4_bl etc.) — reshaping for the
target ISA's tiling at load time.

All quantized types are covered: 4-bit affine (Q4_0/Q4_1/Q4_K) and 2-bit
(Q2_K) keep their packed bit width; 3/5/6-bit and codebook i-quants decompose
to int8 planes in round 1 (hi-bit planes reclaim their bandwidth later).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

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

    kind: str  # 'dense' | 'int8' | 'u4' | 'u2' | 'u4lut'
    shape: tuple[int, int]  # (N, K) logical (N possibly padded; see n_orig)
    n_orig: int
    group: int
    qs: Any  # numpy or jax array, see module docstring
    scale: Any | None = None
    min_: Any | None = None
    lut: Any | None = None
    ggml_type: GGMLType | None = None

    @property
    def pack(self) -> int:
        return {"dense": 1, "int8": 1, "u4": 2, "u2": 4, "u4lut": 2}[self.kind]

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
        aux = (self.kind, self.shape, self.n_orig, self.group, self.ggml_type)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        qs, scale, min_, lut = leaves
        kind, shape, n_orig, group, ggml_type = aux
        return cls(kind, shape, n_orig, group, qs, scale, min_, lut, ggml_type)

    def device_put(self, sharding=None) -> "QTensor":
        """Move planes to device (optionally with a jax.sharding.Sharding)."""
        import jax
        import jax.numpy as jnp

        def put(a, dtype=None):
            if a is None:
                return None
            arr = jnp.asarray(a, dtype=dtype)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            return arr

        return QTensor(
            self.kind, self.shape, self.n_orig, self.group,
            put(self.qs, jnp.bfloat16 if self.kind == "dense" else None),
            put(self.scale, jnp.float32),
            put(self.min_, jnp.float32),
            put(self.lut, jnp.float32),
            self.ggml_type,
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
    s = np.asarray(qt.scale)
    pack, g, npk = s.shape
    return s.transpose(0, 2, 1).reshape(pack * npk, g)


def required_n_multiple(ggml_type: GGMLType, tile_n: int = 128) -> int:
    kind = _DECOMPOSERS.get(ggml_type, ("int8", None))[0]
    pack = {"dense": 1, "int8": 1, "u4": 2, "u2": 4, "u4lut": 2}[kind]
    return pack * tile_n


USE_NATIVE = True  # C++ fast path (native/ggufio.cpp) when available


def repack(raw: np.ndarray, ggml_type: GGMLType, n: int, k: int,
           tile_n: int = 128) -> QTensor:
    """Packed GGUF row-major bytes for an (N=n rows, K=k cols) weight ->
    TPU plane layout. Rows padded so N/pack is a multiple of tile_n."""
    if USE_NATIVE and tile_n == 128:
        try:
            from ..native import native_repack

            qt = native_repack(raw, int(ggml_type), n, k, tile_n)
            if qt is not None:
                return qt
        except Exception:
            pass  # fall back to numpy
    if ggml_type in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        w = codecs.dequantize(np.ascontiguousarray(raw), ggml_type).reshape(n, k)
        mult = tile_n
        n_pad = -n % mult
        return QTensor("dense", (n + n_pad, k), n, k,
                       _pad_rows(w.astype(np.float32), n + n_pad),
                       ggml_type=ggml_type)

    if ggml_type in _IQ_GROUPS:
        g = _IQ_GROUPS[ggml_type]
        x = codecs.dequantize(np.ascontiguousarray(raw), ggml_type).reshape(n, k)
        # factor back into int8 q * per-group scale (lossless for grids whose
        # values are integer multiples of the group scale is not guaranteed;
        # use amax/127 requant — error << the format's own error)
        gv = x.reshape(n, k // g, g)
        s = (np.abs(gv).max(axis=-1) / 127.0).astype(np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(s > 0, 1.0 / s, 0.0)
        q = np.rint(gv * inv[..., None]).astype(np.int8).reshape(n, k)
        mult = tile_n
        n_pad = -n % mult
        return QTensor("int8", (n + n_pad, k), n, g,
                       _pad_rows(q, n + n_pad),
                       _to_group_major(_pad_rows(s, n + n_pad), 1),
                       None, ggml_type=ggml_type)

    kind, fn = _DECOMPOSERS[ggml_type]
    b = _blocks(raw, ggml_type, n, k)
    q, s, m, g = fn(b, n, k)
    pack = {"int8": 1, "u4": 2, "u2": 4, "u4lut": 2}[kind]
    mult = pack * tile_n
    n_pad = -n % mult
    n_full = n + n_pad
    q = _pad_rows(q, n_full)
    s = _to_group_major(_pad_rows(s.astype(np.float32), n_full), pack)
    m = None if m is None else _to_group_major(
        _pad_rows(m.astype(np.float32), n_full), pack)
    if kind == "int8":
        qs = q.astype(np.int8)
    else:
        bits = {"u4": 4, "u2": 2, "u4lut": 4}[kind]
        qs = _pack_n(q, pack, bits)
    lut = KVALUES_IQ4NL.copy() if kind == "u4lut" else None
    return QTensor(kind, (n_full, k), n, g, qs, s, m, lut, ggml_type=ggml_type)


def dequantize_qtensor_np(qt: QTensor) -> np.ndarray:
    """Reference decode of the plane layout back to float (numpy). Used by
    tests and the XLA fallback path mirrors this math."""
    n, k = qt.shape
    if qt.kind == "dense":
        w = np.asarray(qt.qs, dtype=np.float32)
        return w[: qt.n_orig]
    pack = qt.pack
    if qt.kind == "int8":
        q = np.asarray(qt.qs).astype(np.float32)
    else:
        bits = {"u4": 4, "u2": 2, "u4lut": 4}[qt.kind]
        mask = (1 << bits) - 1
        qs = np.asarray(qt.qs)
        q = np.concatenate(
            [((qs >> (bits * h)) & mask) for h in range(pack)], axis=0
        ).astype(np.float32)
    if qt.kind == "u4lut":
        q = np.asarray(qt.lut)[q.astype(np.int32)]
    s = np.repeat(scale_row_view(qt).astype(np.float32), qt.group, axis=1)
    w = s * q
    if qt.min_ is not None:
        mrow = np.asarray(qt.min_).transpose(0, 2, 1).reshape(s.shape[0], -1)
        w = w - np.repeat(mrow.astype(np.float32), qt.group, axis=1)
    return w[: qt.n_orig]
