"""GGUF file reader — mmap-backed, zero-copy tensor views.

Parses the GGUF container (magic/version/KV metadata/tensor infos + aligned
data blob) as specified by the reference implementation
(/root/reference/ggml/src/gguf.cpp:319-420) and returns numpy views directly
into the mmap so multi-GB weights never get copied on the host until repack.

For peak load throughput a C++ fast path (native/ggufio.cpp) can stream +
repack blocks without the GIL; this pure-numpy reader is the portable path
and the golden reference for it.
"""
from __future__ import annotations

import mmap
import os
import re
import struct
from dataclasses import dataclass, field
from typing import Any, BinaryIO

import numpy as np

from .constants import (
    GGML_BLOCK_SIZES,
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGMLType,
    GGUFValueType,
    type_size,
)

_SCALAR_FMT = {
    GGUFValueType.UINT8: "<B",
    GGUFValueType.INT8: "<b",
    GGUFValueType.UINT16: "<H",
    GGUFValueType.INT16: "<h",
    GGUFValueType.UINT32: "<I",
    GGUFValueType.INT32: "<i",
    GGUFValueType.FLOAT32: "<f",
    GGUFValueType.BOOL: "<?",
    GGUFValueType.UINT64: "<Q",
    GGUFValueType.INT64: "<q",
    GGUFValueType.FLOAT64: "<d",
}

_SCALAR_NP = {
    GGUFValueType.UINT8: np.uint8,
    GGUFValueType.INT8: np.int8,
    GGUFValueType.UINT16: np.uint16,
    GGUFValueType.INT16: np.int16,
    GGUFValueType.UINT32: np.uint32,
    GGUFValueType.INT32: np.int32,
    GGUFValueType.FLOAT32: np.float32,
    GGUFValueType.UINT64: np.uint64,
    GGUFValueType.INT64: np.int64,
    GGUFValueType.FLOAT64: np.float64,
}


@dataclass
class GGUFTensorInfo:
    name: str
    shape: tuple[int, ...]  # ggml order: ne[0] fastest-varying (row length) first
    ggml_type: GGMLType
    offset: int  # relative to data-section start
    nbytes: int = 0

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated GGUF file")
        self.pos += n
        return bytes(b)

    def scalar(self, fmt: str):
        size = struct.calcsize(fmt)
        (v,) = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return v

    def u32(self) -> int:
        return self.scalar("<I")

    def u64(self) -> int:
        return self.scalar("<Q")

    def string(self) -> str:
        n = self.u64()
        return self.read(n).decode("utf-8", errors="replace")


class GGUFReader:
    """Read-only view over a GGUF file.

    Attributes:
      metadata: dict of key -> python value (arrays become lists / np arrays)
      tensors: dict of name -> GGUFTensorInfo
    """

    def __init__(self, path: str | os.PathLike):
        self.path = os.fspath(path)
        self._file: BinaryIO = open(self.path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        self._buf = memoryview(self._mm)
        self.metadata: dict[str, Any] = {}
        self.tensors: dict[str, GGUFTensorInfo] = {}
        self.alignment = GGUF_DEFAULT_ALIGNMENT
        self._parse()

    # -- container parsing ------------------------------------------------

    def _read_value(self, cur: _Cursor, vtype: GGUFValueType):
        if vtype == GGUFValueType.STRING:
            return cur.string()
        if vtype == GGUFValueType.ARRAY:
            itype = GGUFValueType(cur.u32())
            n = cur.u64()
            if itype == GGUFValueType.STRING:
                return [cur.string() for _ in range(n)]
            if itype == GGUFValueType.ARRAY:
                return [self._read_value(cur, GGUFValueType.ARRAY) for _ in range(n)]
            if itype == GGUFValueType.BOOL:
                raw = np.frombuffer(cur.read(n), dtype=np.uint8)
                return raw.astype(bool)
            dt = _SCALAR_NP[itype]
            nbytes = np.dtype(dt).itemsize * n
            arr = np.frombuffer(cur.read(nbytes), dtype=dt)
            return arr
        return cur.scalar(_SCALAR_FMT[vtype])

    def _parse(self) -> None:
        cur = _Cursor(self._buf)
        if cur.read(4) != GGUF_MAGIC:
            raise ValueError(f"{self.path}: not a GGUF file (bad magic)")
        version = cur.u32()
        if version not in (2, 3):
            raise ValueError(f"{self.path}: unsupported GGUF version {version}")
        self.version = version
        n_tensors = cur.u64()
        n_kv = cur.u64()
        for _ in range(n_kv):
            key = cur.string()
            vtype = GGUFValueType(cur.u32())
            self.metadata[key] = self._read_value(cur, vtype)
        self.alignment = int(self.metadata.get("general.alignment", GGUF_DEFAULT_ALIGNMENT))
        for _ in range(n_tensors):
            name = cur.string()
            n_dims = cur.u32()
            shape = tuple(cur.u64() for _ in range(n_dims))
            ttype = GGMLType(cur.u32())
            offset = cur.u64()
            info = GGUFTensorInfo(name=name, shape=shape, ggml_type=ttype, offset=offset)
            info.nbytes = type_size(ttype, info.n_elements)
            self.tensors[name] = info
        # data section starts at next multiple of alignment
        pad = -cur.pos % self.alignment
        self.data_offset = cur.pos + pad

    # -- tensor access -----------------------------------------------------

    def tensor_bytes(self, name: str) -> np.ndarray:
        """Raw packed bytes of a tensor as a uint8 view (no copy)."""
        info = self.tensors[name]
        start = self.data_offset + info.offset
        return np.frombuffer(self._buf, dtype=np.uint8, count=info.nbytes, offset=start)

    def tensor_blocks(self, name: str) -> np.ndarray:
        """Packed bytes reshaped to (n_rows..., n_blocks_per_row, block_bytes)."""
        info = self.tensors[name]
        blk, nbytes = GGML_BLOCK_SIZES[info.ggml_type]
        raw = self.tensor_bytes(name)
        row = info.shape[0] if info.shape else 1
        rest = info.n_elements // max(row, 1)
        return raw.reshape(rest, row // blk, nbytes)

    def dequantize(self, name: str, dtype=np.float32) -> np.ndarray:
        """Fully dequantize a tensor to float, shape in numpy (row-major) order.

        GGUF stores shape as ggml ne[] (fastest dim first); numpy order is the
        reverse, so a GGUF [n_embd, n_vocab] embedding comes out
        (n_vocab, n_embd).
        """
        from ..quant import codecs  # local import to avoid cycle

        info = self.tensors[name]
        raw = self.tensor_bytes(name)
        flat = codecs.dequantize(raw, info.ggml_type)
        npshape = tuple(reversed(info.shape))
        out = flat.reshape(npshape).astype(dtype, copy=False)
        # copy so no view pins the mmap open (zero-copy path: tensor_bytes)
        return out.copy() if out.base is not None else out

    def close(self) -> None:
        try:
            self._buf.release()
            self._mm.close()
        except BufferError:
            # outstanding zero-copy views (tensor_bytes) still pin the mmap;
            # the OS mapping is released when they are garbage-collected
            pass
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# multi-split support (reference llama_split_path include/llama.h:1367 and
# llama-model-loader multi-split GGUF loading)

SPLIT_RE = re.compile(r"-(\d{5})-of-(\d{5})\.gguf$")


def split_path(prefix: str, split_no: int, split_count: int) -> str:
    """<prefix>-%05d-of-%05d.gguf (llama_split_path)."""
    return f"{prefix}-{split_no:05d}-of-{split_count:05d}.gguf"


class SplitGGUFReader:
    """GGUFReader-compatible view over a multi-split model: metadata from
    shard 1, tensors unioned across all shards."""

    def __init__(self, first_path: str):
        m = SPLIT_RE.search(first_path)
        if not m:
            raise ValueError(f"{first_path}: not a -NNNNN-of-NNNNN.gguf path")
        prefix = first_path[: m.start()]
        n_split = int(m.group(2))
        self.path = first_path
        self._readers = [GGUFReader(split_path(prefix, i + 1, n_split))
                         for i in range(n_split)]
        self.metadata = self._readers[0].metadata
        self.tensors: dict[str, GGUFTensorInfo] = {}
        self._owner: dict[str, GGUFReader] = {}
        for r in self._readers:
            for name, info in r.tensors.items():
                self.tensors[name] = info
                self._owner[name] = r
        want = self.metadata.get("split.tensors.count")
        if want is not None and int(want) != len(self.tensors):
            raise ValueError(
                f"split model incomplete: {len(self.tensors)} tensors, "
                f"expected {want}")

    def tensor_bytes(self, name: str):
        return self._owner[name].tensor_bytes(name)

    def tensor_blocks(self, name: str):
        return self._owner[name].tensor_blocks(name)

    def dequantize(self, name: str, dtype=np.float32):
        return self._owner[name].dequantize(name, dtype)

    def close(self) -> None:
        for r in self._readers:
            r.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_gguf(path: str):
    """Open a GGUF file, transparently handling -NNNNN-of-NNNNN splits."""
    if SPLIT_RE.search(os.fspath(path)):
        return SplitGGUFReader(os.fspath(path))
    return GGUFReader(path)
