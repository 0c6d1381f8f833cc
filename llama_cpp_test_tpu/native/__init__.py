"""Native (C++) runtime components, bound via ctypes.

ggufio: threaded GGUF block repacker (ggufio.cpp). Built on demand with g++
(-O3, std::thread); transparently used by quant.repack for the hot formats,
with the numpy implementation as golden reference and fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_ggufio.so")
_SRC = os.path.join(_HERE, "ggufio.cpp")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        sys.stderr.write(f"# ggufio native build failed ({e}); "
                         f"using numpy repack\n")
        return False


def get_lib():
    """Returns the ctypes library or None (numpy fallback)."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.ggufio_supports.argtypes = [ctypes.c_int]
        lib.ggufio_supports.restype = ctypes.c_int
        lib.ggufio_repack.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.ggufio_repack.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_repack(raw, ggml_type: int, n: int, k: int, tile_n: int = 256,
                  layout: str = "t"):
    """C++ fast path for repack(); returns a QTensor or None if unsupported."""
    import numpy as np

    lib = get_lib()
    if lib is None or not lib.ggufio_supports(int(ggml_type)):
        return None
    from ..gguf.constants import GGMLType
    from ..quant.repack import _DECOMPOSERS, QTensor, bfloat16

    t = GGMLType(ggml_type)
    kind = _DECOMPOSERS[t][0]
    pack = {"int8": 1, "u4": 2, "u2": 4, "u4lut": 2, "u2lut": 4}[kind]
    group = {GGMLType.Q8_0: 32, GGMLType.Q4_0: 32, GGMLType.Q4_1: 32,
             GGMLType.Q4_K: 32, GGMLType.Q6_K: 16}[t]
    has_min = t in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K)
    mult = pack * tile_n
    n_padded = n + (-n % mult)
    npk = n_padded // pack
    g = k // group
    dtype = np.int8 if kind == "int8" else np.uint8
    qs = np.zeros((npk, k), dtype)
    scale = np.zeros((pack, g, npk), np.float32)
    min_ = np.zeros((pack, g, npk), np.float32) if has_min else None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    n_threads = int(os.environ.get("LLAMA_ARG_THREADS", "0")) or \
        min(os.cpu_count() or 1, 8)
    rc = lib.ggufio_repack(
        int(ggml_type),
        raw.ctypes.data_as(ctypes.c_void_p),
        n, n_padded, k,
        qs.ctypes.data_as(ctypes.c_void_p),
        scale.ctypes.data_as(ctypes.c_void_p),
        None if min_ is None else min_.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    if rc != 0:
        return None
    if layout == "t":
        qs = np.ascontiguousarray(qs.T)  # [K, NPK]
        scale = scale.astype(bfloat16)
        min_ = None if min_ is None else min_.astype(bfloat16)
    return QTensor(kind, (n_padded, k), n, group, qs, scale, min_,
                   None, ggml_type=t, layout=layout)
