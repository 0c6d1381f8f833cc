#!/usr/bin/env python
"""Extract the i-quant codebook grid tables into quant/data/iq_grids.npz.

The grids (e.g. iq2xxs_grid[256], ksigns-expanded lattice points) are numeric
constants of the GGUF i-quant file formats (defined in the reference's
ggml-common.h GGML_TABLE_BEGIN blocks and mirrored in gguf-py). They are data,
not code; we extract them once into an .npz shipped with the package.

Usage: python tools/gen_iq_grids.py [/path/to/reference/gguf-py]
"""
import importlib
import os
import sys
import types

import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/gguf-py"


def main():
    sys.path.insert(0, REF)
    pkg = types.ModuleType("gguf")
    pkg.__path__ = [os.path.join(REF, "gguf")]
    sys.modules["gguf"] = pkg
    q = importlib.import_module("gguf.quants")

    out = {}
    # grid element values: entry i decodes to grid_map[bits], one byte per elem
    def decode(cls, n_entries, elems_per_entry, signed):
        grid = np.frombuffer(cls.grid_hex, dtype=np.uint8)
        # hex chars -> nibbles
        h = grid.reshape(-1, 2)
        nib = (np.where(h >= ord("a"), h - ord("a") + 10, h - ord("0"))).astype(np.uint8)
        byts = (nib[:, 0] << 4) | nib[:, 1]
        import math
        bits_per = math.ceil(math.log2(len(cls.grid_map)))
        elems_per_byte = 8 // bits_per
        # fields sit at a stride of 8/elems_per_byte bits within each byte
        shift = np.arange(0, 8, 8 // elems_per_byte, dtype=np.uint8)
        fields = (byts[:, None] >> shift) & ((1 << bits_per) - 1)
        fields = fields.reshape(-1)
        gmap = np.array(cls.grid_map, dtype=np.float32)
        decoded = gmap[fields]
        decoded = decoded.reshape(n_entries, elems_per_entry)
        dt = np.int8 if signed or decoded.min() < 0 else np.uint8
        return decoded.astype(dt)

    out["iq2xxs"] = decode(q.IQ2_XXS, 256, 8, False)
    out["iq2xs"] = decode(q.IQ2_XS, 512, 8, False)
    out["iq2s"] = decode(q.IQ2_S, 1024, 8, False)
    out["iq3xxs"] = decode(q.IQ3_XXS, 256, 4, False)
    out["iq3s"] = decode(q.IQ3_S, 512, 4, False)
    out["iq1s"] = decode(q.IQ1_S, 2048, 8, True)

    dest = os.path.join(os.path.dirname(__file__), "..",
                        "llama_cpp_test_tpu", "quant", "data", "iq_grids.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    np.savez_compressed(dest, **out)
    for k, v in out.items():
        print(k, v.shape, v.dtype, "min", v.min(), "max", v.max())
    print("wrote", os.path.abspath(dest))


if __name__ == "__main__":
    main()
