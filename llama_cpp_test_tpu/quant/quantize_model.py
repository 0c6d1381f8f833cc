"""Model requantization pipeline (the llama-quant.cpp analogue).

Streams a GGUF model tensor-by-tensor, re-encoding each weight to the target
file-type's per-tensor quantization rules (llama_tensor_get_type,
reference src/llama-quant.cpp:122-310): e.g. Q4_K_M upgrades ffn_down and
attn_v to Q6_K, token embeddings stay higher-precision, norms stay F32.
Supports importance-matrix weighting hooks (imatrix) for the formats whose
quantizers accept per-column weights.
"""
from __future__ import annotations

import dataclasses
import sys
import time
from typing import Callable

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter
from . import codecs

# File-type presets (LLAMA_FTYPE_MOSTLY_*, include/llama.h:146-185)
FTYPES = {
    "Q4_0": GGMLType.Q4_0,
    "Q4_1": GGMLType.Q4_1,
    "Q5_0": GGMLType.Q5_0,
    "Q5_1": GGMLType.Q5_1,
    "Q8_0": GGMLType.Q8_0,
    "Q2_K": GGMLType.Q2_K,
    "Q3_K_S": GGMLType.Q3_K, "Q3_K_M": GGMLType.Q3_K, "Q3_K_L": GGMLType.Q3_K,
    "Q4_K_S": GGMLType.Q4_K, "Q4_K_M": GGMLType.Q4_K,
    "Q5_K_S": GGMLType.Q5_K, "Q5_K_M": GGMLType.Q5_K,
    "Q6_K": GGMLType.Q6_K,
    "IQ4_NL": GGMLType.IQ4_NL,
    "IQ4_XS": GGMLType.IQ4_XS,
    # codebook i-quants (encoders: quant/iq_quantize.py). The reference
    # bumps attn_v/ffn_down and keeps embeddings/head higher for these
    # (llama-quant.cpp IQ2 rules) — mirrored in tensor_target_type.
    "IQ2_XXS": GGMLType.IQ2_XXS,
    "IQ2_XS": GGMLType.IQ2_XS,
    "IQ2_S": GGMLType.IQ2_S, "IQ2_M": GGMLType.IQ2_S,
    "IQ3_XXS": GGMLType.IQ3_XXS,
    "IQ3_S": GGMLType.IQ3_S, "IQ3_M": GGMLType.IQ3_S,
    "IQ1_S": GGMLType.IQ1_S,
    "IQ1_M": GGMLType.IQ1_M,
    "F16": GGMLType.F16,
    "BF16": GGMLType.BF16,
}


def tensor_target_type(name: str, ftype: str, base: GGMLType,
                       n_expert: int = 0) -> GGMLType:
    """Per-tensor type rules (llama-quant.cpp:122-310, *_M upgrade paths)."""
    if name == "output_norm.weight" or name.endswith("_norm.weight") or \
            name.endswith(".bias"):
        return GGMLType.F32
    if name == "output.weight":
        # lm head always >= Q6_K for K-quants (llama-quant.cpp:160);
        # i-quant files keep a Q5_K head (llama-quant.cpp IQ rules)
        if base in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ3_XXS,
                    GGMLType.IQ1_S):
            return GGMLType.Q5_K
        if base in (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                    GGMLType.Q5_K, GGMLType.Q4_0, GGMLType.Q4_1):
            return GGMLType.Q6_K
        return base
    if name == "token_embd.weight":
        if base in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ1_S):
            return GGMLType.Q2_K      # llama-quant.cpp: iq2/iq1 embd -> q2_K
        if base == GGMLType.IQ3_XXS:
            return GGMLType.Q3_K
        if base == GGMLType.Q2_K:
            return GGMLType.Q2_K
        if ftype.endswith("_M") or ftype.endswith("_L"):
            return base
        return base
    if ftype in ("IQ2_XXS", "IQ2_XS", "IQ2_S", "IQ2_M", "IQ1_S"):
        if ".attn_v.weight" in name:
            return GGMLType.Q4_K      # llama-quant.cpp iq2 attn_v rule
        if ".ffn_down" in name:
            return GGMLType.IQ3_XXS if ftype != "IQ1_S" else GGMLType.IQ2_XXS
    if ftype in ("Q4_K_M", "Q5_K_M"):
        if ".attn_v.weight" in name or ".ffn_down" in name:
            return GGMLType.Q6_K
    if ftype == "Q3_K_M":
        if ".attn_v.weight" in name or ".ffn_down" in name:
            return GGMLType.Q4_K
        if ".attn_output.weight" in name:
            return GGMLType.Q4_K
    if ftype == "Q3_K_L":
        if ".attn_v.weight" in name or ".ffn_down" in name:
            return GGMLType.Q5_K
    return base


@dataclasses.dataclass
class QuantizeStats:
    tensors: int = 0
    bytes_in: int = 0
    bytes_out: int = 0
    seconds: float = 0.0


def quantize_model(src_path: str, dst_path: str, ftype: str,
                   imatrix: dict[str, np.ndarray] | None = None,
                   progress: Callable[[str, int, int], None] | None = None,
                   ) -> QuantizeStats:
    if ftype not in FTYPES:
        raise ValueError(f"unknown ftype {ftype}; known: {sorted(FTYPES)}")
    base = FTYPES[ftype]
    stats = QuantizeStats()
    t0 = time.time()
    with GGUFReader(src_path) as r:
        w = GGUFWriter(dst_path)
        for key, val in r.metadata.items():
            if key == "general.file_type":
                continue
            w.add_kv(key, val)
        w.add_kv("general.file_type", list(FTYPES).index(ftype))
        names = list(r.tensors)
        n_expert = int(r.metadata.get(
            f"{r.metadata.get('general.architecture', 'llama')}.expert_count",
            0) or 0)
        for i, name in enumerate(names):
            info = r.tensors[name]
            if progress:
                progress(name, i, len(names))
            # 1-d tensors and norms stay F32
            if len(info.shape) < 2:
                target = GGMLType.F32
            else:
                target = tensor_target_type(name, ftype, base, n_expert)
            # rows must divide the block size; fall back if not
            blk = {GGMLType.F32: 1, GGMLType.F16: 1, GGMLType.BF16: 1}.get(
                target)
            if blk is None:
                from ..gguf.constants import GGML_BLOCK_SIZES

                blk = GGML_BLOCK_SIZES[target][0]
            if info.shape[0] % blk:
                target = GGMLType.F16
            dense = r.dequantize(name)  # numpy order [..., row]
            flat = dense.reshape(-1, info.shape[0])
            if target in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
                w.add_tensor(name, dense.astype(
                    {GGMLType.F32: np.float32, GGMLType.F16: np.float16,
                     GGMLType.BF16: np.float32}[target]),
                    ggml_type=target)
            else:
                iw = None
                if imatrix is not None:
                    iw = imatrix.get(name)
                    if iw is not None and iw.size != info.shape[0]:
                        iw = None  # shape mismatch (e.g. stacked experts)
                packed = codecs.quantize(flat.astype(np.float32), target,
                                         weights=iw)
                w.add_tensor(name, packed, ggml_type=target,
                             raw_ggml_shape=info.shape)
            stats.tensors += 1
            stats.bytes_in += info.nbytes
        w.write()
    import os

    stats.bytes_out = os.path.getsize(dst_path)
    stats.seconds = time.time() - t0
    return stats


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser("llama-quantize (tpu)")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("ftype", help="e.g. Q4_K_M, Q8_0, Q6_K")
    ap.add_argument("--imatrix", default=None,
                    help="importance matrix .npz from llama-imatrix")
    ap.add_argument("--fast", action="store_true",
                    help="skip iterative scale refinement")
    args = ap.parse_args(argv)
    if args.fast:
        codecs.set_refine_iters(0)
    imatrix = None
    if args.imatrix:
        from ..runtime.imatrix import IMatrixCollector

        imatrix = IMatrixCollector.load(args.imatrix)

    def progress(name, i, n):
        print(f"[{i+1}/{n}] {name}", file=sys.stderr)

    st = quantize_model(args.src, args.dst, args.ftype.upper(),
                        imatrix=imatrix, progress=progress)
    print(f"quantized {st.tensors} tensors: "
          f"{st.bytes_in/1e6:.1f} MB -> {st.bytes_out/1e6:.1f} MB "
          f"in {st.seconds:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
