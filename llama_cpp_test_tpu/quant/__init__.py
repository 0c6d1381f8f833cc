"""Quantization codecs + TPU repacking.

codecs: numpy (de)quantization for every GGUF block format (byte-layout
  compatible with ggml-quants.c / ggml-common.h reference layouts).
repack: converts packed GGUF blocks into TPU-friendly plane layouts consumed
  by the fused Pallas dequant-matmul kernels in ops/.
"""
from . import codecs  # noqa: F401
