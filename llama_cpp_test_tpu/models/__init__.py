"""Model architectures: hparams from GGUF metadata, functional forward passes.

The analogue of the reference's llama-model.cpp graph builders (llm_build_*,
llama-model.cpp:4037+) and llama-arch.{h,cpp} registry — except a "graph
builder" here is a pure function traced by jax.jit.
"""
from .hparams import HParams, hparams_from_metadata  # noqa: F401
from .registry import ARCHITECTURES, get_arch  # noqa: F401
