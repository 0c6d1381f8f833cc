"""Architecture registry (the llama-arch.{h,cpp} analogue).

Maps GGUF `general.architecture` strings to model builders. The reference
enumerates 60 architectures (llama-arch.h:12-72); here each entry declares
which forward-pass family serves it plus arch-specific quirks. The llama
family (llama/mistral/mixtral/tinyllama) is first-class per BASELINE; more
entries register with @register_arch.
"""
from __future__ import annotations

import dataclasses
from typing import Callable


@dataclasses.dataclass(frozen=True)
class ArchSpec:
    name: str
    family: str                  # forward-pass implementation family
    rope_type: str = "norm"      # see hparams.HParams.rope_type
    notes: str = ""


ARCHITECTURES: dict[str, ArchSpec] = {}


def register_arch(spec: ArchSpec) -> ArchSpec:
    ARCHITECTURES[spec.name] = spec
    return spec


for _name in ("llama", "llama4", "mistral", "mixtral", "granite", "deci",
              "minicpm", "cohere2", "deepseek", "deepseek2", "baichuan",
              "orion", "internlm2", "xverse", "command-r", "olmo", "arctic",
              "chatglm", "chameleon"):
    register_arch(ArchSpec(_name, family="llama", rope_type="norm"))

for _name in ("qwen2", "qwen2moe", "qwen", "stablelm", "starcoder2", "phi3",
              "phi2", "phimoe", "olmo2", "olmoe",
              "nemotron", "exaone", "minicpm3", "falcon", "grok", "dbrx",
              "gptneox", "codeshell", "openelm", "bitnet"):
    register_arch(ArchSpec(_name, family="llama", rope_type="neox"))

# qwen3: llama-style + per-head Q/K RMS norms (attn_q_norm/attn_k_norm
# tensors, handled by models/llama.py forward_layer)
for _name in ("qwen3", "qwen3moe"):
    register_arch(ArchSpec(_name, family="llama", rope_type="neox",
                           notes="qk-norm"))

# gemma family: GeGLU + sqrt(n_embd) embedding scale; gemma2 adds sandwich
# norms, attn/final logit softcapping and alternating SWA; gemma3 adds
# qk-norms and 5:1 local/global SWA (models/hparams.py quirk fields)
for _name in ("gemma", "gemma2", "gemma3"):
    register_arch(ArchSpec(_name, family="llama", rope_type="neox",
                           notes="gelu, embd-scale, softcap, swa-pattern"))


def get_arch(name: str) -> ArchSpec:
    spec = ARCHITECTURES.get(name)
    if spec is None:
        raise ValueError(
            f"unknown architecture {name!r}; known: {sorted(ARCHITECTURES)}")
    return spec
