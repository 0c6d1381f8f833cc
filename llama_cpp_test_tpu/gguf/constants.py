"""GGUF container + ggml type constants.

The GGUF on-disk format and the ggml tensor-type enumeration are file-format
facts we must match byte-for-byte to load real model files.
Reference: /root/reference/ggml/include/ggml.h:352-391 (type enum),
/root/reference/ggml/src/gguf.cpp:319-420 (container layout),
/root/reference/ggml/src/ggml-common.h:161-412 (block layouts).
"""
from __future__ import annotations

import enum

GGUF_MAGIC = b"GGUF"
GGUF_VERSION = 3
GGUF_DEFAULT_ALIGNMENT = 32

QK_K = 256  # super-block size for K-quants and i-quants


class GGMLType(enum.IntEnum):
    """ggml tensor dtypes (ggml.h:352-391). Values are the on-disk ids."""

    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    # 4, 5: removed (Q4_2 / Q4_3)
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14
    Q8_K = 15
    IQ2_XXS = 16
    IQ2_XS = 17
    IQ3_XXS = 18
    IQ1_S = 19
    IQ4_NL = 20
    IQ3_S = 21
    IQ2_S = 22
    IQ4_XS = 23
    I8 = 24
    I16 = 25
    I32 = 26
    I64 = 27
    F64 = 28
    IQ1_M = 29
    BF16 = 30
    # 31-33: removed (runtime repack types q4_0_4_4 …)
    TQ1_0 = 34
    TQ2_0 = 35


# type -> (elements per block, bytes per block)
GGML_BLOCK_SIZES: dict[GGMLType, tuple[int, int]] = {
    GGMLType.F32: (1, 4),
    GGMLType.F16: (1, 2),
    GGMLType.BF16: (1, 2),
    GGMLType.F64: (1, 8),
    GGMLType.I8: (1, 1),
    GGMLType.I16: (1, 2),
    GGMLType.I32: (1, 4),
    GGMLType.I64: (1, 8),
    GGMLType.Q4_0: (32, 18),     # fp16 d + 16B nibbles
    GGMLType.Q4_1: (32, 20),     # fp16 d,m + 16B nibbles
    GGMLType.Q5_0: (32, 22),     # fp16 d + 4B high bits + 16B nibbles
    GGMLType.Q5_1: (32, 24),
    GGMLType.Q8_0: (32, 34),     # fp16 d + 32 int8
    GGMLType.Q8_1: (32, 36),
    GGMLType.Q2_K: (QK_K, 84),   # 16 scales + 64 qs + fp16 d,dmin
    GGMLType.Q3_K: (QK_K, 110),  # 32 hmask + 64 qs + 12 scales + fp16 d
    GGMLType.Q4_K: (QK_K, 144),  # fp16 d,dmin + 12 scales + 128 qs
    GGMLType.Q5_K: (QK_K, 176),
    GGMLType.Q6_K: (QK_K, 210),  # 128 ql + 64 qh + 16 scales + fp16 d
    GGMLType.Q8_K: (QK_K, 292),
    GGMLType.IQ2_XXS: (QK_K, 66),
    GGMLType.IQ2_XS: (QK_K, 74),
    GGMLType.IQ2_S: (QK_K, 82),
    GGMLType.IQ3_XXS: (QK_K, 98),
    GGMLType.IQ3_S: (QK_K, 110),
    GGMLType.IQ1_S: (QK_K, 50),
    GGMLType.IQ1_M: (QK_K, 56),
    GGMLType.IQ4_NL: (32, 18),
    GGMLType.IQ4_XS: (QK_K, 136),
    GGMLType.TQ1_0: (QK_K, 54),
    GGMLType.TQ2_0: (QK_K, 66),
}


class GGUFValueType(enum.IntEnum):
    """GGUF metadata value types (gguf.h)."""

    UINT8 = 0
    INT8 = 1
    UINT16 = 2
    INT16 = 3
    UINT32 = 4
    INT32 = 5
    FLOAT32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    UINT64 = 10
    INT64 = 11
    FLOAT64 = 12


# File-level quantization presets (llama.h:146-185 LLAMA_FTYPE_MOSTLY_*).
class LlamaFtype(enum.IntEnum):
    ALL_F32 = 0
    MOSTLY_F16 = 1
    MOSTLY_Q4_0 = 2
    MOSTLY_Q4_1 = 3
    MOSTLY_Q8_0 = 7
    MOSTLY_Q5_0 = 8
    MOSTLY_Q5_1 = 9
    MOSTLY_Q2_K = 10
    MOSTLY_Q3_K_S = 11
    MOSTLY_Q3_K_M = 12
    MOSTLY_Q3_K_L = 13
    MOSTLY_Q4_K_S = 14
    MOSTLY_Q4_K_M = 15
    MOSTLY_Q5_K_S = 16
    MOSTLY_Q5_K_M = 17
    MOSTLY_Q6_K = 18
    MOSTLY_IQ2_XXS = 19
    MOSTLY_IQ2_XS = 20
    MOSTLY_Q2_K_S = 21
    MOSTLY_IQ3_XS = 22
    MOSTLY_IQ3_XXS = 23
    MOSTLY_IQ1_S = 24
    MOSTLY_IQ4_NL = 25
    MOSTLY_IQ3_S = 26
    MOSTLY_IQ3_M = 27
    MOSTLY_IQ2_S = 28
    MOSTLY_IQ2_M = 29
    MOSTLY_IQ4_XS = 30
    MOSTLY_IQ1_M = 31
    MOSTLY_BF16 = 32
    MOSTLY_TQ1_0 = 36
    MOSTLY_TQ2_0 = 37


# Commonly used metadata keys (subset of gguf-py constants.py key space;
# keys are format facts).
class Keys:
    class General:
        ARCHITECTURE = "general.architecture"
        NAME = "general.name"
        ALIGNMENT = "general.alignment"
        FILE_TYPE = "general.file_type"
        QUANTIZATION_VERSION = "general.quantization_version"

    class LLM:  # format with .format(arch=...)
        CONTEXT_LENGTH = "{arch}.context_length"
        EMBEDDING_LENGTH = "{arch}.embedding_length"
        BLOCK_COUNT = "{arch}.block_count"
        FEED_FORWARD_LENGTH = "{arch}.feed_forward_length"
        EXPERT_COUNT = "{arch}.expert_count"
        EXPERT_USED_COUNT = "{arch}.expert_used_count"
        EXPERT_FEED_FORWARD_LENGTH = "{arch}.expert_feed_forward_length"
        VOCAB_SIZE = "{arch}.vocab_size"

    class Attention:
        HEAD_COUNT = "{arch}.attention.head_count"
        HEAD_COUNT_KV = "{arch}.attention.head_count_kv"
        LAYERNORM_RMS_EPS = "{arch}.attention.layer_norm_rms_epsilon"
        KEY_LENGTH = "{arch}.attention.key_length"
        VALUE_LENGTH = "{arch}.attention.value_length"
        SLIDING_WINDOW = "{arch}.attention.sliding_window"

    class Rope:
        DIMENSION_COUNT = "{arch}.rope.dimension_count"
        FREQ_BASE = "{arch}.rope.freq_base"
        SCALING_TYPE = "{arch}.rope.scaling.type"
        SCALING_FACTOR = "{arch}.rope.scaling.factor"
        SCALING_ORIG_CTX_LEN = "{arch}.rope.scaling.original_context_length"
        SCALING_ATTN_FACTOR = "{arch}.rope.scaling.attn_factor"
        SCALING_LOW_FREQ_FACTOR = "{arch}.rope.scaling.low_freq_factor"
        SCALING_HIGH_FREQ_FACTOR = "{arch}.rope.scaling.high_freq_factor"

    class Tokenizer:
        MODEL = "tokenizer.ggml.model"
        PRE = "tokenizer.ggml.pre"
        LIST = "tokenizer.ggml.tokens"
        TOKEN_TYPE = "tokenizer.ggml.token_type"
        SCORES = "tokenizer.ggml.scores"
        MERGES = "tokenizer.ggml.merges"
        BOS_ID = "tokenizer.ggml.bos_token_id"
        EOS_ID = "tokenizer.ggml.eos_token_id"
        UNK_ID = "tokenizer.ggml.unknown_token_id"
        PAD_ID = "tokenizer.ggml.padding_token_id"
        ADD_BOS = "tokenizer.ggml.add_bos_token"
        ADD_EOS = "tokenizer.ggml.add_eos_token"
        ADD_SPACE_PREFIX = "tokenizer.ggml.add_space_prefix"
        REMOVE_EXTRA_WS = "tokenizer.ggml.remove_extra_whitespaces"
        CHAT_TEMPLATE = "tokenizer.chat_template"


def type_size(t: GGMLType, n_elements: int) -> int:
    """Bytes needed for n_elements of type t (row-major, n divisible by block)."""
    blk, nbytes = GGML_BLOCK_SIZES[t]
    if n_elements % blk != 0:
        raise ValueError(f"{n_elements} elements not divisible by block {blk} for {t.name}")
    return (n_elements // blk) * nbytes


QUANTIZED_TYPES = frozenset(
    t for t, (blk, _) in GGML_BLOCK_SIZES.items()
    if blk > 1
)
