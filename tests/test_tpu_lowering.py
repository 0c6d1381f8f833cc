"""AOT TPU-lowering gate for every Pallas kernel.

Interpret-mode conformance tests prove the math but skip Mosaic's tiling
checks (the round-2 qmatmul regression shipped green tests and crashed on
hardware). This gate lowers each kernel for the TPU platform ON CPU via
`jax.jit(f).trace(args).lower(lowering_platforms=("tpu",))` over the REAL
model geometries (TinyLlama-1.1B / Llama-3-8B shapes, every quant plane
kind, both M regimes), so an illegal BlockSpec fails the suite instead of
the benchmark. Analogue of the reference's backend conformance idea
(/root/reference/tests/test-backend-ops.cpp:423), applied to lowerability.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_cpp_test_tpu.quant.repack import QTensor
from llama_cpp_test_tpu.ops import qmatmul
from llama_cpp_test_tpu.ops.flash_prefill import flash_prefill
from llama_cpp_test_tpu.ops.paged_attention import paged_attention_decode

f32, bf16, i32, u8, i8 = jnp.float32, jnp.bfloat16, jnp.int32, jnp.uint8, jnp.int8


def sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def lower_tpu(f, *args):
    """Trace with abstract args and lower for TPU — runs on CPU, catches
    Mosaic block-shape/tiling rejections without hardware."""
    jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))


def qt_spec(kind, n, k, group, *, has_min=False, has_lut=False, tile_n=256):
    """QTensor pytree whose leaves are ShapeDtypeStructs (layout 't')."""
    pack = {"int8": 1, "u4": 2, "u2": 4, "u4lut": 2, "u2lut": 4}[kind]
    mult = pack * tile_n
    n_full = n + (-n % mult)
    npk = n_full // pack
    qs = sds((k, npk), i8 if kind == "int8" else u8)
    scale = sds((pack, k // group, npk), bf16)
    min_ = sds((pack, k // group, npk), bf16) if has_min else None
    lut = sds((4,) if kind == "u2lut" else (16,), f32) if has_lut else None
    return QTensor(kind, (n_full, k), n, group, qs, scale, min_, lut)


# (kind, group, has_min, has_lut) — one per plane family the repacker emits:
# u4+min = Q4_K/Q4_1/Q5_... ; int8 g32 = Q8_0/Q5_K/i-quant repack;
# int8 g16 = Q6_K/Q3_K; u2+min = Q2_K; u4lut = IQ4_NL/IQ4_XS.
PLANE_KINDS = [
    ("u4", 32, True, False),
    ("u4", 32, False, False),
    ("int8", 32, False, False),
    ("int8", 16, False, False),
    ("u2", 16, True, False),
    ("u4lut", 32, False, True),
    ("u4lut", 16, False, True),   # iq2_xs/iq2_s/iq1_m repack
    ("u2lut", 32, False, True),   # iq1_s repack
    ("u2lut", 256, False, True),  # ternary TQ repack
]

# Real matmul geometries (N, K): TinyLlama-1.1B wqkv/wo/gate+up/down/lm_head,
# Llama-3-8B down (K=14336), plus awkward K values (K=5632 forced the round-2
# Mosaic rejection; K=320 exercises the whole-K fallback).
GEOMETRIES = [
    (2560, 2048),    # fused wqkv (2048 + 2*256)
    (2048, 2048),    # wo
    (11264, 2048),   # fused gate|up
    (2048, 5632),    # ffn_down — the round-2 crash shape
    (32000, 2048),   # lm_head
    (4096, 14336),   # 8B ffn_down
    (256, 320),      # non-power-of-two K fallback
]

M_REGIMES = [8, 256]  # decode bucket / prefill tile


@pytest.mark.parametrize("m", M_REGIMES)
@pytest.mark.parametrize("kind,group,has_min,has_lut", PLANE_KINDS,
                         ids=lambda v: str(v))
@pytest.mark.parametrize("n,k", GEOMETRIES, ids=lambda v: str(v))
def test_qmm_lowers_on_tpu(m, kind, group, has_min, has_lut, n, k):
    if k % group:
        pytest.skip("geometry/group mismatch")
    qt = qt_spec(kind, n, k, group, has_min=has_min, has_lut=has_lut)
    x = sds((m, k), f32)
    lower_tpu(functools.partial(qmatmul.qmm, tile_n=256), x, qt)


# Grouped expert matmul (ops/gmm.py): Mixtral-8x7B geometry shards
# (E=8, gate/up 14336x4096 and down 4096x14336) and a small-expert edge.
GMM_GEOS = [
    (8, 14336, 4096, 8),     # mixtral gate/up, decode row tiles
    (8, 4096, 14336, 64),    # mixtral down, prefill row tiles
    (4, 1408, 2048, 8),      # qwen2moe-ish small experts
]


@pytest.mark.parametrize("kind,group,has_min,has_lut", PLANE_KINDS[:3],
                         ids=lambda v: str(v))
@pytest.mark.parametrize("e,n,k,tile_m", GMM_GEOS, ids=lambda v: str(v))
def test_gmm_lowers_on_tpu(kind, group, has_min, has_lut, e, n, k, tile_m):
    from llama_cpp_test_tpu.ops import gmm as gmm_mod

    if k % group:
        pytest.skip("geometry/group mismatch")
    base = qt_spec(kind, n, k, group, has_min=has_min, has_lut=has_lut)
    lead = lambda s: None if s is None else sds((e,) + s.shape, s.dtype)
    qt = QTensor(base.kind, base.shape, base.n_orig, base.group,
                 lead(base.qs), lead(base.scale), lead(base.min_), base.lut)
    t = 4  # row tiles
    xs = sds((t * tile_m, k), f32)
    te = sds((t,), i32)
    lower_tpu(functools.partial(gmm_mod.gmm_apply, tile_m=tile_m), xs, qt, te)


def test_qmm_dense_lowers_on_tpu():
    qt = QTensor("dense", (2048, 2048), 2048, 2048, sds((2048, 2048), bf16))
    lower_tpu(qmatmul.qmm, sds((8, 2048), f32), qt)


# Paged attention geometries: (H, KV, D, BS) — TinyLlama (32/4/64),
# Llama-3-8B (32/8/128), MHA edge (8/8/64).
ATTN_GEOS = [(32, 4, 64, 16), (32, 8, 128, 16), (8, 8, 64, 8)]


@pytest.mark.parametrize("h,kv,d,bs", ATTN_GEOS, ids=lambda v: str(v))
def test_paged_attention_decode_lowers_on_tpu(h, kv, d, bs):
    b, nb, nbmax = 8, 64, 32
    lower_tpu(
        paged_attention_decode,
        sds((b, h, d), bf16),
        sds((kv, nb, bs, d), bf16),
        sds((kv, nb, bs, d), bf16),
        sds((b,), i32),
        sds((b, nbmax), i32),
    )


@pytest.mark.parametrize("h,kv,d,bs", ATTN_GEOS, ids=lambda v: str(v))
@pytest.mark.parametrize("t", [128, 512])
def test_flash_prefill_lowers_on_tpu(h, kv, d, bs, t):
    b, nb, nbmax = 2, 64, 64
    lower_tpu(
        functools.partial(flash_prefill, window=0, soft_cap=0.0),
        sds((b, t, h, d), bf16),
        sds((kv, nb, bs, d), bf16),
        sds((kv, nb, bs, d), bf16),
        sds((b, t), i32),
        sds((b,), i32),
        sds((b, nbmax), i32),
    )


def test_flash_prefill_swa_softcap_lowers_on_tpu():
    h, kv, d, bs = 16, 8, 128, 16
    b, t, nb, nbmax = 2, 256, 64, 64
    lower_tpu(
        functools.partial(flash_prefill, window=1024, soft_cap=50.0),
        sds((b, t, h, d), bf16),
        sds((kv, nb, bs, d), bf16),
        sds((kv, nb, bs, d), bf16),
        sds((b, t), i32),
        sds((b,), i32),
        sds((b, nbmax), i32),
    )
