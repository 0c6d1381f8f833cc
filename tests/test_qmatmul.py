"""Fused dequant-matmul conformance (the test-backend-ops.cpp analogue):
Pallas kernel (interpret mode on CPU) vs XLA reference vs numpy golden,
per quant type, with per-op NMSE tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_cpp_test_tpu.gguf.constants import GGMLType
from llama_cpp_test_tpu.quant import codecs, repack
from llama_cpp_test_tpu.ops import qmatmul

ALL_TYPES = [
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0,
    GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
    GGMLType.IQ4_NL, GGMLType.IQ4_XS,
]

N, K = 256, 512


def make_qtensor(qtype, n=N, k=K, seed=0, layout="t"):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k), dtype=np.float32) * 0.3
    raw = codecs.quantize(w, qtype)
    return repack.repack(raw, qtype, n, k, layout=layout), raw


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = (a * a).mean() + 1e-12
    return float(((a - b) ** 2).mean() / denom)


@pytest.mark.parametrize("qtype", ALL_TYPES, ids=lambda t: t.name)
def test_rows_repack_matches_codec_dequant(qtype):
    # layout 'rows' keeps f32 scales -> exact reconstruction
    qt, raw = make_qtensor(qtype, layout="rows")
    ours = repack.dequantize_qtensor_np(qt)
    golden = codecs.dequantize(raw, qtype).reshape(N, K)
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("qtype", ALL_TYPES, ids=lambda t: t.name)
def test_t_repack_matches_codec_dequant(qtype):
    # layout 't' stores bf16 scales: reconstruction differs from the codec
    # golden only by the ~2^-9 scale rounding (<< the format's own error)
    qt, raw = make_qtensor(qtype, layout="t")
    assert qt.layout == "t"
    ours = repack.dequantize_qtensor_np(qt)
    golden = codecs.dequantize(raw, qtype).reshape(N, K)
    assert nmse(golden, ours) < 4e-5, f"nmse {nmse(golden, ours)}"


@pytest.mark.parametrize("qtype", ALL_TYPES, ids=lambda t: t.name)
def test_xla_path_matches_numpy(qtype):
    qt, raw = make_qtensor(qtype)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, K), dtype=np.float32)
    golden = x @ repack.dequantize_qtensor_np(qt).T
    y = qmatmul.qmm_xla(jnp.asarray(x), qt)
    assert y.shape == (4, N)
    assert nmse(golden, y) < 5e-5  # bf16 matmul noise


# interpret mode is slow; cover one type per plane kind + both m regimes
PALLAS_TYPES = [GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q2_K, GGMLType.IQ4_NL]


@pytest.mark.parametrize("qtype", PALLAS_TYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("m", [1, 17])
def test_pallas_interpret_matches_xla(qtype, m):
    qt, _ = make_qtensor(qtype)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((m, K), dtype=np.float32)
    # golden = float matmul on decoded weights; the Pallas kernel applies the
    # affine min exactly (xsum @ min on the MXU) while the XLA path rounds
    # (s*q - m) to bf16 jointly, so compare both to the float golden rather
    # than to each other
    golden = x @ repack.dequantize_qtensor_np(qt).T
    y = qmatmul.qmm(jnp.asarray(x), qt, interpret=True)
    assert y.shape == (m, N)
    assert nmse(golden, y) < 5e-5, f"nmse {nmse(golden, y)}"


@pytest.mark.parametrize("use_pallas", [False, True])
def test_fused_split_matches_parts(use_pallas):
    """fuse_qtensors + qmm_split == separate qmm on each constituent."""
    rng = np.random.default_rng(5)
    parts, raws = [], []
    for i, n_i in enumerate((256, 128, 128)):
        qt, raw = make_qtensor(GGMLType.Q4_K, n=n_i, seed=10 + i)
        parts.append(qt)
    fused = repack.fuse_qtensors(parts)
    assert fused is not None and fused.parts is not None
    x = jnp.asarray(rng.standard_normal((3, K), dtype=np.float32))
    outs = qmatmul.qmm_split(x, fused, interpret=True, use_pallas=use_pallas)
    assert len(outs) == 3
    for qt, y in zip(parts, outs):
        ref = (qmatmul.qmm(x, qt, interpret=True) if use_pallas
               else qmatmul.qmm_xla(x, qt))
        assert y.shape == ref.shape == (3, qt.n_orig)
        assert nmse(np.asarray(ref), np.asarray(y)) < 1e-9


def test_fuse_rejects_mixed_types():
    a, _ = make_qtensor(GGMLType.Q4_K)
    b, _ = make_qtensor(GGMLType.Q8_0)
    assert repack.fuse_qtensors([a, b]) is None


def test_iq2_repack_int8():
    # i-quants arrive pre-quantized; decode random packed blocks
    rng = np.random.default_rng(3)
    from llama_cpp_test_tpu.gguf.constants import GGML_BLOCK_SIZES
    blk, nbytes = GGML_BLOCK_SIZES[GGMLType.IQ2_XXS]
    n, k = 8, 512
    raw = rng.integers(0, 256, size=(n * k // blk) * nbytes, dtype=np.uint8)
    golden = codecs.dequantize(raw, GGMLType.IQ2_XXS).reshape(n, k)
    if not np.isfinite(golden).all():
        golden = np.nan_to_num(golden, posinf=0, neginf=0)
        raw = codecs.quantize(np.zeros((n, k), np.float32), GGMLType.Q8_0)
        pytest.skip("random fp16 scales overflowed; covered by other tests")
    qt = repack.repack(raw, GGMLType.IQ2_XXS, n, k)
    ours = repack.dequantize_qtensor_np(qt)
    # int8 requant of the group introduces <=0.5/127 relative error
    assert nmse(golden, ours) < 1e-4


def test_batched_3d_input():
    qt, _ = make_qtensor(GGMLType.Q4_K)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, K), dtype=np.float32)
    y = qmatmul.qmm_xla(jnp.asarray(x), qt)
    assert y.shape == (2, 3, N)


def test_qgather_rows_layout():
    qt, _ = make_qtensor(GGMLType.Q4_K, layout="rows")
    w = repack.dequantize_qtensor_np(qt)
    ids = jnp.asarray([0, 3, 255, 17])
    got = np.asarray(qmatmul.qgather(ids, qt, dtype=jnp.float32))
    assert nmse(w[np.asarray(ids)], got) < 1e-9


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q8_0],
                         ids=lambda t: t.name)
def test_pallas_pipe_variant_matches_golden(qtype):
    """variant='pipe' (sub-chunked K with interleaved dequant/dot
    emission for VPU/MXU overlap) must be numerically equivalent to the
    default kernel — same bf16 dequant products, same f32 accumulation
    order within each chunk."""
    qt, _ = make_qtensor(qtype)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((17, K), dtype=np.float32)
    golden = x @ repack.dequantize_qtensor_np(qt).T
    y = qmatmul.qmm(jnp.asarray(x), qt, interpret=True, variant="pipe")
    assert y.shape == (17, N)
    assert nmse(golden, y) < 5e-5, f"nmse {nmse(golden, y)}"


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q8_0],
                         ids=lambda t: t.name)
def test_pallas_cache_variant_matches_golden(qtype):
    """variant='cache' (m-innermost grid, weight tile dequantized once
    into VMEM scratch and reused across row tiles) must match the
    default kernel numerically. m=520 spans multiple row tiles so the
    scratch-reuse path actually engages."""
    qt, _ = make_qtensor(qtype)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((520, K), dtype=np.float32)
    golden = x @ repack.dequantize_qtensor_np(qt).T
    y = qmatmul.qmm(jnp.asarray(x), qt, interpret=True, variant="cache")
    assert y.shape == (520, N)
    assert nmse(golden, y) < 5e-5, f"nmse {nmse(golden, y)}"
