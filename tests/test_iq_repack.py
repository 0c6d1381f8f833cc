"""Native-bitwidth i-quant repack (quant/iq_repack.py): the plane
decomposition must be EXACT vs the codec dequantizer (same scale/value
products, no amax re-quantization), and the streamed bytes per weight must
stay near the format's native bit width instead of the int8 re-encode's
8+ bpw."""
import numpy as np
import pytest

from llama_cpp_test_tpu.gguf.constants import GGML_BLOCK_SIZES, GGMLType
from llama_cpp_test_tpu.quant import codecs, repack

IQ_TYPES = [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
            GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
            GGMLType.IQ1_M, GGMLType.TQ1_0, GGMLType.TQ2_0]

# ceiling on streamed bytes/weight (qs + scale + min planes, bf16 scales)
MAX_BPW = {
    GGMLType.IQ2_XXS: 4.6, GGMLType.IQ2_XS: 5.1, GGMLType.IQ2_S: 5.1,
    GGMLType.IQ3_XXS: 4.6, GGMLType.IQ3_S: 4.6,
    GGMLType.IQ1_S: 3.1, GGMLType.IQ1_M: 5.1,
    GGMLType.TQ1_0: 2.2, GGMLType.TQ2_0: 2.2,
}


def random_raw(qtype, n, k, seed=0):
    rng = np.random.default_rng(seed)
    blk, nbytes = GGML_BLOCK_SIZES[qtype]
    raw = rng.integers(0, 256, size=(n * (k // blk) * nbytes,),
                      dtype=np.uint8)
    return raw


@pytest.mark.parametrize("qtype", IQ_TYPES, ids=lambda t: t.name)
def test_iq_repack_exact(qtype):
    n, k = 8, 512
    raw = random_raw(qtype, n, k)
    golden = codecs.dequantize(raw, qtype).reshape(n, k)
    mask = np.isfinite(golden)  # random f16 scales may be inf/nan
    assert mask.any()
    # layout 'rows' keeps f32 scale planes -> the decomposition itself must
    # be EXACT (no amax re-quantization error, unlike the old int8 path)
    # (tolerance = f32 op-order noise: s*q - m vs s*(v + delta) cancels a
    # few ulps for near-zero values; there is no re-quantization error)
    qr = repack.repack(raw, qtype, n, k, tile_n=8, layout="rows")
    got_r = repack.dequantize_qtensor_np(qr)[:n]
    scale_mag = np.nanmax(np.abs(golden), axis=1, keepdims=True)
    np.testing.assert_allclose(got_r[mask], golden[mask], rtol=1e-5,
                               atol=float(np.nanmax(scale_mag)) * 1e-6)
    # layout 't' rounds scales to bf16 (~0.4% relative, same policy as every
    # other matmul plane; far below the formats' own quantization error)
    qt = repack.repack(raw, qtype, n, k, tile_n=8)
    got = repack.dequantize_qtensor_np(qt)[:n]
    np.testing.assert_allclose(got[mask], golden[mask], rtol=8e-3,
                               atol=1e-6)


@pytest.mark.parametrize("qtype", IQ_TYPES, ids=lambda t: t.name)
def test_iq_repack_bpw(qtype):
    n, k = 8, 512
    raw = random_raw(qtype, n, k)
    qt = repack.repack(raw, qtype, n, k, tile_n=8)
    nbytes = np.asarray(qt.qs).nbytes
    if qt.scale is not None:
        nbytes += np.asarray(qt.scale).nbytes
    if qt.min_ is not None:
        nbytes += np.asarray(qt.min_).nbytes
    bpw = nbytes * 8.0 / (qt.shape[0] * qt.shape[1])
    assert bpw <= MAX_BPW[qtype], (qtype.name, bpw)
    assert qt.kind in ("u4lut", "u2lut"), qt.kind  # not the int8 inflation


@pytest.mark.parametrize("qtype", [GGMLType.TQ2_0, GGMLType.TQ1_0],
                         ids=lambda t: t.name)
def test_iq_qmm_matches_dense(qtype):
    """u2lut planes flow through both matmul paths (finite data via the
    ternary quantizer, which exists for TQ)."""
    import jax.numpy as jnp

    from llama_cpp_test_tpu.ops.qmatmul import qmm, qmm_xla
    from llama_cpp_test_tpu.quant.codecs import quantize

    n, k = 16, 512
    rng = np.random.default_rng(2)
    wsrc = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
    raw = quantize(wsrc, qtype)
    qt = repack.repack(raw, qtype, n, k, tile_n=8)
    w = repack.dequantize_qtensor_np(qt)
    x = rng.standard_normal((4, k)).astype(np.float32) * 0.1
    ref = x.astype(jnp.bfloat16).astype(np.float32) @ w.T
    y = np.asarray(qmm_xla(jnp.asarray(x), qt))
    nmse = np.mean((y - ref) ** 2) / (np.mean(ref ** 2) + 1e-12)
    assert nmse < 1e-3, nmse
    yk = np.asarray(qmm(jnp.asarray(x), qt, interpret=True))
    nmse2 = np.mean((yk - ref) ** 2) / (np.mean(ref ** 2) + 1e-12)
    assert nmse2 < 1e-3, nmse2


def test_iq2_qmm_interpret_matches_numpy():
    """IQ2_XS u4lut planes: interpret-mode kernel vs the numpy plane decode
    (masking rows whose random f16 block scales are non-finite)."""
    import jax.numpy as jnp

    from llama_cpp_test_tpu.ops.qmatmul import qmm

    n, k = 16, 512
    raw = random_raw(GGMLType.IQ2_XS, n, k, seed=1)
    qt = repack.repack(raw, GGMLType.IQ2_XS, n, k, tile_n=8)
    w = repack.dequantize_qtensor_np(qt)
    finite_rows = np.isfinite(w).all(axis=1)
    assert finite_rows.any()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, k)).astype(np.float32) * 0.1
    ref = x.astype(jnp.bfloat16).astype(np.float32) @ w.T
    yk = np.asarray(qmm(jnp.asarray(x), qt, interpret=True))
    sel = finite_rows
    nmse = np.mean((yk[:, sel] - ref[:, sel]) ** 2) / \
        (np.mean(ref[:, sel] ** 2) + 1e-12)
    assert nmse < 1e-3, nmse
