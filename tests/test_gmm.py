"""Grouped expert matmul (ops/gmm.py) conformance vs the dense-masked
reference — the MUL_MAT_ID analogue (reference src/llama-graph.h:451)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_cpp_test_tpu.gguf.constants import GGMLType
from llama_cpp_test_tpu.ops import gmm as gmm_mod
from llama_cpp_test_tpu.quant import repack as repack_mod
from llama_cpp_test_tpu.quant.codecs import quantize
from llama_cpp_test_tpu.quant.repack import QTensor, dequantize_qtensor_np


def stacked_qtensor(e, n, k, ggml_type, rng, tile_n=128):
    """Random [E, N, K] expert stack -> QTensor with leading-E planes (the
    models/llama._repack_3d layout)."""
    qts = []
    for _ in range(e):
        w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
        raw = quantize(w, ggml_type)
        qts.append(repack_mod.repack(raw, ggml_type, n, k, tile_n=tile_n))
    q0 = qts[0]
    st = lambda xs: None if xs[0] is None else np.stack(
        [np.asarray(x) for x in xs])
    return QTensor(q0.kind, q0.shape, q0.n_orig, q0.group,
                   st([q.qs for q in qts]), st([q.scale for q in qts]),
                   st([q.min_ for q in qts]), q0.lut, q0.ggml_type)


def dense_reference(x, qt_stack, topi, topv):
    """Per-token dense compute with numpy-dequantized experts."""
    m = x.shape[0]
    e = qt_stack.qs.shape[0]
    ws = []
    for ei in range(e):
        sl = QTensor(qt_stack.kind, qt_stack.shape, qt_stack.n_orig,
                     qt_stack.group, np.asarray(qt_stack.qs[ei]),
                     None if qt_stack.scale is None else np.asarray(
                         qt_stack.scale[ei]),
                     None if qt_stack.min_ is None else np.asarray(
                         qt_stack.min_[ei]),
                     qt_stack.lut, qt_stack.ggml_type)
        ws.append(dequantize_qtensor_np(sl))             # [n_orig, K]
    out = np.zeros((m, ws[0].shape[0]), np.float32)
    xb = np.asarray(x, np.float32).astype(np.float32)
    xbf = xb.astype(jnp.bfloat16).astype(np.float32)     # kernel casts to bf16
    for i in range(m):
        for j in range(topi.shape[1]):
            ei = int(topi[i, j])
            out[i] += float(topv[i, j]) * (xbf[i] @ ws[ei].T)
    return out


@pytest.mark.parametrize("gt", [GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q6_K,
                                GGMLType.IQ4_NL])
def test_gmm_matches_dense(gt):
    rng = np.random.default_rng(0)
    e, m, k, n, ku = 4, 16, 256, 256, 2
    qt = stacked_qtensor(e, n, k, gt, rng)
    x = rng.standard_normal((m, k)).astype(np.float32) * 0.3
    logits = rng.standard_normal((m, e)).astype(np.float32)
    topv_, topi_ = jax.lax.top_k(jnp.asarray(logits), ku)
    topv_ = jax.nn.softmax(topv_, axis=-1)
    tile_m = 8
    routing = gmm_mod.route_tokens(topi_, topv_, n_expert_local=e,
                                   expert_offset=0, tile_m=tile_m)
    y = np.asarray(gmm_mod.gmm(jnp.asarray(x), qt, routing, tile_m=tile_m,
                               interpret=True))
    ref = dense_reference(x, qt, np.asarray(topi_), np.asarray(topv_))
    nmse = np.mean((y - ref) ** 2) / (np.mean(ref ** 2) + 1e-12)
    assert nmse < 2e-4, nmse


def test_gmm_xla_matches_dense():
    rng = np.random.default_rng(1)
    e, m, k, n, ku = 4, 8, 256, 128, 2
    qt = stacked_qtensor(e, n, k, GGMLType.Q4_K, rng)
    x = rng.standard_normal((m, k)).astype(np.float32) * 0.3
    logits = rng.standard_normal((m, e)).astype(np.float32)
    topv_, topi_ = jax.lax.top_k(jnp.asarray(logits), ku)
    topv_ = jax.nn.softmax(topv_, axis=-1)
    routing = gmm_mod.route_tokens(topi_, topv_, n_expert_local=e,
                                   expert_offset=0, tile_m=8)
    y = np.asarray(gmm_mod.gmm_xla(jnp.asarray(x), qt, routing))
    ref = dense_reference(x, qt, np.asarray(topi_), np.asarray(topv_))
    nmse = np.mean((y - ref) ** 2) / (np.mean(ref ** 2) + 1e-12)
    assert nmse < 2e-4, nmse


def test_gmm_expert_parallel_shards_sum_to_full():
    """Two local shards (experts [0,2) and [2,4)) must sum to the full
    result — the psum contract of the ep path."""
    rng = np.random.default_rng(2)
    e, m, k, n, ku = 4, 8, 256, 128, 2
    qt = stacked_qtensor(e, n, k, GGMLType.Q8_0, rng)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32) * 0.3)
    logits = rng.standard_normal((m, e)).astype(np.float32)
    topv_, topi_ = jax.lax.top_k(jnp.asarray(logits), ku)
    topv_ = jax.nn.softmax(topv_, axis=-1)
    full_rt = gmm_mod.route_tokens(topi_, topv_, n_expert_local=e,
                                   expert_offset=0, tile_m=8)
    full = np.asarray(gmm_mod.gmm(x, qt, full_rt, tile_m=8, interpret=True))
    parts = []
    for off in (0, 2):
        sl = QTensor(qt.kind, qt.shape, qt.n_orig, qt.group,
                     qt.qs[off:off + 2], qt.scale[off:off + 2],
                     None, qt.lut, qt.ggml_type)
        rt = gmm_mod.route_tokens(topi_, topv_, n_expert_local=2,
                                  expert_offset=off, tile_m=8)
        parts.append(np.asarray(gmm_mod.gmm(x, sl, rt, tile_m=8,
                                            interpret=True)))
    np.testing.assert_allclose(parts[0] + parts[1], full, rtol=1e-4,
                               atol=1e-4)


def test_route_tokens_plan_invariants():
    """Every valid assignment lands in a row-tile owned by its expert; the
    combine weights of a token's rows sum to its routing weights."""
    rng = np.random.default_rng(3)
    m, e, ku, tile_m = 16, 8, 2, 8
    logits = rng.standard_normal((m, e)).astype(np.float32)
    topv_, topi_ = jax.lax.top_k(jnp.asarray(logits), ku)
    topv_ = jax.nn.softmax(topv_, axis=-1)
    rt = gmm_mod.route_tokens(topi_, topv_, n_expert_local=e,
                              expert_offset=0, tile_m=tile_m)
    tok = np.asarray(rt.tok_idx)
    wgt = np.asarray(rt.weight)
    te = np.asarray(rt.tile_expert)
    topi = np.asarray(topi_)
    topv = np.asarray(topv_)
    # per (token, expert) weight recovered exactly once
    seen = {}
    for r in range(tok.shape[0]):
        if wgt[r] == 0:
            continue
        ei = te[r // tile_m]
        seen[(int(tok[r]), int(ei))] = seen.get(
            (int(tok[r]), int(ei)), 0.0) + float(wgt[r])
    want = {}
    for i in range(m):
        for j in range(ku):
            want[(i, int(topi[i, j]))] = float(topv[i, j])
    assert set(seen) == set(want)
    for key in want:
        assert abs(seen[key] - want[key]) < 1e-6


def test_gmm_prefill_tile_matches_dense():
    """Large-M path (tile_m=64, the prefill regime) through the grouped
    kernel matches the dense reference."""
    rng = np.random.default_rng(7)
    e, m, k, n, ku = 4, 128, 256, 256, 2
    qt = stacked_qtensor(e, n, k, GGMLType.Q4_K, rng)
    x = rng.standard_normal((m, k)).astype(np.float32) * 0.3
    logits = rng.standard_normal((m, e)).astype(np.float32)
    topv_, topi_ = jax.lax.top_k(jnp.asarray(logits), ku)
    topv_ = jax.nn.softmax(topv_, axis=-1)
    rt = gmm_mod.route_tokens(topi_, topv_, n_expert_local=e,
                              expert_offset=0, tile_m=64)
    y = np.asarray(gmm_mod.gmm(jnp.asarray(x), qt, rt, tile_m=64,
                               interpret=True))
    ref = dense_reference(x, qt, np.asarray(topi_), np.asarray(topv_))
    nmse = np.mean((y - ref) ** 2) / (np.mean(ref ** 2) + 1e-12)
    assert nmse < 2e-4, nmse


def test_gmm_apply_split_matches_separate():
    """fuse_expert_qtensors + gmm_apply_split is bit-identical to two
    separate gmm_apply passes (the LLAMA_TPU_MOE_FUSE opt-in path; kept
    unfused by default — 128x slower on the current v5e Mosaic build,
    KBENCH.md)."""
    import numpy as np
    import jax.numpy as jnp
    import ml_dtypes
    from llama_cpp_test_tpu.ops import gmm as g
    from llama_cpp_test_tpu.quant.repack import (QTensor,
                                                 fuse_expert_qtensors)

    rng = np.random.default_rng(0)
    E, K, N, GROUP = 4, 256, 256, 32

    def mk():
        npk = N // 2
        qs = rng.integers(0, 256, (E, K, npk), dtype=np.uint8)
        sc = (rng.standard_normal((E, 2, K // GROUP, npk)) * 0.01) \
            .astype(ml_dtypes.bfloat16)
        return QTensor("u4", (N, K), N, GROUP, qs, sc, None, None)

    a, b = mk(), mk()
    fused = fuse_expert_qtensors([a, b])
    assert fused is not None and fused.parts is not None
    xs = jnp.asarray(rng.standard_normal((16, K)), jnp.float32)
    te = jnp.asarray([0, 1], jnp.int32)
    ga = g.gmm_apply(xs, a, te, 8, interpret=True)
    gb = g.gmm_apply(xs, b, te, 8, interpret=True)
    fa, fb = g.gmm_apply_split(xs, fused, te, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(fa))
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(fb))
