"""Chunked flash prefill conformance: Pallas kernel (interpret mode) vs the
XLA full-gather reference, incl. chunked prefill with a cached prefix, SWA
windows, and softcap (matching reference llama-graph.cpp:1160-1240
build_attn_mha semantics)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_cpp_test_tpu.ops.flash_prefill import flash_prefill
from llama_cpp_test_tpu.runtime import kv_cache


def make_case(seed=0, b=2, t=16, h=8, kv=2, d=64, nb=12, bs=8, lens=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32) * 0.3
    k_pool = jnp.asarray(rng.standard_normal((kv, nb, bs, d)), jnp.bfloat16)
    v_pool = jnp.asarray(rng.standard_normal((kv, nb, bs, d)), jnp.bfloat16)
    nbmax = 6
    bt = jnp.asarray(rng.permutation(nb)[: b * nbmax].reshape(b, nbmax)
                     .astype(np.int32))
    if lens is None:
        lens = [t, t - 3]
    kv_len = jnp.asarray(np.asarray(lens[:b]), jnp.int32)
    pos = jnp.stack([jnp.arange(l - t, l, dtype=jnp.int32)
                     for l in lens[:b]])
    pos = jnp.maximum(pos, 0)
    return q, k_pool, v_pool, pos, kv_len, bt


def nmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(((a - b) ** 2).mean() / ((a * a).mean() + 1e-12))


@pytest.mark.parametrize("window,cap", [(0, 0.0), (5, 0.0), (0, 30.0),
                                        (7, 50.0)])
def test_flash_matches_gather(window, cap):
    q, kp, vp, pos, kl, bt = make_case()
    scale = 0.125
    ref = kv_cache.attend_prefill_xla(
        q.astype(jnp.bfloat16), kp, vp, bt, pos, kl, scale, window, cap)
    got = flash_prefill((q * scale).astype(jnp.bfloat16), kp, vp, pos, kl,
                        bt, window=window, soft_cap=cap, interpret=True)
    assert got.shape == ref.shape
    assert nmse(ref, got) < 2e-4, nmse(ref, got)


def test_flash_chunked_prefix():
    """Second chunk of a longer sequence: positions offset past a cached
    prefix, kv_len > chunk length."""
    q, kp, vp, _, _, bt = make_case(seed=3, b=2, t=8)
    pos = jnp.asarray([[24, 25, 26, 27, 28, 29, 30, 31],
                       [10, 11, 12, 13, 14, 15, 16, 17]], jnp.int32)
    kl = jnp.asarray([32, 18], jnp.int32)
    scale = 0.2
    ref = kv_cache.attend_prefill_xla(q.astype(jnp.bfloat16), kp, vp, bt,
                                      pos, kl, scale)
    got = flash_prefill((q * scale).astype(jnp.bfloat16), kp, vp, pos, kl,
                        bt, interpret=True)
    assert nmse(ref, got) < 2e-4


def test_flash_large_t_tiles():
    """T > tile (128): multiple q tiles per sequence."""
    q, kp, vp, pos, kl, bt = make_case(seed=5, b=1, t=256, nb=40, bs=8,
                                       lens=[256])
    # widen the table for 256 tokens of cache
    rng = np.random.default_rng(7)
    bt = jnp.asarray(rng.permutation(40)[:32].reshape(1, 32).astype(np.int32))
    scale = 0.125
    ref = kv_cache.attend_prefill_xla(q.astype(jnp.bfloat16), kp, vp, bt,
                                      pos, kl, scale)
    got = flash_prefill((q * scale).astype(jnp.bfloat16), kp, vp, pos, kl,
                        bt, interpret=True)
    assert nmse(ref, got) < 2e-4
