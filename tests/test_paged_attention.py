"""Paged decode attention kernel conformance: Pallas (interpret on CPU) vs
XLA gather reference (the test-backend-ops comparison pattern)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_cpp_test_tpu.ops import paged_attention as pa


def make_case(b=3, kv=2, g=4, d=64, nb=16, bs=16, nbmax=4, seed=0):
    rng = np.random.default_rng(seed)
    h = kv * g
    q = rng.standard_normal((b, h, d)).astype(np.float32) * 0.3
    k_pages = rng.standard_normal((kv, nb, bs, d)).astype(np.float32) * 0.3
    v_pages = rng.standard_normal((kv, nb, bs, d)).astype(np.float32) * 0.3
    # each sequence gets nbmax distinct pages and a length within them
    pages = np.stack([rng.permutation(nb)[:nbmax] for _ in range(b)]).astype(
        np.int32)
    lengths = rng.integers(1, nbmax * bs + 1, size=b).astype(np.int32)
    return (jnp.asarray(q, jnp.bfloat16),
            jnp.asarray(k_pages, jnp.bfloat16),
            jnp.asarray(v_pages, jnp.bfloat16),
            jnp.asarray(lengths), jnp.asarray(pages))


def nmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(((a - b) ** 2).mean() / ((a * a).mean() + 1e-12))


def _pallas_interpret(q, k, v, lengths, pages, soft_cap=None):
    return pa.paged_attention_decode(q, k, v, lengths, pages,
                                     soft_cap=soft_cap, interpret=True)


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_xla_reference(seed):
    q, k, v, lengths, pages = make_case(seed=seed)
    ref = pa.paged_attention_decode_xla(q, k, v, lengths, pages)
    out = _pallas_interpret(q, k, v, lengths, pages)
    assert out.shape == ref.shape
    assert nmse(ref, out) < 2e-4, nmse(ref, out)


def test_kernel_single_group_gqa_1():
    # llama2-7B shape: H == KV (G = 1)
    q, k, v, lengths, pages = make_case(b=2, kv=4, g=1, d=64, seed=2)
    ref = pa.paged_attention_decode_xla(q, k, v, lengths, pages)
    out = _pallas_interpret(q, k, v, lengths, pages)
    assert nmse(ref, out) < 2e-4


def test_kernel_short_lengths():
    q, k, v, lengths, pages = make_case(seed=3)
    lengths = jnp.asarray([1, 2, 5], jnp.int32)
    ref = pa.paged_attention_decode_xla(q, k, v, lengths, pages)
    out = _pallas_interpret(q, k, v, lengths, pages)
    assert nmse(ref, out) < 2e-4


def test_soft_cap():
    q, k, v, lengths, pages = make_case(seed=4)
    ref = pa.paged_attention_decode_xla(q, k, v, lengths, pages,
                                        soft_cap=30.0)
    out = _pallas_interpret(q, k, v, lengths, pages, soft_cap=30.0)
    assert nmse(ref, out) < 2e-4


@pytest.mark.parametrize("p", [1, 3, 8])
def test_multi_page_steps(p):
    # nbmax=12: p=8 pads the page axis to 16 (pad pages masked by length)
    q, k, v, lengths, pages = make_case(b=2, nb=32, nbmax=12, seed=5)
    ref = pa.paged_attention_decode_xla(q, k, v, lengths, pages)
    out = pa.paged_attention_decode(q, k, v, lengths, pages,
                                    interpret=True, pages_per_step=p)
    assert nmse(ref, out) < 2e-4, nmse(ref, out)


def test_multi_page_full_lengths():
    # exact multiple-of-page-chunk lengths exercise the last-chunk guard
    q, k, v, lengths, pages = make_case(b=2, nb=32, nbmax=8, seed=6)
    lengths = jnp.asarray([8 * 16, 4 * 16], jnp.int32)
    ref = pa.paged_attention_decode_xla(q, k, v, lengths, pages)
    out = pa.paged_attention_decode(q, k, v, lengths, pages,
                                    interpret=True, pages_per_step=4)
    assert nmse(ref, out) < 2e-4
