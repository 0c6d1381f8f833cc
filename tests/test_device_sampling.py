"""Device-side sampling + windowed scheduler decode.

Conformance: the jitted common chain (runtime/device_sampling.py) against
the host SamplerChain semantics (runtime/sampling.py), and the scheduler's
windowed decode path against the per-token path token-for-token under
greedy sampling.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_cpp_test_tpu.runtime import device_sampling as ds
from llama_cpp_test_tpu.runtime.sampling import SamplerParams


def params_rows(rows, pad_to=None):
    return ds.DeviceSamplerParams.from_rows(rows, pad_to or len(rows))


def empty_hist(b):
    return jnp.full((b, ds.HIST_LEN), -1, jnp.int32)


def test_greedy_matches_argmax():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 100)), jnp.float32)
    p = params_rows([SamplerParams(temp=0.0, top_k=1)] * 4)
    toks = ds.sample_tokens(logits, p, empty_hist(4), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.argmax(np.asarray(logits), -1))


def test_topk_restricts_support():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((2, 500)) * 3, jnp.float32)
    p = params_rows([SamplerParams(temp=1.5, top_k=5, top_p=1.0, min_p=0.0)] * 2)
    top5 = np.argsort(-np.asarray(logits), -1)[:, :5]
    for seed in range(20):
        toks = np.asarray(ds.sample_tokens(
            logits, p, empty_hist(2), jax.random.PRNGKey(seed)))
        for b in range(2):
            assert toks[b] in top5[b]


def test_top_p_keeps_nucleus():
    # one dominant token (p ~ .9996) with top_p=.9 -> nucleus is just it
    logits = np.zeros((1, 50), np.float32)
    logits[0, 7] = 12.0
    p = params_rows([SamplerParams(temp=1.0, top_k=40, top_p=0.9,
                                   min_p=0.0)])
    for seed in range(10):
        tok = int(ds.sample_tokens(jnp.asarray(logits), p, empty_hist(1),
                                   jax.random.PRNGKey(seed))[0])
        assert tok == 7


def test_min_p_filters_tail():
    logits = np.zeros((1, 10), np.float32)
    logits[0, 0] = 4.0
    logits[0, 1] = 3.9  # within min_p of max
    # rest ~ e^-4 of max -> filtered at min_p=0.5
    p = params_rows([SamplerParams(temp=2.0, top_k=10, top_p=1.0, min_p=0.5)])
    seen = set()
    for seed in range(30):
        seen.add(int(ds.sample_tokens(jnp.asarray(logits), p, empty_hist(1),
                                      jax.random.PRNGKey(seed))[0]))
    assert seen <= {0, 1}
    assert len(seen) == 2  # both survive and both get sampled at temp 2


def test_penalties_match_host_sampler():
    """Device penalties == host Penalties sampler on the same history."""
    from llama_cpp_test_tpu.runtime.sampling import Penalties, SampleState

    rng = np.random.default_rng(3)
    logits = rng.standard_normal(64).astype(np.float32)
    hist_toks = [3, 3, 3, 9, 12, 12]
    pen = Penalties(n_last=64, repeat=1.3, freq=0.2, present=0.4)
    for t in hist_toks:
        pen.accept(t)
    st = SampleState.from_logits(logits.copy())
    pen.apply(st)
    host = np.full(64, -np.inf, np.float32)
    host[st.ids] = st.logits

    p = params_rows([SamplerParams(penalty_last_n=64, penalty_repeat=1.3,
                                   penalty_freq=0.2, penalty_present=0.4)])
    hist = jnp.asarray(ds.make_history([hist_toks], 1))
    pos = jnp.arange(ds.HIST_LEN)[None, :]
    hv = pos >= (ds.HIST_LEN - p.penalty_last_n[:, None])
    dev = np.asarray(ds.apply_penalties(
        jnp.asarray(logits[None]), hist, hv, p))[0]
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


def test_eligibility():
    assert ds.eligible(SamplerParams())
    assert not ds.eligible(SamplerParams(mirostat=2))
    assert not ds.eligible(SamplerParams(grammar="root ::= [a]"))
    assert not ds.eligible(SamplerParams(typ_p=0.9))
    assert not ds.eligible(SamplerParams(dry_multiplier=0.5))
    assert not ds.eligible(SamplerParams(top_k=0))
    assert not ds.eligible(SamplerParams(logit_bias={3: 1.0}))


def test_determinism_same_seed():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((3, 200)), jnp.float32)
    p = params_rows([SamplerParams(temp=0.9)] * 3)
    a = ds.sample_tokens(logits, p, empty_hist(3), jax.random.PRNGKey(11))
    b = ds.sample_tokens(logits, p, empty_hist(3), jax.random.PRNGKey(11))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# scheduler windowed path


@pytest.fixture(scope="module")
def tiny_ctx_factory(tmp_path_factory):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_engine import make_tiny_gguf
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path)
    model = Model(path)

    def make(**kw):
        kw.setdefault("n_ctx", 128)
        kw.setdefault("n_seq_max", 4)
        kw.setdefault("block_size", 8)
        return Context(model, **kw)

    return make


def _run(ctx, window, prompts, max_tokens=24, **sampling):
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest, Scheduler

    sched = Scheduler(ctx, n_slots=4, decode_window=window)
    reqs = [sched.submit(GenRequest(
        prompt_tokens=p, max_tokens=max_tokens,
        sampling=SamplerParams(temp=0.0, **sampling))) for p in prompts]
    sched.run()
    return [r.output_tokens for r in reqs], [r.finish_reason for r in reqs]


def test_windowed_greedy_matches_per_token(tiny_ctx_factory):
    prompts = [[3, 17, 42, 5], [9, 9, 2], [1, 2, 3, 4, 5, 6, 7]]
    out1, fin1 = _run(tiny_ctx_factory(), 1, prompts)
    outw, finw = _run(tiny_ctx_factory(), 8, prompts)
    assert out1 == outw
    assert fin1 == finw


def test_windowed_respects_max_tokens(tiny_ctx_factory):
    outs, fins = _run(tiny_ctx_factory(), 8, [[3, 17]], max_tokens=5)
    assert len(outs[0]) <= 5
    assert fins[0] in ("stop", "length")


def test_windowed_rollback_frees_blocks(tiny_ctx_factory):
    """After a mid-window stop, trailing KV blocks are reclaimed."""
    ctx = tiny_ctx_factory()
    free0 = ctx.mgr.num_free()
    _run(ctx, 8, [[3, 17, 42]], max_tokens=3)
    # slot keeps its cache for prefix reuse; only in-flight blocks beyond
    # the accepted tokens must be gone: 3 prompt + 3 gen + 1 = 7 tokens
    used = free0 - ctx.mgr.num_free()
    assert used <= (7 + ctx.block_size - 1) // ctx.block_size


def test_candidate_union_fast_path_matches_full_vocab():
    """The large-vocab fast path (top-k union history, no full-vocab
    scatter) must match the full-vocab penalty chain exactly: same greedy
    picks and same sampled tokens for seeded rows with active penalties
    and repeated history tokens."""
    rng = np.random.default_rng(7)
    v = 2048  # > K_MAX + HIST_LEN -> fast path
    b = 4
    logits = jnp.asarray(rng.standard_normal((b, v)) * 2, jnp.float32)
    hist_rows = [[5, 9, 5, 5, 17, int(np.argmax(np.asarray(logits)[i]))]
                 for i in range(b)]
    hist = jnp.asarray(ds.make_history(hist_rows, b))
    rows = [SamplerParams(temp=0.0, top_k=1, penalty_last_n=64,
                          penalty_repeat=1.8, penalty_freq=0.1,
                          penalty_present=0.2) for _ in range(b)]
    p = params_rows(rows)
    toks = ds.sample_tokens(logits, p, hist, jax.random.PRNGKey(0))

    # reference: full-vocab penalties then argmax
    ring = jnp.arange(ds.HIST_LEN)[None, :]
    hv = ring >= (ds.HIST_LEN - p.penalty_last_n[:, None])
    ref_logits = ds.apply_penalties(logits, hist, hv, p)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.argmax(np.asarray(ref_logits), -1))

    # sampled (temp > 0): distributions must match across many seeds
    rows = [SamplerParams(temp=1.0, top_k=40, seed=3, penalty_last_n=64,
                          penalty_repeat=1.5) for _ in range(b)]
    p2 = params_rows(rows)
    pos = jnp.arange(b, dtype=jnp.int32)
    t_fast = np.asarray(ds.sample_tokens(logits, p2, hist,
                                         jax.random.PRNGKey(1), pos))
    # small-vocab (exact) branch on the same data: slice ids down by
    # running through apply_penalties + top_k manually mirrors the branch
    ref_l = ds.apply_penalties(logits, hist, hv, p2)
    vals, ids = jax.lax.top_k(ref_l, min(ds.K_MAX, v))
    # the fast path must pick tokens from the same top-40 support
    top40 = np.asarray(ids[:, :40])
    for i in range(b):
        assert t_fast[i] in top40[i]
