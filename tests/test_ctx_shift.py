"""Context shift + Self-Extend (K-shift on the paged cache).

Reference behaviors: llama-cli context shift (main.cpp:583-608 —
seq_rm + seq_add(-n) + K-shift graph llama-context.cpp:719-755) and
Self-Extend grouped positions (passkey.cpp:131-137).
"""
import numpy as np
import pytest

from test_engine import make_tiny_gguf, nmse


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path)
    return path


@pytest.fixture(scope="module")
def model_path_1l(tmp_path_factory):
    """1-layer model: context shift is EXACTLY equivalent to a fresh prefill
    of the surviving tokens (layer-0 KV depends only on embeddings). For
    deeper models the shifted KV keeps values computed with the old context
    — the same approximation the reference makes (it never recomputes)."""
    import test_engine

    path = str(tmp_path_factory.mktemp("m") / "tiny_1l.gguf")
    old = dict(test_engine.HP)
    test_engine.HP = dict(old, n_layer=1)
    try:
        make_tiny_gguf(path)
    finally:
        test_engine.HP = old
    return path


def test_shift_context_matches_fresh_prefill(model_path_1l):
    """After shifting out tokens [n_keep, n_keep+n_discard), decode logits
    must match a fresh context prefilled with the surviving tokens."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path_1l)
    toks = [3, 17, 42, 9, 105, 77, 12, 54]
    n_keep, n_discard = 2, 3
    kept = toks[:n_keep] + toks[n_keep + n_discard:]

    ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    ctx.prefill(s, toks)
    ctx.shift_context(s, n_keep, n_discard)
    assert s.tokens == kept
    assert s.n_cached == len(kept)
    out = ctx.decode([s], [7])[0]

    ctx2 = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s2 = ctx2.new_seq()
    ctx2.prefill(s2, kept)
    ref = ctx2.decode([s2], [7])[0]

    assert nmse(ref, out) < 1e-4, nmse(ref, out)
    assert np.argmax(ref) == np.argmax(out)


def test_shift_context_repeated(model_path_1l):
    """Two consecutive shifts keep matching the fresh-prefill reference."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path_1l)
    toks = list(range(3, 3 + 12))
    ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    ctx.prefill(s, toks)
    ctx.shift_context(s, 1, 4)        # -> toks[:1] + toks[5:]
    ctx.shift_context(s, 2, 3)
    kept = toks[:1] + toks[5:]
    kept = kept[:2] + kept[5:]
    assert s.tokens == kept

    out = ctx.decode([s], [7])[0]
    ctx2 = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s2 = ctx2.new_seq()
    ctx2.prefill(s2, kept)
    ref = ctx2.decode([s2], [7])[0]
    assert nmse(ref, out) < 1e-4


def test_self_extend_grouped_positions(model_path):
    """Self-Extend compresses rope positions; decode stays finite and the
    next-token position continues from the compressed endpoint."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path)
    ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    ctx.prefill(s, [3, 17, 42, 9, 105, 77, 12, 54])
    ctx.self_extend(s, n_keep=2, group=2)
    # positions beyond n_keep become 2,2,3,3,4,4 -> last is 4, next is 5
    assert s.pos_offset == 5 - 8
    out = ctx.decode([s], [7])[0]
    assert np.isfinite(out).all()
    # the grouped cache attends over all 8 tokens (mask is index-based)
    out2 = ctx.decode([s], [int(np.argmax(out))])[0]
    assert np.isfinite(out2).all()


def test_generate_with_context_shift(model_path):
    """generate() survives past n_ctx via context shift (main.cpp loop)."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model, generate

    m = Model(model_path)
    ctx = Context(m, n_ctx=32, n_seq_max=2, block_size=8)
    toks = list(generate(ctx, [3, 17, 42], 48, n_keep=1))
    assert len(toks) == 48


def test_scheduler_context_shift(model_path):
    """A generating slot that fills the context keeps going (server
    update_slots context-shift branch)."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest, Scheduler
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams

    m = Model(model_path)
    ctx = Context(m, n_ctx=32, n_seq_max=2, block_size=8)
    sched = Scheduler(ctx, n_slots=1, chunk_size=16)
    req = sched.submit(GenRequest(
        prompt_tokens=[3, 17, 42], max_tokens=48, ignore_eos=True,
        sampling=SamplerParams(temp=0.0)))
    sched.run()
    assert req.finish_reason == "length"
    assert len(req.output_tokens) == 48


def test_compact_reuse_matches_fresh_prefill(model_path_1l):
    """Chunked prompt-cache reuse (Context.compact_reuse, the n_cache_reuse
    analogue): keeping the LCP plus a shifted interior chunk must yield the
    same decode logits as a fresh prefill of the new prompt (1-layer model:
    shifted KV is exactly a function of embeddings + positions)."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path_1l)
    old_prompt = [3, 17, 42, 9, 105, 77, 12, 54, 33, 21]
    # new prompt: same 4-token head, drops [105, 77], keeps [12, 54, 33]
    # as an interior chunk at shifted positions, new tail
    new_prompt = [3, 17, 42, 9, 12, 54, 33, 66, 8]

    ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    ctx.prefill(s, old_prompt)
    kept = ctx.compact_reuse(s, new_prompt, n_reuse_min=2,
                             max_keep=len(new_prompt) - 1)
    assert kept == 7  # lcp 4 (+1 matching token 9? no: 9 matches -> lcp 4)
    assert s.tokens == new_prompt[:kept]
    lg = ctx.prefill(s, new_prompt[kept:])

    ctx2 = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s2 = ctx2.new_seq()
    ref = ctx2.prefill(s2, new_prompt)
    assert nmse(ref, lg) < 1e-5, nmse(ref, lg)


def test_compact_reuse_no_match_returns_lcp(model_path_1l):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path_1l)
    ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    ctx.prefill(s, [3, 17, 42, 9])
    # nothing beyond the 2-token LCP matches in chunks >= 4
    kept = ctx.compact_reuse(s, [3, 17, 99, 98, 97], n_reuse_min=4,
                             max_keep=4)
    assert kept == 2
    assert s.n_cached == 2 and s.tokens == [3, 17]


def test_shift_context_exact_with_attn_factor(model_path_1l):
    """K-shift must re-base EXACTLY when rope mscale != 1 (phi3-longrope /
    yarn attn_factor): the delta rotation is unscaled because stored K
    already carries mscale. (The reference re-applies attn_factor in
    build_rope_shift, llama-context.cpp:484-493 — a drift this engine's
    shift-exactness contract rejects.)"""
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path_1l,
              kv_overrides={"*.rope.scaling.attn_factor": 1.25})
    assert m.hp.rope_attn_factor == 1.25
    assert m.weights.rope_mscale == 1.25
    toks = [3, 17, 42, 9, 105, 77, 12, 54]
    n_keep, n_discard = 2, 3
    kept = toks[:n_keep] + toks[n_keep + n_discard:]

    ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    ctx.prefill(s, toks)
    ctx.shift_context(s, n_keep, n_discard)
    out = ctx.decode([s], [7])[0]

    ctx2 = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s2 = ctx2.new_seq()
    ctx2.prefill(s2, kept)
    ref = ctx2.decode([s2], [7])[0]

    assert nmse(ref, out) < 1e-4, nmse(ref, out)
    assert np.argmax(ref) == np.argmax(out)
