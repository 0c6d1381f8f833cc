"""Tool-layer tests: ngram-cache lookup decoding, gguf-split/merge,
gguf-hash, eval tracing."""
import os

import numpy as np
import pytest

from test_engine import make_tiny_gguf


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path)
    return path


# -- ngram cache + lookup decoding -------------------------------------------


def test_ngram_cache_update_draft_save_load(tmp_path):
    from llama_cpp_test_tpu.runtime.ngram_cache import NGramCache, draft_tokens

    c = NGramCache(1, 3)
    seq = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4]
    c.update(seq)
    # after [.., 1, 2] the cache should draft 3 then 4 then 1 ...
    draft = draft_tokens([1, 2], 4, c)
    assert draft[:2] == [3, 4]

    p = str(tmp_path / "cache.bin")
    c.save(p)
    c2 = NGramCache.load(p)
    assert c2.data == dict(c.data)
    assert (c2.ngram_min, c2.ngram_max) == (1, 3)

    c3 = NGramCache(1, 3)
    c3.update(seq)
    c3.merge(c2)
    key = (1, 2)
    assert c3.data[key][3] == 2 * c.data[key][3]


def test_lookup_decoding_matches_greedy(model_path):
    """Lookup decoding is exact: output must equal plain greedy decode."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model, generate
    from llama_cpp_test_tpu.runtime.ngram_cache import LookupDecoder

    m = Model(model_path)
    prompt = [3, 17, 42, 9]
    n = 24
    ctx1 = Context(m, n_ctx=128, n_seq_max=2, block_size=8)
    ref = list(generate(ctx1, prompt, n))
    ctx2 = Context(m, n_ctx=128, n_seq_max=2, block_size=8)
    dec = LookupDecoder(ctx2, n_draft=6)
    got = dec.generate(prompt, n)
    assert got == ref
    # the tiny model loops quickly, so the ngram cache must land accepts
    assert dec.n_accepted > 0


# -- gguf-split / merge / hash ------------------------------------------------


def test_gguf_split_merge_roundtrip(model_path, tmp_path):
    from llama_cpp_test_tpu.cli.gguf_hash import hash_gguf
    from llama_cpp_test_tpu.cli.gguf_split import merge, split
    from llama_cpp_test_tpu.gguf.reader import open_gguf

    prefix = str(tmp_path / "shard")
    paths = split(model_path, prefix, max_tensors=5)
    assert len(paths) > 1
    assert paths[0].endswith("-00001-of-%05d.gguf" % len(paths))

    # transparent split loading through open_gguf
    r = open_gguf(paths[0])
    ro = open_gguf(model_path)
    assert set(r.tensors) == set(ro.tensors)
    name = next(iter(ro.tensors))
    assert bytes(r.tensor_bytes(name)) == bytes(ro.tensor_bytes(name))
    r.close()

    merged = str(tmp_path / "merged.gguf")
    merge(paths[0], merged)
    h0 = hash_gguf(model_path)
    h1 = hash_gguf(merged)
    assert h0 == h1  # tensor-level digests identical after the round-trip
    ro.close()


def test_split_model_loads_in_engine(model_path, tmp_path):
    from llama_cpp_test_tpu.cli.gguf_split import split
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    prefix = str(tmp_path / "em")
    paths = split(model_path, prefix, max_tensors=7)
    m = Model(paths[0])
    ctx = Context(m, n_ctx=32, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    logits = ctx.prefill(s, [3, 17, 42])
    assert np.isfinite(logits).all()

    m0 = Model(model_path)
    ctx0 = Context(m0, n_ctx=32, n_seq_max=2, block_size=8)
    s0 = ctx0.new_seq()
    ref = ctx0.prefill(s0, [3, 17, 42])
    np.testing.assert_allclose(logits, ref, atol=1e-5)


def test_gguf_hash_detects_difference(model_path, tmp_path):
    from llama_cpp_test_tpu.cli.gguf_hash import hash_gguf

    other = str(tmp_path / "other.gguf")
    import test_engine

    old = dict(test_engine.HP)
    test_engine.HP = dict(old, n_ff=128)
    try:
        make_tiny_gguf(other)
    finally:
        test_engine.HP = old
    assert hash_gguf(model_path)["<model>"] != hash_gguf(other)["<model>"]


# -- eval tracing -------------------------------------------------------------


def test_trace_eval(model_path, capsys):
    from llama_cpp_test_tpu.runtime.engine import Context, Model
    from llama_cpp_test_tpu.runtime.tracing import print_traces, trace_eval

    m = Model(model_path)
    ctx = Context(m, n_ctx=32, n_seq_max=2, block_size=8)
    traces = trace_eval(ctx, [3, 17, 42], keep_values=True)
    names = [t.name for t in traces]
    assert names[0] == "inp_embd" and names[-1] == "result_output"
    assert len(names) == m.hp.n_layer + 2
    for t in traces:
        assert np.isfinite(t.mean) and np.isfinite(t.std)
    # tracing must not disturb engine state: prefill still works after
    s = ctx.new_seq()
    assert np.isfinite(ctx.prefill(s, [3, 17, 42])).all()
    print_traces(traces)
    assert "result_output" in capsys.readouterr().out


# -- control vectors ------------------------------------------------------------


def test_control_vector_generate_and_apply(model_path, tmp_path):
    from llama_cpp_test_tpu.models.cvec import (
        attach_control_vector, detach_control_vector, generate_control_vector,
        load_control_vector)
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path)
    ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    out = str(tmp_path / "cv.gguf")
    dirs = generate_control_vector(
        ctx, ["happy day", "good stuff"], ["sad day", "bad stuff"], out)
    assert set(dirs) == {1, 2}
    for v in dirs.values():
        assert v.shape == (m.hp.n_embd,)
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)

    loaded = load_control_vector(out)
    np.testing.assert_allclose(loaded[1], dirs[1], atol=1e-7)

    s = ctx.new_seq()
    base = ctx.prefill(s, [3, 17, 42])
    ctx.free_seq(s)
    attach_control_vector(m.weights, loaded, strength=4.0)
    s = ctx.new_seq()
    steered = ctx.prefill(s, [3, 17, 42])
    ctx.free_seq(s)
    assert np.isfinite(steered).all()
    assert np.abs(steered - base).max() > 1e-3  # the bias changes logits
    detach_control_vector(m.weights)
    s = ctx.new_seq()
    back = ctx.prefill(s, [3, 17, 42])
    ctx.free_seq(s)
    np.testing.assert_allclose(back, base, atol=1e-5)
