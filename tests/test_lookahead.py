"""Lookahead (Jacobi) decoding: lossless vs plain greedy, and it actually
accepts guesses on repetitive continuations."""
import numpy as np

from test_engine import make_tiny_gguf


def test_lookahead_matches_greedy(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context, Model, generate
    from llama_cpp_test_tpu.runtime.lookahead import (LookaheadDecoder,
                                                      LookaheadParams)

    path = str(tmp_path / "m.gguf")
    make_tiny_gguf(path)
    model = Model(path)
    prompt = [3, 17, 42, 9, 3, 17, 42, 9]

    ctx_ref = Context(model, n_ctx=128, n_seq_max=1)
    ref = list(generate(ctx_ref, prompt, 24))

    ctx_la = Context(model, n_ctx=128, n_seq_max=1)
    dec = LookaheadDecoder(ctx_la, LookaheadParams(w=4, n=3, g=4))
    got = dec.generate(prompt, 24)

    assert got == ref, (got, ref)
    # every forward pass yields at least the bonus token
    assert dec.stats.n_generated >= dec.stats.n_forward
    assert dec.stats.n_forward >= 1


def test_lookahead_accepts_on_loops(tmp_path):
    """Tiny random models tend to fall into short cycles; the Jacobi window
    + n-gram pool must then accept >0 guessed tokens."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model
    from llama_cpp_test_tpu.runtime.lookahead import (LookaheadDecoder,
                                                      LookaheadParams)

    path = str(tmp_path / "m.gguf")
    make_tiny_gguf(path)
    model = Model(path)
    ctx = Context(model, n_ctx=256, n_seq_max=1)
    dec = LookaheadDecoder(ctx, LookaheadParams(w=6, n=4, g=8))
    out = dec.generate([5, 11], 96)
    assert len(out) == 96
    # cycles dominate a 96-token greedy rollout of a random tiny model, so
    # the pool should land plenty of accepts (fewer passes than tokens)
    assert dec.stats.n_forward < dec.stats.n_generated, dec.stats
