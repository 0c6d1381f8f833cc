"""Speculative decoding correctness: output must be IDENTICAL to plain
greedy decoding of the target model, regardless of draft quality
(greedy acceptance is exact)."""
import numpy as np
import pytest

from test_engine import make_tiny_gguf


@pytest.fixture(scope="module")
def two_models(tmp_path_factory):
    d = tmp_path_factory.mktemp("m")
    target = str(d / "target.gguf")
    draft = str(d / "draft.gguf")
    make_tiny_gguf(target, seed=0)
    make_tiny_gguf(draft, seed=1)  # different weights -> imperfect draft
    from llama_cpp_test_tpu.runtime.engine import Model

    return Model(target), Model(draft)


def greedy_reference(model, prompt, n):
    from llama_cpp_test_tpu.runtime.engine import Context, generate

    ctx = Context(model, n_ctx=128, n_seq_max=1, block_size=8)
    return list(generate(ctx, prompt, n))


@pytest.mark.parametrize("n_draft", [1, 4, 8])
def test_speculative_exactness_imperfect_draft(two_models, n_draft):
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.speculative import (SpecParams,
                                                        SpeculativeDecoder)

    target, draft = two_models
    prompt = [3, 17, 42, 9]
    ref = greedy_reference(target, prompt, 16)

    spec = SpeculativeDecoder(
        Context(target, n_ctx=128, n_seq_max=1, block_size=8),
        Context(draft, n_ctx=128, n_seq_max=1, block_size=8),
        SpecParams(n_draft=n_draft, p_min=0.0),
    )
    out = spec.generate(prompt, 16)
    assert out == ref, (out, ref, spec.stats)


def test_speculative_perfect_draft_accepts(two_models):
    """Draft == target: acceptance should be ~100% and target calls far
    fewer than tokens generated."""
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.speculative import (SpecParams,
                                                        SpeculativeDecoder)

    target, _ = two_models
    prompt = [3, 17, 42, 9]
    ref = greedy_reference(target, prompt, 24)
    spec = SpeculativeDecoder(
        Context(target, n_ctx=128, n_seq_max=1, block_size=8),
        Context(target, n_ctx=128, n_seq_max=1, block_size=8),
        SpecParams(n_draft=6, p_min=0.0),
    )
    out = spec.generate(prompt, 24)
    assert out == ref
    assert spec.stats.accept_rate > 0.95, spec.stats
    assert spec.stats.n_target_calls < len(out), spec.stats


def test_tree_speculative_matches_greedy(tmp_path):
    """Tree speculation (n_seq_dft branches) is lossless vs plain greedy."""
    import numpy as np

    from llama_cpp_test_tpu.runtime.engine import Context, Model, generate
    from llama_cpp_test_tpu.runtime.speculative import (TreeSpecParams,
                                                        TreeSpeculativeDecoder)

    path = str(tmp_path / "m.gguf")
    make_tiny_gguf(path)
    model = Model(path)
    prompt = [3, 17, 42, 9]

    ctx_ref = Context(model, n_ctx=128, n_seq_max=1)
    ref = list(generate(ctx_ref, prompt, 20))

    # self-speculation (draft == target) guarantees full acceptance
    tgt = Context(model, n_ctx=128, n_seq_max=1)
    drf = Context(model, n_ctx=128, n_seq_max=8)
    dec = TreeSpeculativeDecoder(tgt, drf, TreeSpecParams(
        n_draft=4, n_seq_dft=3, p_split=0.05))
    got = dec.generate(prompt, 20)
    assert got == ref, (got, ref)
    assert dec.stats.n_accepted > 0
    # n_drafted counts every branch; only one branch per round can win, so
    # with up to 3 live branches the per-token rate sits near 1/n_seq_dft
    assert dec.stats.accept_rate > 0.2
    # the winning branches still make speculation worthwhile: more tokens
    # out than verification rounds
    assert dec.stats.n_accepted >= 10
