"""Sequence state save/restore round-trip (save-load-state example analogue):
continuation after restore must match continuation without save/restore."""
import numpy as np
import pytest

from test_engine import make_tiny_gguf, nmse


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path)
    from llama_cpp_test_tpu.runtime.engine import Model

    return Model(path)


def test_seq_state_round_trip(model, tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.state import load_seq_state, save_seq_state

    prompt = [3, 17, 42, 9, 150]
    # reference: prefill + 3 decodes, no save/load
    ctx1 = Context(model, n_ctx=64, n_seq_max=2, block_size=8)
    s1 = ctx1.new_seq()
    logits = ctx1.prefill(s1, prompt)
    ref = []
    t = int(np.argmax(logits))
    for _ in range(3):
        lg = ctx1.decode([s1], [t])[0]
        ref.append(lg)
        t = int(np.argmax(lg))

    # save after prefill, restore into a FRESH context, continue
    ctx2 = Context(model, n_ctx=64, n_seq_max=2, block_size=8)
    s2 = ctx2.new_seq()
    logits2 = ctx2.prefill(s2, prompt)
    path = str(tmp_path / "seq.npz")
    save_seq_state(ctx2, s2, path)

    ctx3 = Context(model, n_ctx=64, n_seq_max=2, block_size=8)
    s3 = load_seq_state(ctx3, path)
    assert s3.tokens == prompt
    assert s3.n_cached == len(prompt)
    t = int(np.argmax(logits2))
    for i in range(3):
        lg = ctx3.decode([s3], [t])[0]
        assert nmse(ref[i], lg) < 1e-5, (i, nmse(ref[i], lg))
        t = int(np.argmax(lg))


def test_bad_magic_rejected(model, tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.state import load_seq_state

    path = str(tmp_path / "bogus.npz")
    np.savez(path, meta='{"magic": "nope"}')
    ctx = Context(model, n_ctx=64, n_seq_max=1, block_size=8)
    with pytest.raises(ValueError):
        load_seq_state(ctx, path)


def test_full_context_state_round_trip(model, tmp_path):
    """Full-context blob (GGSN analogue): every live sequence restores with
    its id and cache; continuations match the unsaved run."""
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.state import load_state, save_state

    prompts = [[3, 17, 42, 9], [100, 101, 102]]
    ctx1 = Context(model, n_ctx=64, n_seq_max=4, block_size=8)
    seqs = []
    nexts = []
    for p in prompts:
        s = ctx1.new_seq()
        lg = ctx1.prefill(s, p)
        seqs.append(s)
        nexts.append(int(np.argmax(lg)))
    ref = [ctx1.decode(seqs, nexts)]
    for _ in range(2):
        toks = [int(np.argmax(r)) for r in ref[-1]]
        ref.append(ctx1.decode(seqs, toks))

    ctx2 = Context(model, n_ctx=64, n_seq_max=4, block_size=8)
    seqs2 = []
    for p in prompts:
        s = ctx2.new_seq()
        ctx2.prefill(s, p)
        seqs2.append(s)
    path = str(tmp_path / "ctx.npz")
    save_state(ctx2, path)

    ctx3 = Context(model, n_ctx=64, n_seq_max=4, block_size=8)
    restored = load_state(ctx3, path)
    assert [s.seq_id for s in restored] == [s.seq_id for s in seqs2]
    assert [s.tokens for s in restored] == prompts
    out = [ctx3.decode(restored, nexts)]
    for _ in range(2):
        toks = [int(np.argmax(r)) for r in out[-1]]
        out.append(ctx3.decode(restored, toks))
    for r, o in zip(ref, out):
        assert nmse(r, o) < 1e-5

    # refuse restore into a non-empty context
    ctx4 = Context(model, n_ctx=64, n_seq_max=4, block_size=8)
    ctx4.new_seq()
    with pytest.raises(ValueError):
        load_state(ctx4, path)
