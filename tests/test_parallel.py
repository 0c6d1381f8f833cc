"""Tensor/data-parallel correctness on the virtual 8-device CPU mesh:
meshed (dp=2, tp=2) engine must reproduce single-device logits."""
import numpy as np
import pytest

import jax

from test_engine import HP, make_tiny_gguf, nmse


@pytest.fixture(scope="module")
def tp_model(tmp_path_factory):
    # vocab/heads/ffn divisible by tp=2 (column sharding requirement)
    path = str(tmp_path_factory.mktemp("m") / "tiny_tp.gguf")
    import test_engine

    # n_ff: K of ffn_down must split into group-aligned (32) tp shards
    old = dict(test_engine.HP)
    test_engine.HP = dict(old, n_ff=128)
    try:
        wts = test_engine.make_tiny_gguf(path)
    finally:
        test_engine.HP = old
    return path, wts


def test_tp_matches_single_device(tp_model):
    path, wts = tp_model
    from llama_cpp_test_tpu.parallel.mesh import make_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    assert len(jax.devices()) >= 4, "conftest should give 8 cpu devices"

    hp_patch = None
    # single device reference
    m1 = Model(path)
    ctx1 = Context(m1, n_ctx=64, n_seq_max=2, block_size=8)
    s1 = ctx1.new_seq()
    ref_prefill = ctx1.prefill(s1, [3, 17, 42, 9])
    ref_decode = ctx1.decode([s1], [int(np.argmax(ref_prefill))])[0]

    mesh = make_mesh(dp=2, tp=2)
    m2 = Model(path, mesh=mesh)
    ctx2 = Context(m2, n_ctx=64, n_seq_max=2, block_size=8)
    s2 = ctx2.new_seq()
    tp_prefill = ctx2.prefill(s2, [3, 17, 42, 9])
    tp_decode = ctx2.decode([s2], [int(np.argmax(tp_prefill))])[0]

    assert tp_prefill.shape == ref_prefill.shape
    assert nmse(ref_prefill, tp_prefill) < 1e-5, nmse(ref_prefill, tp_prefill)
    assert nmse(ref_decode, tp_decode) < 1e-5, nmse(ref_decode, tp_decode)
    assert np.argmax(ref_decode) == np.argmax(tp_decode)


def test_tp_batched_decode(tp_model):
    path, wts = tp_model
    from llama_cpp_test_tpu.parallel.mesh import make_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    mesh = make_mesh(dp=2, tp=2)
    m = Model(path, mesh=mesh)
    ctx = Context(m, n_ctx=64, n_seq_max=4, block_size=8)
    sa, sb, sc = ctx.new_seq(), ctx.new_seq(), ctx.new_seq()
    la = ctx.prefill(sa, [5, 6, 7])
    lb = ctx.prefill(sb, [100, 101])
    lc = ctx.prefill(sc, [9, 9, 9, 9, 9])
    # batch of 3 -> padded to 4 for dp=2
    out = ctx.decode([sa, sb, sc], [1, 2, 3])
    assert out.shape[0] == 3
    # cross-check one row against a fresh single-seq context
    m1 = Model(path)
    ctx1 = Context(m1, n_ctx=64, n_seq_max=4, block_size=8)
    s1 = ctx1.new_seq()
    ctx1.prefill(s1, [5, 6, 7])
    single = ctx1.decode([s1], [1])[0]
    assert nmse(out[0], single) < 1e-5


# ---------------------------------------------------------------------------
# full model parallelism: dp x pp x sp x ep x tp (parallel/pp.py)


@pytest.fixture(scope="module")
def moe_model_path(tmp_path_factory):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_gguf

    path = str(tmp_path_factory.mktemp("m") / "tiny_moe.gguf")
    _tiny_gguf(path, n_expert=4, n_expert_used=2)
    return path


@pytest.mark.parametrize("axes", [
    dict(dp=1, pp=2, sp=1, ep=2, tp=2),   # pipeline + expert + tensor
    dict(dp=1, pp=2, sp=2, ep=1, tp=2),   # pipeline + sequence + tensor
    dict(dp=2, pp=2, sp=1, ep=1, tp=2),   # data + pipeline + tensor
])
def test_mp_matches_single_device(moe_model_path, axes):
    from llama_cpp_test_tpu.parallel.pp import make_mp_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = moe_model_path
    prompt = [1, 2, 3, 4, 5]
    ref = Model(path)
    rctx = Context(ref, n_ctx=128, n_seq_max=2, block_size=16)
    rs = rctx.new_seq()
    rp = rctx.prefill(rs, prompt)
    rd = rctx.decode([rs], [6])[0]

    mesh = make_mp_mesh(**axes)
    m = Model(path, mesh=mesh)
    ctx = Context(m, n_ctx=128, n_seq_max=4 * axes["dp"], block_size=16)
    seqs = [ctx.new_seq() for _ in range(axes["dp"])]
    for s in seqs:
        lp = ctx.prefill(s, prompt)
        np.testing.assert_allclose(lp, rp, atol=0.1)
        assert np.argmax(lp) == np.argmax(rp)
    out = ctx.decode(seqs, [6] * axes["dp"])
    for row in out:
        np.testing.assert_allclose(row, rd, atol=0.1)
        assert np.argmax(row) == np.argmax(rd)


def test_mp_multistep_decode(moe_model_path):
    """Several decode steps through the pipeline keep matching the
    single-device engine (KV writes land in the right stage pools)."""
    from llama_cpp_test_tpu.parallel.pp import make_mp_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = moe_model_path
    ref = Model(path)
    rctx = Context(ref, n_ctx=128, n_seq_max=2, block_size=16)
    rs = rctx.new_seq()
    mesh = make_mp_mesh(dp=1, pp=2, sp=1, ep=2, tp=2)
    m = Model(path, mesh=mesh)
    ctx = Context(m, n_ctx=128, n_seq_max=4, block_size=16)
    s = ctx.new_seq()
    rp = rctx.prefill(rs, [7, 8, 9])
    lp = ctx.prefill(s, [7, 8, 9])
    tok = int(np.argmax(rp))
    for _ in range(4):
        rd = rctx.decode([rs], [tok])[0]
        d = ctx.decode([s], [tok])[0]
        np.testing.assert_allclose(d, rd, atol=0.1)
        assert np.argmax(d) == np.argmax(rd)
        tok = int(np.argmax(rd))


def test_tp_quantized_kv_matches_single_device(tp_model):
    """q8_0 KV cache on a ('dp','tp') mesh (scales sharded alongside pools)."""
    path, wts = tp_model
    from llama_cpp_test_tpu.parallel.mesh import make_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m1 = Model(path)
    ctx1 = Context(m1, n_ctx=64, n_seq_max=2, block_size=8, kv_type="q8_0")
    s1 = ctx1.new_seq()
    ref_pf = ctx1.prefill(s1, [3, 17, 42, 9])
    ref_dec = ctx1.decode([s1], [int(np.argmax(ref_pf))])[0]

    mesh = make_mesh(dp=2, tp=2)
    m2 = Model(path, mesh=mesh)
    ctx2 = Context(m2, n_ctx=64, n_seq_max=2, block_size=8, kv_type="q8_0")
    s2 = ctx2.new_seq()
    tp_pf = ctx2.prefill(s2, [3, 17, 42, 9])
    tp_dec = ctx2.decode([s2], [int(np.argmax(tp_pf))])[0]
    assert nmse(ref_pf, tp_pf) < 1e-4, nmse(ref_pf, tp_pf)
    assert nmse(ref_dec, tp_dec) < 1e-4
    assert np.argmax(ref_dec) == np.argmax(tp_dec)


def test_tp_context_shift_matches_single_device(tp_model):
    """K-shift (context shift) on the ('dp','tp') mesh: logits after a shift
    must match the single-device shift path."""
    path, wts = tp_model
    from llama_cpp_test_tpu.parallel.mesh import make_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    prompt = list(range(3, 19))

    def run(mesh):
        m = Model(path, mesh=mesh)
        ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
        s = ctx.new_seq()
        lg = ctx.prefill(s, prompt)
        tok = int(np.argmax(lg))
        ctx.shift_context(s, n_keep=2, n_discard=6)
        out = []
        for _ in range(3):
            lg = ctx.decode([s], [tok])[0]
            tok = int(np.argmax(lg))
            out.append(tok)
        return out, lg

    ref_out, ref_lg = run(None)
    mesh = make_mesh(dp=2, tp=2)
    tp_out, tp_lg = run(mesh)
    assert ref_out == tp_out
    assert nmse(ref_lg, tp_lg) < 1e-5


def test_decode_window_on_tp_mesh(tp_model):
    """Windowed device decode on the ('dp','tp') mesh (shard_map'ed
    build_window_step) must produce the same tokens as the single-device
    window path, for a 2-sequence batch spread across dp groups."""
    path, wts = tp_model
    from llama_cpp_test_tpu.parallel.mesh import make_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams

    prompts = [[3, 17, 42, 9], [100, 101, 5]]
    sp = SamplerParams(temp=0.0)

    def run(mesh):
        m = Model(path, mesh=mesh)
        ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
        seqs = []
        toks = []
        for p in prompts:
            s = ctx.new_seq()
            lg = ctx.prefill(s, p)
            seqs.append(s)
            toks.append(int(np.argmax(lg)))
        out = ctx.decode_window(seqs, toks, [sp, sp], n_steps=4)
        return np.asarray(out)

    ref = run(None)
    got = run(make_mesh(dp=2, tp=2))
    np.testing.assert_array_equal(ref, got)


def test_speculative_on_tp_mesh(tp_model):
    """Linear speculative decoding with a mesh-sharded target (the 70B
    multi-host + speculative shape, BASELINE config #5): greedy output must
    match plain greedy on the same mesh."""
    path, wts = tp_model
    from llama_cpp_test_tpu.parallel.mesh import make_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model, generate
    from llama_cpp_test_tpu.runtime.speculative import (SpecParams,
                                                        SpeculativeDecoder)

    mesh = make_mesh(dp=2, tp=2)
    target_model = Model(path, mesh=mesh)
    draft_model = Model(path)  # draft stays single-device
    prompt = [3, 17, 42, 9]

    ctx_plain = Context(target_model, n_ctx=64, n_seq_max=2, block_size=8)
    plain = list(generate(ctx_plain, prompt, 10))

    target = Context(target_model, n_ctx=64, n_seq_max=2, block_size=8)
    draft = Context(draft_model, n_ctx=64, n_seq_max=2, block_size=8)
    dec = SpeculativeDecoder(target, draft, SpecParams(n_draft=4, p_min=0.0))
    spec = dec.generate(prompt, 10)
    assert spec[:len(plain)] == plain
    assert dec.stats.n_drafted > 0


def test_embed_and_nll_on_tp_mesh(tp_model):
    """Pooled embeddings and perplexity NLL on the ('dp','tp') mesh match
    the single-device paths."""
    path, wts = tp_model
    from llama_cpp_test_tpu.parallel.mesh import make_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    toks = [3, 17, 42, 9, 88, 7]
    m1 = Model(path)
    ctx1 = Context(m1, n_ctx=64, n_seq_max=2, block_size=8)
    ref_emb = ctx1.embed(toks)
    s1 = ctx1.new_seq()
    ref_nll = ctx1.prefill_nll(s1, toks)

    mesh = make_mesh(dp=2, tp=2)
    m2 = Model(path, mesh=mesh)
    ctx2 = Context(m2, n_ctx=64, n_seq_max=2, block_size=8)
    got_emb = ctx2.embed(toks)
    s2 = ctx2.new_seq()
    got_nll = ctx2.prefill_nll(s2, toks)
    assert nmse(ref_emb, got_emb) < 1e-5
    np.testing.assert_allclose(got_nll, ref_nll, rtol=1e-3, atol=1e-4)


def test_mp_serving_features(moe_model_path):
    """Round-4 pipeline-mesh lifts: windowed device decode, batched
    all-logits verification (prefill_batch), context shift (K-shift),
    pooled embeddings and NLL all run on the dp x pp x sp x ep x tp mesh
    and match the single-device engine."""
    from llama_cpp_test_tpu.parallel.pp import make_mp_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams

    path = moe_model_path
    prompt = [1, 2, 3, 4, 5]
    greedy = SamplerParams(temp=0.0)

    ref = Model(path)
    rctx = Context(ref, n_ctx=128, n_seq_max=2, block_size=16)
    rs = rctx.new_seq()
    rctx.prefill(rs, prompt)
    ref_toks = rctx.decode_window([rs], [6], [greedy], 4)[:, 0]

    mesh = make_mp_mesh(dp=1, pp=2, sp=1, ep=2, tp=2)
    m = Model(path, mesh=mesh)
    ctx = Context(m, n_ctx=128, n_seq_max=4, block_size=16)

    # windowed device decode
    s = ctx.new_seq()
    ctx.prefill(s, prompt)
    toks = ctx.decode_window([s], [6], [greedy], 4)[:, 0]
    assert list(toks) == list(ref_toks)
    assert s.tokens == rs.tokens and s.n_cached == rs.n_cached

    # batched all-logits verification (speculative target pass)
    rows = [[9, 10, 11]]
    ref_lg = rctx.prefill_batch([rs], [list(rows[0])])[0]
    lg = ctx.prefill_batch([s], [list(rows[0])])[0]
    assert lg.shape == ref_lg.shape
    assert nmse(ref_lg, lg) < 1e-3
    for j in range(len(rows[0])):
        assert np.argmax(lg[j]) == np.argmax(ref_lg[j])

    # context shift (K-shift on the stacked pools)
    rctx.shift_context(rs, 2, 3)
    ctx.shift_context(s, 2, 3)
    rd = rctx.decode([rs], [12])[0]
    d = ctx.decode([s], [12])[0]
    np.testing.assert_allclose(d, rd, atol=0.1)
    assert np.argmax(d) == np.argmax(rd)

    # embeddings + NLL
    re_ = rctx.embed([3, 1, 4, 1, 5], pooling="mean")
    e = ctx.embed([3, 1, 4, 1, 5], pooling="mean")
    assert nmse(re_, e) < 1e-3
    rs2 = rctx.new_seq()
    s2 = ctx.new_seq()
    rn = rctx.prefill_nll(rs2, [2, 7, 1, 8, 2, 8])
    n = ctx.prefill_nll(s2, [2, 7, 1, 8, 2, 8])
    np.testing.assert_allclose(n, rn, atol=0.05)


def test_mp_quantized_kv(moe_model_path):
    """q8_0 KV on the pipeline mesh: prefill/decode/context-shift logits
    stay close to the bf16-KV pipeline run (quantization noise only)."""
    from llama_cpp_test_tpu.parallel.pp import make_mp_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    mesh = make_mp_mesh(dp=1, pp=2, sp=1, ep=2, tp=2)
    m = Model(moe_model_path, mesh=mesh)
    prompt = [1, 2, 3, 4, 5]

    ref_ctx = Context(m, n_ctx=128, n_seq_max=4, block_size=16)
    rs = ref_ctx.new_seq()
    rp = ref_ctx.prefill(rs, prompt)
    rd = ref_ctx.decode([rs], [6])[0]

    ctx = Context(m, n_ctx=128, n_seq_max=4, block_size=16, kv_type="q8_0")
    s = ctx.new_seq()
    lp = ctx.prefill(s, prompt)
    d = ctx.decode([s], [6])[0]
    assert nmse(rp, lp) < 2e-3
    assert nmse(rd, d) < 2e-3
    assert np.argmax(d) == np.argmax(rd)

    # K-shift on the quantized stacked pools
    ref_ctx.shift_context(rs, 1, 2)
    ctx.shift_context(s, 1, 2)
    rd2 = ref_ctx.decode([rs], [9])[0]
    d2 = ctx.decode([s], [9])[0]
    assert nmse(rd2, d2) < 5e-3


def test_tp_self_extend_matches_single_device(tp_model):
    """Self-Extend grouped repositioning on the ('dp','tp') mesh: the
    K-rotation shift plus the pos_offset rope_delta threaded through the
    mesh prefill/decode steps must match the single-device path."""
    path, wts = tp_model
    from llama_cpp_test_tpu.parallel.mesh import make_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    prompt = list(range(3, 27))

    def run(mesh):
        m = Model(path, mesh=mesh)
        ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
        s = ctx.new_seq()
        lg = ctx.prefill(s, prompt)
        tok = int(np.argmax(lg))
        ctx.self_extend(s, n_keep=4, group=4)
        assert s.pos_offset != 0  # the offset path must actually engage
        out = []
        for _ in range(4):
            lg = ctx.decode([s], [tok])[0]
            tok = int(np.argmax(lg))
            out.append(tok)
        # prefill after self_extend exercises the prefill rope_delta path
        s2_lg = ctx.prefill(s, [5, 9, 11])
        return out, lg, s2_lg

    ref_out, ref_lg, ref_p = run(None)
    mesh = make_mesh(dp=2, tp=2)
    tp_out, tp_lg, tp_p = run(mesh)
    assert ref_out == tp_out
    assert nmse(ref_lg, tp_lg) < 1e-5
    assert nmse(ref_p, tp_p) < 1e-5
