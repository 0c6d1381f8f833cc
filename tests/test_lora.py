"""LoRA adapter tests: runtime-attached adapter must match the merged model."""
import numpy as np
import pytest

from test_engine import HP, make_tiny_gguf, nmse, permute_gguf


def make_lora_gguf(path, rng, alpha=8.0, rank=4):
    """LoRA over attn_q and ffn_down of layer 0 (GGUF layout rows)."""
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.gguf.writer import GGUFWriter

    c, ff = HP["n_embd"], HP["n_ff"]
    hq, d = HP["n_head"], HP["head_dim"]
    pairs = {
        "blk.0.attn_q.weight": (rng.standard_normal((rank, c)) * 0.1,
                                rng.standard_normal((hq * d, rank)) * 0.1),
        "blk.0.ffn_down.weight": (rng.standard_normal((rank, ff)) * 0.1,
                                  rng.standard_normal((c, rank)) * 0.1),
    }
    w = GGUFWriter(path, arch="llama")
    w.add_kv("general.architecture", "llama")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", alpha)
    for base, (a, b) in pairs.items():
        w.add_tensor(base + ".lora_a", a.astype(np.float32),
                     ggml_type=GGMLType.F32)
        w.add_tensor(base + ".lora_b", b.astype(np.float32),
                     ggml_type=GGMLType.F32)
    w.write()
    return pairs, alpha, rank


def test_lora_matches_merged(tmp_path):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.gguf.reader import GGUFReader
    from llama_cpp_test_tpu.gguf.writer import GGUFWriter
    from llama_cpp_test_tpu.models.lora import attach_lora, load_lora
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    rng = np.random.default_rng(7)
    base_path = str(tmp_path / "base.gguf")
    make_tiny_gguf(base_path, qtype=GGMLType.F32)  # dense base for exactness
    lora_path = str(tmp_path / "adapter.gguf")
    pairs, alpha, rank = make_lora_gguf(lora_path, rng)

    # merged model: bake delta into the GGUF tensors directly
    merged_path = str(tmp_path / "merged.gguf")
    with GGUFReader(base_path) as r:
        w = GGUFWriter(merged_path)
        for k, v in r.metadata.items():
            w.add_kv(k, v)
        for name, info in r.tensors.items():
            dense = r.dequantize(name, np.float32)
            if name in pairs:
                a, b = pairs[name]
                dense = dense + (b @ a).reshape(dense.shape) * (alpha / rank)
            w.add_tensor(name, dense, ggml_type=GGMLType.F32)
        w.write()

    tokens = [3, 17, 42, 9]
    m_merged = Model(merged_path)
    ctx_m = Context(m_merged, n_ctx=64, n_seq_max=1, block_size=8)
    ref = ctx_m.prefill(ctx_m.new_seq(), tokens, all_logits=True)

    m_lora = Model(base_path)
    adapter = load_lora(lora_path, m_lora.hp)
    attach_lora(m_lora.weights, adapter)
    ctx_l = Context(m_lora, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx_l.prefill(ctx_l.new_seq(), tokens, all_logits=True)

    assert nmse(ref, got) < 5e-5, nmse(ref, got)

    # without the adapter, logits must differ
    m_plain = Model(base_path)
    ctx_p = Context(m_plain, n_ctx=64, n_seq_max=1, block_size=8)
    plain = ctx_p.prefill(ctx_p.new_seq(), tokens, all_logits=True)
    assert nmse(ref, plain) > 1e-5


def test_merge_lora_tool(tmp_path):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.models.lora import merge_lora
    from llama_cpp_test_tpu.runtime.engine import Model

    rng = np.random.default_rng(8)
    base_path = str(tmp_path / "base.gguf")
    make_tiny_gguf(base_path, qtype=GGMLType.F32)
    lora_path = str(tmp_path / "adapter.gguf")
    make_lora_gguf(lora_path, rng)
    out = str(tmp_path / "merged.gguf")
    n = merge_lora(base_path, lora_path, out)
    assert n == 2
    m = Model(out)  # loads and runs
    assert m.hp.n_layer == HP["n_layer"]


def test_attach_loras_stacking(tmp_path):
    """attach_loras with two adapters == sum of individual deltas."""
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.models.lora import (attach_lora, attach_loras,
                                                load_lora)
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    rng = np.random.default_rng(11)
    base_path = str(tmp_path / "base.gguf")
    make_tiny_gguf(base_path, qtype=GGMLType.F32)
    p1 = str(tmp_path / "a1.gguf")
    p2 = str(tmp_path / "a2.gguf")
    make_lora_gguf(p1, rng, alpha=8.0, rank=4)
    make_lora_gguf(p2, rng, alpha=4.0, rank=4)

    tokens = [3, 17, 42, 9]
    m = Model(base_path)
    a1 = load_lora(p1, m.hp)
    a2 = load_lora(p2, m.hp)

    # reference: manually summed dense deltas on adapter 1 scaled 0.5 + adapter 2
    import copy
    for lw in m.weights.layers:
        lw.lora = {}
    attach_loras(m.weights, [(a1, 0.5), (a2, 1.0)])
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)

    # independent single-adapter runs to compose the expected logits delta
    m_base = Model(base_path)
    ctx_b = Context(m_base, n_ctx=64, n_seq_max=1, block_size=8)
    base = ctx_b.prefill(ctx_b.new_seq(), tokens, all_logits=True)

    m1 = Model(base_path)
    attach_lora(m1.weights, a1, 0.5)
    c1 = Context(m1, n_ctx=64, n_seq_max=1, block_size=8)
    r1 = c1.prefill(c1.new_seq(), tokens, all_logits=True)

    m2 = Model(base_path)
    attach_lora(m2.weights, a2, 1.0)
    c2 = Context(m2, n_ctx=64, n_seq_max=1, block_size=8)
    r2 = c2.prefill(c2.new_seq(), tokens, all_logits=True)

    # LoRA on a single layer's attn_q/ffn_down is not additive in logits in
    # general, but with one transformer layer + small deltas it is close;
    # instead check exactly at the weight level: stacked delta == sum.
    lw = m.weights.layers[0]
    a_s, b_s, sc = lw.lora["wq"]
    delta_stacked = np.asarray(b_s, np.float32) @ np.asarray(a_s, np.float32) * sc
    d1 = np.asarray(m1.weights.layers[0].lora["wq"][1], np.float32) @ \
        np.asarray(m1.weights.layers[0].lora["wq"][0], np.float32) * \
        m1.weights.layers[0].lora["wq"][2]
    d2 = np.asarray(m2.weights.layers[0].lora["wq"][1], np.float32) @ \
        np.asarray(m2.weights.layers[0].lora["wq"][0], np.float32) * \
        m2.weights.layers[0].lora["wq"][2]
    assert nmse(delta_stacked, d1 + d2) < 1e-4


def test_full_weight_training_and_export(tmp_path):
    """FullTrainer (the full ggml-opt surface): loss decreases on a
    memorization task, and the exported GGUF reloads through the engine
    with matching behavior."""
    import numpy as np
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    model_path = str(tmp_path / "base.gguf")
    make_tiny_gguf(model_path)
    from llama_cpp_test_tpu.training.finetune import (FullTrainer,
                                                      TrainConfig,
                                                      export_full_gguf)

    model = Model(model_path)
    tr = FullTrainer(model, TrainConfig(lr=5e-3, remat=False))
    rng = np.random.default_rng(0)
    batch = rng.integers(3, 250, size=(2, 17)).astype(np.int32)
    l0 = tr.eval_loss(batch)
    losses = tr.train([batch] * 8)
    assert losses[-1] < l0 * 0.9, (l0, losses)

    out = str(tmp_path / "full.gguf")
    export_full_gguf(tr, out, dtype="F32")
    m2 = Model(out)
    ctx = Context(m2, n_ctx=64, n_seq_max=1, block_size=8)
    s = ctx.new_seq()
    lg = ctx.prefill(s, [int(t) for t in batch[0, :5]])
    assert np.isfinite(lg).all()
    # the reloaded model reproduces the trained next-token loss (within
    # export-dtype noise): re-evaluate through a FRESH trainer whose
    # params are the reloaded dense weights
    tr2 = FullTrainer(m2, TrainConfig(remat=False))
    l_reload = tr2.eval_loss(batch)
    assert abs(l_reload - losses[-1]) < 0.2, (l_reload, losses[-1])
