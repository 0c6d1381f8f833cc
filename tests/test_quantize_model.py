"""Requantization pipeline round-trip (the llama-quantize analogue)."""
import numpy as np
import pytest

from test_engine import make_tiny_gguf, nmse


def test_requantize_q4km_and_load(tmp_path):
    src = str(tmp_path / "src.gguf")
    dst = str(tmp_path / "q4km.gguf")
    make_tiny_gguf(src)

    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.gguf.reader import GGUFReader
    from llama_cpp_test_tpu.quant.quantize_model import quantize_model

    st = quantize_model(src, dst, "Q4_K_M")
    assert st.tensors > 0

    with GGUFReader(dst) as r:
        # norms stay f32; 2-d weights quantized; rules applied where divisible
        assert r.tensors["output_norm.weight"].ggml_type == GGMLType.F32
        t = r.tensors["blk.0.ffn_gate.weight"]
        # n_embd=64 rows not divisible by 256 -> fell back to F16
        assert t.ggml_type in (GGMLType.Q4_K, GGMLType.F16)
        # content is close to source
        with GGUFReader(src) as rs:
            a = rs.dequantize("blk.0.ffn_gate.weight")
            b = r.dequantize("blk.0.ffn_gate.weight")
            assert nmse(a, b) < 5e-3

    # the requantized model must load and run
    from llama_cpp_test_tpu.runtime.engine import Context, Model, generate

    m = Model(dst)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    toks = list(generate(ctx, [3, 17, 42], 4))
    assert len(toks) == 4


def test_requantize_q8_to_q4k_256(tmp_path):
    """With 256-divisible rows the K-quant rules actually fire."""
    import test_engine

    src = str(tmp_path / "src.gguf")
    dst = str(tmp_path / "q4.gguf")
    old = dict(test_engine.HP)
    test_engine.HP = dict(old, n_embd=256, n_ff=256, head_dim=64)
    try:
        test_engine.make_tiny_gguf(src)
    finally:
        test_engine.HP = old

    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.gguf.reader import GGUFReader
    from llama_cpp_test_tpu.quant.quantize_model import quantize_model

    quantize_model(src, dst, "Q4_K_M")
    with GGUFReader(dst) as r:
        assert r.tensors["blk.0.ffn_gate.weight"].ggml_type == GGMLType.Q4_K
        assert r.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q6_K
        assert r.tensors["blk.0.attn_v.weight"].ggml_type == GGMLType.Q6_K
        assert r.tensors["output.weight"].ggml_type == GGMLType.Q6_K


def test_quantize_to_iq2_xs_end_to_end(tmp_path):
    """Full pipeline: f32 GGUF -> IQ2_XS file (codebook encoder) -> engine
    loads it onto native u4lut planes and decodes."""
    import sys
    sys.path.insert(0, "tests")
    import numpy as np
    from test_engine import make_tiny_gguf

    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.quant.quantize_model import quantize_model
    from llama_cpp_test_tpu.runtime.engine import Context, Model, generate

    src = str(tmp_path / "f32.gguf")
    import test_engine
    old = dict(test_engine.HP)
    test_engine.HP = dict(old, n_embd=256, n_head=4, n_head_kv=2,
                          head_dim=64, n_ff=256)
    try:
        make_tiny_gguf(src, qtype=GGMLType.F32)
    finally:
        test_engine.HP = old
    dst = str(tmp_path / "iq2.gguf")
    quantize_model(src, dst, "IQ2_XS")
    m = Model(dst)
    kinds = {qt.kind for lw in m.weights.layers
             for qt in (lw.wqkv, lw.wq) if qt is not None}
    assert "u4lut" in kinds, kinds  # native-bitwidth planes, not int8
    ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    out = list(generate(ctx, [3, 17, 42], 6))
    assert len(out) == 6
