"""Imatrix collection + weighted quantization tests."""
import numpy as np
import pytest

from test_engine import make_tiny_gguf


def test_collect_and_weighted_quantize(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Model
    from llama_cpp_test_tpu.runtime.imatrix import IMatrixCollector

    path = str(tmp_path / "m.gguf")
    make_tiny_gguf(path)
    model = Model(path)
    coll = IMatrixCollector(model)
    rng = np.random.default_rng(0)
    coll.collect(list(rng.integers(3, 280, 96)), chunk=32)
    assert "blk.0.attn_q.weight" in coll.sums
    assert coll.sums["blk.0.attn_q.weight"].shape == (64,)  # n_embd
    assert (coll.sums["blk.0.attn_q.weight"] > 0).all()
    out = str(tmp_path / "im.npz")
    coll.save(out)
    loaded = IMatrixCollector.load(out)
    assert set(loaded) == set(coll.sums)

    # weighted quantization: error on heavily-weighted columns must drop
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.quant import codecs

    w = rng.standard_normal((64, 256)).astype(np.float32)
    imp = np.ones(256, np.float32)
    imp[:32] = 100.0  # care a lot about the first 32 columns
    plain = codecs.dequantize(codecs.quantize(w, GGMLType.Q4_K),
                              GGMLType.Q4_K).reshape(64, 256)
    weighted = codecs.dequantize(
        codecs.quantize(w, GGMLType.Q4_K, weights=imp),
        GGMLType.Q4_K).reshape(64, 256)
    err_plain = ((plain[:, :32] - w[:, :32]) ** 2).mean()
    err_weighted = ((weighted[:, :32] - w[:, :32]) ** 2).mean()
    assert err_weighted <= err_plain * 1.001


def test_quantize_model_with_imatrix(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Model
    from llama_cpp_test_tpu.runtime.imatrix import IMatrixCollector
    from llama_cpp_test_tpu.quant.quantize_model import quantize_model

    src = str(tmp_path / "m.gguf")
    make_tiny_gguf(src)
    model = Model(src)
    coll = IMatrixCollector(model)
    coll.collect(list(np.random.default_rng(1).integers(3, 280, 64)),
                 chunk=32)
    dst = str(tmp_path / "q.gguf")
    st = quantize_model(src, dst, "Q4_0", imatrix=coll.sums)
    assert st.tensors > 0
    m2 = Model(dst)  # loads fine
    assert m2.hp.n_layer == model.hp.n_layer
