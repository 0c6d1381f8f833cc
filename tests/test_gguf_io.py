"""GGUF container tests (mirrors reference tests/test-gguf.cpp scope):
round-trip writer->reader, real-file parsing vs the reference's vocab GGUFs,
corrupt-file rejection.
"""
import os

import numpy as np
import pytest

from llama_cpp_test_tpu.gguf.constants import GGMLType
from llama_cpp_test_tpu.gguf.reader import GGUFReader
from llama_cpp_test_tpu.gguf.writer import GGUFWriter

from conftest import REFERENCE_DIR, requires_reference

VOCAB_GGUF = os.path.join(REFERENCE_DIR, "models", "ggml-vocab-llama-spm.gguf")


def test_round_trip(tmp_path):
    path = str(tmp_path / "t.gguf")
    w = GGUFWriter(path, arch="llama")
    w.add_kv("llama.block_count", 2)
    w.add_kv("llama.embedding_length", 64)
    w.add_kv("general.name", "tiny test")
    w.add_kv("test.float", 1.5)
    w.add_kv("test.bool", True)
    w.add_kv("test.neg", -3)
    w.add_kv("test.strings", ["a", "bb", "ccc"])
    w.add_kv("test.ints", np.arange(5, dtype=np.int32))
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 64), dtype=np.float32)
    b = rng.standard_normal((4, 256), dtype=np.float32)
    w.add_tensor("tensor.f32", a)
    w.add_tensor("tensor.q4k", b, ggml_type=GGMLType.Q4_K)
    w.add_tensor("tensor.f16", a, ggml_type=GGMLType.F16)
    w.write()

    with GGUFReader(path) as r:
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["llama.block_count"] == 2
        assert r.metadata["test.float"] == 1.5
        assert r.metadata["test.bool"] is True
        assert r.metadata["test.neg"] == -3
        assert r.metadata["test.strings"] == ["a", "bb", "ccc"]
        np.testing.assert_array_equal(r.metadata["test.ints"], np.arange(5))
        assert r.tensors["tensor.f32"].shape == (64, 8)  # ggml order
        np.testing.assert_array_equal(r.dequantize("tensor.f32"), a)
        np.testing.assert_array_equal(r.dequantize("tensor.f16"), a.astype(np.float16))
        dq = r.dequantize("tensor.q4k")
        assert dq.shape == (4, 256)
        rmse = np.sqrt(((dq - b) ** 2).mean())
        assert rmse < 0.12  # ~4.5 bpw on N(0,1) data; official gates in test_quant_codecs


@requires_reference
def test_read_reference_vocab_gguf():
    if not os.path.exists(VOCAB_GGUF):
        pytest.skip("vocab fixture missing")
    with GGUFReader(VOCAB_GGUF) as r:
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["tokenizer.ggml.model"] == "llama"
        toks = r.metadata["tokenizer.ggml.tokens"]
        assert len(toks) == 32000
        assert toks[1] == "<s>"
        scores = r.metadata["tokenizer.ggml.scores"]
        assert len(scores) == 32000


@requires_reference
def test_our_writer_readable_by_oracle(tmp_path):
    import importlib

    from oracle import load

    load()
    gr_mod = importlib.import_module("gguf.gguf_reader")
    path = str(tmp_path / "x.gguf")
    w = GGUFWriter(path, arch="llama")
    w.add_kv("general.name", "oracle check")
    w.add_kv("llama.block_count", 3)
    a = np.random.default_rng(1).standard_normal((8, 32), dtype=np.float32)
    w.add_tensor("tok_embd.weight", a, ggml_type=GGMLType.Q8_0)
    w.write()
    rd = gr_mod.GGUFReader(path)
    fields = {f.name: f for f in rd.fields.values()}
    assert "general.name" in fields
    t = rd.tensors[0]
    assert t.name == "tok_embd.weight"
    assert tuple(int(d) for d in t.shape) == (32, 8)


def test_corrupt_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        GGUFReader(str(p))


def test_truncated(tmp_path):
    p = tmp_path / "trunc.gguf"
    p.write_bytes(b"GGUF" + b"\x03\x00\x00\x00" + b"\x01")
    with pytest.raises(Exception):
        GGUFReader(str(p))
