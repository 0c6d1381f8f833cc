"""Tokenizer golden tests against the reference's fixtures
(models/ggml-vocab-*.gguf + .inp/.out pairs — the test-tokenizer-0 corpus).
"""
import os

import pytest

from llama_cpp_test_tpu.gguf.reader import GGUFReader
from llama_cpp_test_tpu.tokenizer import load_tokenizer

from conftest import REFERENCE_DIR, requires_reference

MODELS = os.path.join(REFERENCE_DIR, "models")


def load_cases(name):
    inp = os.path.join(MODELS, f"ggml-vocab-{name}.gguf.inp")
    out = os.path.join(MODELS, f"ggml-vocab-{name}.gguf.out")
    with open(inp, encoding="utf-8") as f:
        texts = f.read().split("\n__ggml_vocab_test__\n")
    with open(out, encoding="utf-8") as f:
        expects = f.read().splitlines()
    # trailing separator leaves an empty tail
    if texts and texts[-1].strip() == "":
        texts = texts[:-1]
    cases = []
    for t, e in zip(texts, expects):
        cases.append((t, [int(x) for x in e.split()]))
    return cases


def run_golden(name):
    gguf_path = os.path.join(MODELS, f"ggml-vocab-{name}.gguf")
    if not os.path.exists(gguf_path):
        pytest.skip(f"{name} fixture missing")
    with GGUFReader(gguf_path) as r:
        tok = load_tokenizer(r)
    cases = load_cases(name)
    assert cases
    bad = []
    for text, expect in cases:
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != expect:
            bad.append((text, expect, got))
    assert not bad, f"{len(bad)}/{len(cases)} mismatches; first: {bad[0]!r}"


# every fixture with both a vocab gguf and .inp/.out in the reference tree
GOLDEN_VOCABS = ["llama-spm", "phi-3", "gpt-2", "mpt", "starcoder", "refact",
                 "deepseek-llm", "deepseek-coder", "falcon"]


@requires_reference
@pytest.mark.parametrize("name", GOLDEN_VOCABS)
def test_tokenizer_golden(name):
    run_golden(name)


@requires_reference
def test_spm_round_trip_decode():
    with GGUFReader(os.path.join(MODELS, "ggml-vocab-llama-spm.gguf")) as r:
        tok = load_tokenizer(r)
    text = "Hello, world! üñ 中文 emoji \U0001f600 test"
    ids = tok.encode(text, add_special=False)
    assert tok.decode(ids) == " " + text  # spm adds the space prefix


@requires_reference
def test_bos_eos_flags():
    with GGUFReader(os.path.join(MODELS, "ggml-vocab-llama-spm.gguf")) as r:
        tok = load_tokenizer(r)
    ids = tok.encode("hi", add_special=True)
    assert ids[0] == tok.vocab.bos_id
