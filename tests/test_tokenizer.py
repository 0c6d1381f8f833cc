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
                 "deepseek-llm", "deepseek-coder", "falcon", "bert-bge"]


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


def test_ugm_viterbi_synthetic():
    """UGM picks the highest-score segmentation (SentencePiece unigram)."""
    import numpy as np
    from llama_cpp_test_tpu.tokenizer.vocab import Tokenizer, TokenType, Vocab

    tokens = ["<unk>", "<s>", "</s>", "▁", "▁he", "▁hello", "llo", "▁hell",
              "o", "l", "h", "e", "▁wor", "ld", "▁world"]
    scores = np.array([0, 0, 0, -5, -4, -2, -3, -3.5, -1.5, -2, -2, -2,
                       -3, -2, -2.5], np.float32)
    tt = np.full(len(tokens), int(TokenType.NORMAL), np.int32)
    tt[0] = TokenType.UNKNOWN
    tt[1] = tt[2] = TokenType.CONTROL
    v = Vocab(model="t5", pre="default", tokens=tokens, scores=scores,
              token_types=tt, bos_id=1, eos_id=2, unk_id=0,
              add_bos=False, add_eos=False, add_space_prefix=True)
    tok = Tokenizer(v)
    ids = tok.encode("hello world", add_special=False)
    # best: ▁hello(-2) < ▁hell+o(-5); ▁world(-2.5) beats ▁wor+ld(-5)
    assert ids == [tokens.index("▁hello"), tokens.index("▁world")], \
        [tokens[i] for i in ids]
    # unknown char falls back to <unk> with penalty, doesn't crash
    ids2 = tok.encode("hello Q world", add_special=False)
    assert v.unk_id in ids2


def test_rwkv_greedy_longest_match():
    from llama_cpp_test_tpu.tokenizer.vocab import Tokenizer, Vocab
    import numpy as np

    tokens = ["a", "b", "ab", "abc", "c", " ", " a"]
    v = Vocab(model="rwkv", pre="default", tokens=tokens, scores=None,
              token_types=None, bos_id=-1, eos_id=-1, unk_id=0,
              add_bos=False, add_eos=False, add_space_prefix=False)
    tok = Tokenizer(v)
    assert tok.encode("abc a b", add_special=False) == [
        tokens.index("abc"), tokens.index(" a"), tokens.index(" "),
        tokens.index("b")]
    assert tok.decode(tok.encode("abc a b", add_special=False)) == "abc a b"


def test_fim_token_discovery():
    """FIM ids resolve from well-known token names (llama.h:1021-1026)."""
    from llama_cpp_test_tpu.tokenizer.vocab import vocab_from_metadata

    md = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": ["a", "<|fim_prefix|>", "<|fim_suffix|>",
                                  "<|fim_middle|>", "b"],
        "tokenizer.ggml.merges": [],
    }
    v = vocab_from_metadata(md)
    assert (v.fim_pre_id, v.fim_suf_id, v.fim_mid_id) == (1, 2, 3)
    # explicit key wins
    md["tokenizer.ggml.fim_pre_token_id"] = 4
    assert vocab_from_metadata(md).fim_pre_id == 4
