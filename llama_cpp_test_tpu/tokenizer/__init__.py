"""Tokenizers (host-side): SPM greedy-bigram, byte-level BPE with per-model
pretokenizer regexes, special-token partitioning, detokenization.

The TPU-framework analogue of the reference's llama-vocab.cpp (SPM :107,
BPE :276, special-token partition :384). Golden-tested against the
reference's models/ggml-vocab-*.gguf{,.inp,.out} fixtures.
"""
from .vocab import Vocab, Tokenizer, load_tokenizer  # noqa: F401
