"""Cross-engine parity vs the reference llama.cpp binary (SURVEY §7
milestone 3: greedy decode matches CPU llama.cpp token-for-token).

No real checkpoint exists in this environment, so the check runs on a
synthesized GGUF (our writer, SPM vocab, random weights) — which still
exercises the full cross-stack contract: GGUF byte layout, tokenizer,
codec decode, rope/attention/FFN math. Two layers of evidence:

1. live test (skipped unless /tmp/refbuild/bin/llama-cli exists — build it
   with `cmake /root/reference && make llama-cli` from a writable copy):
   runs both engines and asserts byte-exact Q8_0 output.
2. committed fixtures (tests/fixtures/parity_*.json) produced by
   tools/parity_check.py — always validated for internal consistency.

Q4_0 note: our engine matches an exact-f32 numpy forward token-for-token;
llama.cpp's CPU path quantizes activations to Q8_0 for int8 dots
(reference ggml/src/ggml-cpu/ggml-cpu-quants.c vec_dot_q4_0_q8_0), which
flips near-tie argmaxes on random weights — so 4-bit fixtures record a
common prefix rather than a full match.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REF_CLI = "/tmp/refbuild/bin/llama-cli"
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "parity_check.py")


def test_committed_fixture_q8_0_exact():
    with open(os.path.join(FIXTURES, "parity_q8_0.json")) as f:
        d = json.load(f)
    assert d["exact_match"], "committed Q8_0 parity fixture must be exact"
    assert len(d["ours_tokens"]) == 64


def test_committed_fixture_q4_0_prefix():
    with open(os.path.join(FIXTURES, "parity_q4_0.json")) as f:
        d = json.load(f)
    # int8-activation-dot noise in the reference flips a near-tie argmax
    # after a few tokens; require a meaningful agreeing prefix
    assert d["common_prefix_bytes"] >= 8


@pytest.mark.skipif(not os.path.exists(REF_CLI),
                    reason="reference llama-cli not built")
def test_live_q8_0_token_for_token(tmp_path):
    out = subprocess.run(
        [sys.executable, TOOL, "--qtype", "Q8_0",
         "--model", str(tmp_path / "parity.gguf")],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    d = json.loads(out.stdout)
    assert d["exact_match"]


def test_engine_matches_f32_numpy_on_q4_0(tmp_path):
    """Our engine == exact-f32 numpy forward on a 4-bit model (the half of
    the parity argument that needs no reference binary)."""
    import jax

    from test_engine import ref_forward, dequantized_view, make_tiny_gguf
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.runtime.engine import Context, Model, generate

    path = str(tmp_path / "t.gguf")
    wts = make_tiny_gguf(path, qtype=GGMLType.Q4_0)
    deq = dequantized_view(path, wts)
    m = Model(path)
    ctx = Context(m, n_ctx=128, n_seq_max=1, block_size=16)
    prompt = [1, 229, 153, 132, 107]
    ours = list(generate(ctx, prompt, 12))
    toks = list(prompt)
    ref = []
    for _ in range(12):
        logits = ref_forward(wts, toks, qdec=deq)
        t = int(np.argmax(logits[-1]))
        ref.append(t)
        toks.append(t)
    assert ours == ref
