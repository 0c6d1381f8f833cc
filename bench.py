"""Benchmark driver (llama-bench analogue, examples/llama-bench).

Measures single-chip decode tokens/s and prefill tokens/s on a synthesized
TinyLlama-1.1B-geometry model (BASELINE config #1 architecture: n_embd 2048,
22 layers, 32 q-heads / 4 kv-heads, ffn 5632, vocab 32000) quantized Q4_K,
served through the full engine path: fused Pallas dequant-matmul + paged KV
cache + jitted decode step.

Prints ONE JSON line:
  {"metric": ..., "value": tok/s, "unit": "tok/s", "vs_baseline": ...}
vs_baseline = fraction of the HBM-bandwidth decode roofline achieved on this
chip (BASELINE.json target: >= 0.85). Roofline = BW / bytes-touched-per-token
(weights + KV); weight-dominated at batch 1.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

MODEL_CACHE = "/tmp/bench_tinyllama_q4k.gguf"

HBM_BW = {  # bytes/s, per chip
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6e": 1640e9,
    "cpu": 50e9,
}


def tinyllama_hp():
    return dict(n_vocab=32000, n_embd=2048, n_head=32, n_head_kv=4,
                head_dim=64, n_layer=22, n_ff=5632)


def build_model(path):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from __graft_entry__ import _tiny_gguf

    hp = tinyllama_hp()
    _tiny_gguf(path, n_vocab=hp["n_vocab"], n_embd=hp["n_embd"],
               n_head=hp["n_head"], n_head_kv=hp["n_head_kv"],
               head_dim=hp["head_dim"], n_layer=hp["n_layer"],
               n_ff=hp["n_ff"], qtype=GGMLType.Q4_K)


def quantized_bytes_per_token(hp, bits=4.5):
    """Weight bytes every decode step must stream from HBM."""
    c, ff, L, v = hp["n_embd"], hp["n_ff"], hp["n_layer"], hp["n_vocab"]
    hq, hkv, d = hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    per_layer = (c * hq * d + 2 * c * hkv * d + hq * d * c + 3 * c * ff)
    total = L * per_layer + v * c  # + lm head
    return total * bits / 8


def main():
    import jax

    backend = jax.default_backend()
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", backend)
    bw = HBM_BW.get(gen, HBM_BW.get(backend, 819e9))

    if not os.path.exists(MODEL_CACHE):
        from llama_cpp_test_tpu.quant import codecs

        t0 = time.time()
        codecs.set_refine_iters(0)  # fixture build speed on slow hosts
        try:
            build_model(MODEL_CACHE)
        finally:
            codecs.set_refine_iters(2)
        print(f"# built model in {time.time()-t0:.1f}s", file=sys.stderr)

    from llama_cpp_test_tpu.runtime.engine import Context, Model

    t0 = time.time()
    model = Model(MODEL_CACHE)
    print(f"# load+repack {time.time()-t0:.1f}s", file=sys.stderr)

    n_ctx = 1024
    ctx = Context(model, n_ctx=n_ctx, n_seq_max=2, block_size=16)
    rng = np.random.default_rng(0)

    # prefill (pp512 analogue): first call compiles; time the second
    warm = ctx.new_seq()
    ctx.prefill(warm, list(rng.integers(1, 30000, 512)))
    ctx.free_seq(warm)
    s = ctx.new_seq()
    prompt = list(rng.integers(1, 30000, 512))
    t0 = time.time()
    logits = ctx.prefill(s, prompt)
    np.asarray(logits)
    prefill_s = time.time() - t0
    pp_tok_s = len(prompt) / prefill_s

    # decode, python-loop (per-token host round trip — serving path)
    tok = int(np.argmax(logits))
    for _ in range(2):
        logits = ctx.decode([s], [tok])[0]
        tok = int(np.argmax(logits))
    n_py = 16
    t0 = time.time()
    for _ in range(n_py):
        logits = ctx.decode([s], [tok])[0]
        tok = int(np.argmax(logits))
    tg_py = n_py / (time.time() - t0)

    # decode, device-side greedy scan loop (llama-cli greedy path)
    n_steps = 32
    ctx.decode_greedy_loop(s, tok, n_steps)  # compile
    t0 = time.time()
    toks = ctx.decode_greedy_loop(s, tok, n_steps)
    dt = time.time() - t0
    tg_loop = n_steps / dt

    hp = tinyllama_hp()
    roofline = bw / quantized_bytes_per_token(hp)
    result = {
        "metric": f"tinyllama1.1b_q4k_decode_tok_s_{backend}",
        "value": round(tg_loop, 2),
        "unit": "tok/s",
        "vs_baseline": round(tg_loop / roofline, 4),
    }
    print(f"# prefill pp512: {pp_tok_s:.1f} tok/s | decode py-loop: "
          f"{tg_py:.1f} tok/s | decode device-loop: {tg_loop:.1f} tok/s | "
          f"roofline {roofline:.0f} tok/s ({gen})", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
