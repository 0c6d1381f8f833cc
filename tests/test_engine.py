"""End-to-end engine test: tiny random llama GGUF -> paged prefill/decode
logits vs an independent numpy reference (dense weights, full attention,
no paging). Validates weight loading (incl. the NORM-rope row un-permutation),
the paged KV cache plumbing (block tables, slot scatter, masks), batching,
and COW forking.
"""
import math
import os

import numpy as np
import pytest

from llama_cpp_test_tpu.gguf.constants import GGMLType
from llama_cpp_test_tpu.gguf.writer import GGUFWriter

HP = dict(n_vocab=288, n_embd=64, n_head=4, n_head_kv=2, head_dim=16,
          n_layer=2, n_ff=96, rope_base=10000.0, rms_eps=1e-5)


def tiny_vocab(n_vocab):
    """SPM-style vocab: specials + full byte fallback + filler words."""
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
    scores = [0.0] * len(tokens)
    types = [2, 3, 3] + [6] * 256  # UNKNOWN, CONTROL, CONTROL, BYTE...
    words = ["▁hello", "▁world", "▁the", "▁a", "ing",
             "er", "st", "on", "at", "en"]
    i = 0
    while len(tokens) < n_vocab:
        w = words[i % len(words)] + ("" if i < len(words) else str(i))
        tokens.append(w)
        scores.append(-float(len(tokens)))
        types.append(1)
        i += 1
    return tokens[:n_vocab], scores[:n_vocab], types[:n_vocab]


def permute_gguf(w: np.ndarray, n_head: int, d: int) -> np.ndarray:
    """convert_hf_to_gguf.py:1657 permute — HF half-split -> GGUF NORM rows."""
    return (w.reshape(n_head, 2, d // 2, *w.shape[1:])
             .swapaxes(1, 2).reshape(w.shape))


def make_tiny_gguf(path, seed=0, qtype=GGMLType.Q8_0):
    rng = np.random.default_rng(seed)
    hp = HP
    c, hq, hkv, d = hp["n_embd"], hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    v, ff, L = hp["n_vocab"], hp["n_ff"], hp["n_layer"]

    def rand(*shape, s=0.08):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    wts = {
        "token_embd.weight": rand(v, c, s=0.3),
        "output_norm.weight": 1.0 + rand(c, s=0.05),
        "output.weight": rand(v, c, s=0.2),
    }
    for i in range(L):
        p = f"blk.{i}."
        wts[p + "attn_norm.weight"] = 1.0 + rand(c, s=0.05)
        wts[p + "attn_q.weight"] = rand(hq * d, c)
        wts[p + "attn_k.weight"] = rand(hkv * d, c)
        wts[p + "attn_v.weight"] = rand(hkv * d, c)
        wts[p + "attn_output.weight"] = rand(c, hq * d)
        wts[p + "ffn_norm.weight"] = 1.0 + rand(c, s=0.05)
        wts[p + "ffn_gate.weight"] = rand(ff, c)
        wts[p + "ffn_up.weight"] = rand(ff, c)
        wts[p + "ffn_down.weight"] = rand(c, ff)

    w = GGUFWriter(path, arch="llama")
    md = {
        "general.architecture": "llama",
        "llama.context_length": 256,
        "llama.embedding_length": c,
        "llama.block_count": L,
        "llama.attention.head_count": hq,
        "llama.attention.head_count_kv": hkv,
        "llama.attention.key_length": d,
        "llama.attention.value_length": d,
        "llama.feed_forward_length": ff,
        "llama.rope.dimension_count": d,
        "llama.rope.freq_base": hp["rope_base"],
        "llama.attention.layer_norm_rms_epsilon": hp["rms_eps"],
        "llama.vocab_size": v,
    }
    toks, scores, types = tiny_vocab(v)
    md.update({
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.scores": np.asarray(scores, np.float32),
        "tokenizer.ggml.token_type": np.asarray(types, np.int32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_bos_token": True,
    })
    for key, val in md.items():
        w.add_kv(key, val)
    for name, arr in wts.items():
        if arr.ndim == 2 and name not in ("output_norm.weight",):
            store = arr
            if name.endswith(("attn_q.weight",)):
                store = permute_gguf(arr, hq, d)
            elif name.endswith(("attn_k.weight",)):
                store = permute_gguf(arr, hkv, d)
            w.add_tensor(name, store, ggml_type=qtype)
        else:
            w.add_tensor(name, arr, ggml_type=GGMLType.F32)
    w.write()
    return wts


# -- independent reference (HF-style, dense, full attention) -----------------


def ref_forward(wts, tokens, qdec=None):
    """tokens [T] -> logits [T, V]. Weights: HF layout, half-split rope.
    qdec: optional dict name->dequantized array (to mirror quantization)."""
    hp = HP
    c, hq, hkv, d = hp["n_embd"], hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    L = hp["n_layer"]
    get = (lambda n: qdec[n]) if qdec else (lambda n: wts[n])

    def rms(x, wname):
        wv = wts[wname]
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + hp["rms_eps"]) * wv

    def rope(x, pos):
        # x: [T, H, D] half-split convention
        half = d // 2
        inv = hp["rope_base"] ** (-2.0 * np.arange(half) / d)
        th = pos[:, None] * inv[None, :]
        cos, sin = np.cos(th)[:, None, :], np.sin(th)[:, None, :]
        x1, x2 = x[..., :half], x[..., half:]
        return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    T = len(tokens)
    x = get("token_embd.weight")[tokens]
    pos = np.arange(T, dtype=np.float64)
    for i in range(L):
        p = f"blk.{i}."
        cur = rms(x, p + "attn_norm.weight")
        q = (cur @ get(p + "attn_q.weight").T).reshape(T, hq, d)
        k = (cur @ get(p + "attn_k.weight").T).reshape(T, hkv, d)
        vv = (cur @ get(p + "attn_v.weight").T).reshape(T, hkv, d)
        q, k = rope(q, pos), rope(k, pos)
        rep = hq // hkv
        out = np.zeros((T, hq, d))
        for h in range(hq):
            kh, vh = k[:, h // rep], vv[:, h // rep]
            logits = (q[:, h] @ kh.T) / math.sqrt(d)
            mask = np.tril(np.ones((T, T), bool))
            logits = np.where(mask, logits, -1e30)
            pr = np.exp(logits - logits.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            out[:, h] = pr @ vh
        x = x + out.reshape(T, hq * d) @ get(p + "attn_output.weight").T
        cur = rms(x, p + "ffn_norm.weight")
        g = cur @ get(p + "ffn_gate.weight").T
        u = cur @ get(p + "ffn_up.weight").T
        act = g / (1 + np.exp(-g)) * u
        x = x + act @ get(p + "ffn_down.weight").T
    x = rms(x, "output_norm.weight")
    return x @ get("output.weight").T


def dequantized_view(path, wts):
    """Effective (quantize->dequantize) weights in HF layout for the ref."""
    from llama_cpp_test_tpu.gguf.reader import GGUFReader

    hp = HP
    hq, hkv, d = hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    inv_q = np.argsort(_perm_idx(hq, d))
    qdec = {}
    with GGUFReader(path) as r:
        for name in wts:
            arr = r.dequantize(name)
            if name.endswith("attn_q.weight"):
                arr = arr[_unperm(hq, d)]
            elif name.endswith("attn_k.weight"):
                arr = arr[_unperm(hkv, d)]
            qdec[name] = arr.reshape(wts[name].shape)
    return qdec


def _perm_idx(n_head, d):
    return None


def _unperm(n_head, d):
    idx = np.empty(n_head * d, np.int64)
    for h in range(n_head):
        base = h * d
        idx[base:base + d // 2] = base + 2 * np.arange(d // 2)
        idx[base + d // 2:base + d] = base + 2 * np.arange(d // 2) + 1
    return idx


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    wts = make_tiny_gguf(path)
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    model = Model(path)
    return path, wts, model


def nmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(((a - b) ** 2).mean() / ((a * a).mean() + 1e-12))


def test_prefill_logits_match_reference(tiny_model):
    path, wts, model = tiny_model
    from llama_cpp_test_tpu.runtime.engine import Context

    qdec = dequantized_view(path, wts)
    tokens = [3, 17, 42, 9, 150, 7]
    ref = ref_forward(wts, tokens, qdec)
    ctx = Context(model, n_ctx=64, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    logits = ctx.prefill(s, tokens, all_logits=True)
    assert logits.shape == (len(tokens), HP["n_vocab"])
    # bf16 matmuls vs float64 reference
    assert nmse(ref, logits) < 2e-3, nmse(ref, logits)
    assert np.argmax(ref[-1]) == np.argmax(logits[-1])


def test_decode_matches_prefill(tiny_model):
    path, wts, model = tiny_model
    from llama_cpp_test_tpu.runtime.engine import Context

    tokens = [3, 17, 42, 9, 150, 7, 23, 88]
    # full prefill in one shot
    ctx1 = Context(model, n_ctx=64, n_seq_max=2, block_size=8)
    s1 = ctx1.new_seq()
    all_logits = ctx1.prefill(s1, tokens, all_logits=True)
    # prefill 3 then decode the rest token by token
    ctx2 = Context(model, n_ctx=64, n_seq_max=2, block_size=8)
    s2 = ctx2.new_seq()
    ctx2.prefill(s2, tokens[:3])
    decode_logits = []
    for t in tokens[3:]:
        decode_logits.append(ctx2.decode([s2], [t])[0])
    for i, dl in enumerate(decode_logits):
        assert nmse(all_logits[3 + i], dl) < 1e-4, (i, nmse(all_logits[3 + i], dl))


def test_batched_decode(tiny_model):
    path, wts, model = tiny_model
    from llama_cpp_test_tpu.runtime.engine import Context

    ctx = Context(model, n_ctx=64, n_seq_max=4, block_size=8)
    p1, p2 = [5, 6, 7], [100, 101, 102, 103, 104]
    sa, sb = ctx.new_seq(), ctx.new_seq()
    la = ctx.prefill(sa, p1)
    lb = ctx.prefill(sb, p2)
    batch = ctx.decode([sa, sb], [int(np.argmax(la)), int(np.argmax(lb))])
    # singles must match the batch rows (same cache, separate contexts)
    ctx2 = Context(model, n_ctx=64, n_seq_max=4, block_size=8)
    s1 = ctx2.new_seq()
    l1 = ctx2.prefill(s1, p1)
    single = ctx2.decode([s1], [int(np.argmax(l1))])
    assert nmse(batch[0], single[0]) < 1e-5


def test_fork_cow(tiny_model):
    path, wts, model = tiny_model
    from llama_cpp_test_tpu.runtime.engine import Context

    ctx = Context(model, n_ctx=64, n_seq_max=4, block_size=8)
    s = ctx.new_seq()
    logits = ctx.prefill(s, [3, 17, 42, 9, 150])
    child = ctx.fork_seq(s)
    t = int(np.argmax(logits))
    # parent and child diverge; COW must keep their caches consistent
    lp = ctx.decode([s], [t])
    lc = ctx.decode([child], [t])
    assert nmse(lp[0], lc[0]) < 1e-5
    lp2 = ctx.decode([s], [11])
    lc2 = ctx.decode([child], [12])
    assert nmse(lp2[0], lc2[0]) > 1e-8  # different tokens -> different logits


def test_generate_greedy(tiny_model):
    path, wts, model = tiny_model
    from llama_cpp_test_tpu.runtime.engine import Context, generate

    ctx = Context(model, n_ctx=64, n_seq_max=2, block_size=8)
    toks = list(generate(ctx, [3, 17, 42], 8))
    assert len(toks) == 8
    toks2 = list(generate(ctx, [3, 17, 42], 8))
    assert toks == toks2  # deterministic greedy


def test_decode_greedy_loop_matches_stepwise(tiny_model):
    path, wts, model = tiny_model
    from llama_cpp_test_tpu.runtime.engine import Context

    prompt = [3, 17, 42, 9]
    ctx1 = Context(model, n_ctx=64, n_seq_max=1, block_size=8)
    s1 = ctx1.new_seq()
    logits = ctx1.prefill(s1, prompt)
    t = int(np.argmax(logits))
    ref = []
    for _ in range(10):
        lg = ctx1.decode([s1], [t])[0]
        t = int(np.argmax(lg))
        ref.append(t)

    ctx2 = Context(model, n_ctx=64, n_seq_max=1, block_size=8)
    s2 = ctx2.new_seq()
    logits = ctx2.prefill(s2, prompt)
    t0 = int(np.argmax(logits))
    out = ctx2.decode_greedy_loop(s2, t0, 10)
    assert out == ref


def test_abort_callback_and_recoverable_errors(tmp_path):
    """Abort callback (code 2) + NoKvSlotError (code 1) — the recoverable
    llama_decode return-code contract (llama-context.cpp:1302-1305)."""
    import pytest

    from llama_cpp_test_tpu.runtime.engine import Context, Model
    from llama_cpp_test_tpu.runtime.errors import (DecodeAborted,
                                                   DecodeError,
                                                   NoKvSlotError)

    path = str(tmp_path / "m.gguf")
    make_tiny_gguf(path)
    m = Model(path)
    ctx = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    calls = []

    def abort():
        calls.append(1)
        return len(calls) > 1  # allow the first call, abort the second

    ctx.abort_callback = abort
    lg = ctx.prefill(s, [3, 17, 42])
    with pytest.raises(DecodeAborted) as ei:
        ctx.decode([s], [int(lg.argmax())])
    assert ei.value.code == 2
    ctx.abort_callback = None
    # recoverable: engine still serviceable after the abort
    out = ctx.decode([s], [int(lg.argmax())])
    assert out.shape[0] == 1
    assert issubclass(NoKvSlotError, DecodeError)
    assert NoKvSlotError.code == 1
