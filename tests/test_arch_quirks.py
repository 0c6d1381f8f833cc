"""Gemma-family architecture quirks vs an independent numpy reference:
embedding scaling, GeGLU, Q/K per-head norms, sandwich (post) norms,
attention/final logit softcapping, alternating sliding-window layers
(reference llm_build_gemma2/gemma3, src/llama-model.cpp)."""
import math

import numpy as np
import pytest

from test_engine import nmse, tiny_vocab

HP = dict(n_vocab=199, n_embd=64, n_head=4, n_head_kv=2, head_dim=16,
          n_layer=2, n_ff=128, rope_base=10000.0, rms_eps=1e-5,
          sliding_window=3, attn_softcap=50.0, final_softcap=30.0)


def make_tiny_gemma2(path, seed=0, qk_norm=True):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.gguf.writer import GGUFWriter

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
        wts[p + "attn_post_norm.weight"] = 1.0 + rand(c, s=0.05)
        wts[p + "ffn_norm.weight"] = 1.0 + rand(c, s=0.05)
        wts[p + "ffn_gate.weight"] = rand(ff, c)
        wts[p + "ffn_up.weight"] = rand(ff, c)
        wts[p + "ffn_down.weight"] = rand(c, ff)
        wts[p + "ffn_post_norm.weight"] = 1.0 + rand(c, s=0.05)
        if qk_norm:
            wts[p + "attn_q_norm.weight"] = 1.0 + rand(d, s=0.05)
            wts[p + "attn_k_norm.weight"] = 1.0 + rand(d, s=0.05)

    w = GGUFWriter(path, arch="gemma2")
    md = {
        "general.architecture": "gemma2",
        "gemma2.context_length": 256,
        "gemma2.embedding_length": c,
        "gemma2.block_count": L,
        "gemma2.attention.head_count": hq,
        "gemma2.attention.head_count_kv": hkv,
        "gemma2.attention.key_length": d,
        "gemma2.attention.value_length": d,
        "gemma2.feed_forward_length": ff,
        "gemma2.rope.dimension_count": d,
        "gemma2.rope.freq_base": hp["rope_base"],
        "gemma2.attention.layer_norm_rms_epsilon": hp["rms_eps"],
        "gemma2.vocab_size": v,
        "gemma2.attention.sliding_window": hp["sliding_window"],
        "gemma2.attn_logit_softcapping": hp["attn_softcap"],
        "gemma2.final_logit_softcapping": hp["final_softcap"],
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
        w.add_tensor(name, arr, ggml_type=GGMLType.F32)
    w.write()
    return wts


def ref_forward_gemma2(wts, tokens, qk_norm=True):
    """Independent float64 reference with all gemma2/3 quirks.
    neox (half-split) rope — gemma is a neox-rope arch, so weights are
    stored unpermuted."""
    hp = HP
    c, hq, hkv, d = hp["n_embd"], hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    L = hp["n_layer"]
    eps = hp["rms_eps"]

    def rms(x, wv):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * wv

    def rope(x, pos):
        half = d // 2
        inv = hp["rope_base"] ** (-2.0 * np.arange(half) / d)
        th = pos[:, None] * inv[None, :]
        cos, sin = np.cos(th)[:, None, :], np.sin(th)[:, None, :]
        x1, x2 = x[..., :half], x[..., half:]
        return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    def gelu_tanh(g):
        return 0.5 * g * (1.0 + np.tanh(
            math.sqrt(2.0 / math.pi) * (g + 0.044715 * g ** 3)))

    T = len(tokens)
    x = wts["token_embd.weight"][tokens] * math.sqrt(c)  # embd scale
    pos = np.arange(T, dtype=np.float64)
    for i in range(L):
        p = f"blk.{i}."
        cur = rms(x, wts[p + "attn_norm.weight"])
        q = (cur @ wts[p + "attn_q.weight"].T).reshape(T, hq, d)
        k = (cur @ wts[p + "attn_k.weight"].T).reshape(T, hkv, d)
        vv = (cur @ wts[p + "attn_v.weight"].T).reshape(T, hkv, d)
        if qk_norm:
            q = rms(q, wts[p + "attn_q_norm.weight"])
            k = rms(k, wts[p + "attn_k_norm.weight"])
        q, k = rope(q, pos), rope(k, pos)
        rep = hq // hkv
        out = np.zeros((T, hq, d))
        # gemma2 swa_pattern=2: layer 0 sliding, layer 1 global
        window = hp["sliding_window"] if (i + 1) % 2 != 0 else 0
        for h in range(hq):
            kh, vh = k[:, h // rep], vv[:, h // rep]
            logits = (q[:, h] @ kh.T) / math.sqrt(d)
            cap = hp["attn_softcap"]
            logits = np.tanh(logits / cap) * cap
            mask = np.tril(np.ones((T, T), bool))
            if window > 0:
                ii, jj = np.mgrid[0:T, 0:T]
                mask &= jj > ii - window
            logits = np.where(mask, logits, -1e30)
            pr = np.exp(logits - logits.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            out[:, h] = pr @ vh
        o = out.reshape(T, hq * d) @ wts[p + "attn_output.weight"].T
        o = rms(o, wts[p + "attn_post_norm.weight"])  # sandwich norm
        x = x + o
        cur = rms(x, wts[p + "ffn_norm.weight"])
        g = cur @ wts[p + "ffn_gate.weight"].T
        u = cur @ wts[p + "ffn_up.weight"].T
        ffn = (gelu_tanh(g) * u) @ wts[p + "ffn_down.weight"].T
        ffn = rms(ffn, wts[p + "ffn_post_norm.weight"])
        x = x + ffn
    x = rms(x, wts["output_norm.weight"])
    logits = x @ wts["output.weight"].T
    cap = hp["final_softcap"]
    return np.tanh(logits / cap) * cap


def test_gemma2_hparams_parsed(tmp_path):
    from llama_cpp_test_tpu.models.hparams import (hparams_from_metadata,
                                                   layer_window)
    from llama_cpp_test_tpu.gguf.reader import GGUFReader

    path = str(tmp_path / "g2.gguf")
    make_tiny_gemma2(path)
    with GGUFReader(path) as r:
        hp = hparams_from_metadata(r.metadata)
    assert hp.act_fn == "gelu"
    assert abs(hp.embd_scale - math.sqrt(HP["n_embd"])) < 1e-9
    assert hp.attn_softcap == HP["attn_softcap"]
    assert hp.final_softcap == HP["final_softcap"]
    assert hp.swa_pattern == 2
    assert layer_window(hp, 0) == HP["sliding_window"]  # local layer
    assert layer_window(hp, 1) == 0                      # global layer


def test_gemma2_prefill_matches_reference(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "g2.gguf")
    wts = make_tiny_gemma2(path)
    tokens = [3, 17, 42, 9, 88, 123, 6, 54]
    ref = ref_forward_gemma2(wts, tokens)

    m = Model(path)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    assert got.shape == (len(tokens), HP["n_vocab"])
    assert nmse(ref, got) < 2e-3, nmse(ref, got)
    assert np.argmax(ref[-1]) == np.argmax(got[-1])


def test_gemma2_decode_matches_prefill(tmp_path):
    """Decode path (per-layer SWA + softcap) agrees with prefill logits."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "g2.gguf")
    make_tiny_gemma2(path)
    m = Model(path)
    tokens = [3, 17, 42, 9, 88]

    ctx_a = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    ref = ctx_a.prefill(ctx_a.new_seq(), tokens, all_logits=True)

    ctx_b = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    s = ctx_b.new_seq()
    ctx_b.prefill(s, tokens[:1])
    rows = []
    for t in tokens[1:]:
        rows.append(ctx_b.decode([s], [t])[0])
    assert nmse(np.stack(rows), ref[1:]) < 1e-4


# ---------------------------------------------------------------------------
# phi2: parallel residual, LayerNorm+bias, partial rotary, non-gated GELU FFN


PHI_HP = dict(n_vocab=199, n_embd=64, n_head=4, n_head_kv=4, head_dim=16,
              n_layer=2, n_ff=128, rope_base=10000.0, eps=1e-5, n_rot=8)


def make_tiny_phi2(path, seed=0, fused_qkv=True):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.gguf.writer import GGUFWriter

    rng = np.random.default_rng(seed)
    hp = PHI_HP
    c, hq, d = hp["n_embd"], hp["n_head"], hp["head_dim"]
    v, ff, L = hp["n_vocab"], hp["n_ff"], hp["n_layer"]

    def rand(*shape, s=0.08):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    wts = {
        "token_embd.weight": rand(v, c, s=0.3),
        "output_norm.weight": 1.0 + rand(c, s=0.05),
        "output_norm.bias": rand(c, s=0.05),
        "output.weight": rand(v, c, s=0.2),
        "output.bias": rand(v, s=0.05),
    }
    for i in range(L):
        p = f"blk.{i}."
        wts[p + "attn_norm.weight"] = 1.0 + rand(c, s=0.05)
        wts[p + "attn_norm.bias"] = rand(c, s=0.05)
        wts[p + "attn_qkv.weight"] = rand(3 * hq * d, c)
        wts[p + "attn_qkv.bias"] = rand(3 * hq * d, s=0.05)
        wts[p + "attn_output.weight"] = rand(c, hq * d)
        wts[p + "attn_output.bias"] = rand(c, s=0.05)
        wts[p + "ffn_up.weight"] = rand(ff, c)
        wts[p + "ffn_up.bias"] = rand(ff, s=0.05)
        wts[p + "ffn_down.weight"] = rand(c, ff)
        wts[p + "ffn_down.bias"] = rand(c, s=0.05)

    w = GGUFWriter(path, arch="phi2")
    md = {
        "phi2.context_length": 256,
        "phi2.embedding_length": c,
        "phi2.block_count": L,
        "phi2.attention.head_count": hq,
        "phi2.attention.head_count_kv": hq,
        "phi2.attention.key_length": d,
        "phi2.attention.value_length": d,
        "phi2.feed_forward_length": ff,
        "phi2.rope.dimension_count": hp["n_rot"],
        "phi2.rope.freq_base": hp["rope_base"],
        "phi2.attention.layer_norm_epsilon": hp["eps"],
        "phi2.vocab_size": v,
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
        "tokenizer.ggml.add_bos_token": False,
    })
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    for key, val in md.items():
        w.add_kv(key, val)
    for name, arr in wts.items():
        w.add_tensor(name, arr, ggml_type=GGMLType.F32)
    w.write()
    return wts


def ref_forward_phi2(wts, tokens):
    """Independent float64 reference: parallel residual, LN+bias, partial
    neox rope over the first n_rot dims, gelu-tanh FFN, biased head."""
    hp = PHI_HP
    c, hq, d, L = hp["n_embd"], hp["n_head"], hp["head_dim"], hp["n_layer"]
    eps, n_rot = hp["eps"], hp["n_rot"]

    def ln(x, wv, bv):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * wv + bv

    def rope(x, pos):
        half = n_rot // 2
        inv = hp["rope_base"] ** (-2.0 * np.arange(half) / n_rot)
        th = pos[:, None] * inv[None, :]
        cos, sin = np.cos(th)[:, None, :], np.sin(th)[:, None, :]
        x1, x2, rest = x[..., :half], x[..., half:n_rot], x[..., n_rot:]
        return np.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin, rest], -1)

    def gelu_tanh(g):
        return 0.5 * g * (1.0 + np.tanh(
            math.sqrt(2.0 / math.pi) * (g + 0.044715 * g ** 3)))

    T = len(tokens)
    x = wts["token_embd.weight"][tokens].astype(np.float64)
    pos = np.arange(T, dtype=np.float64)
    for i in range(L):
        p = f"blk.{i}."
        cur = ln(x, wts[p + "attn_norm.weight"], wts[p + "attn_norm.bias"])
        qkv = cur @ wts[p + "attn_qkv.weight"].T + wts[p + "attn_qkv.bias"]
        q = qkv[:, : hq * d].reshape(T, hq, d)
        k = qkv[:, hq * d: 2 * hq * d].reshape(T, hq, d)
        vv = qkv[:, 2 * hq * d:].reshape(T, hq, d)
        q, k = rope(q, pos), rope(k, pos)
        out = np.zeros((T, hq, d))
        for h in range(hq):
            logits = (q[:, h] @ k[:, h].T) / math.sqrt(d)
            mask = np.tril(np.ones((T, T), bool))
            logits = np.where(mask, logits, -1e30)
            pr = np.exp(logits - logits.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            out[:, h] = pr @ vv[:, h]
        o = out.reshape(T, hq * d) @ wts[p + "attn_output.weight"].T \
            + wts[p + "attn_output.bias"]
        u = cur @ wts[p + "ffn_up.weight"].T + wts[p + "ffn_up.bias"]
        ffn = gelu_tanh(u) @ wts[p + "ffn_down.weight"].T \
            + wts[p + "ffn_down.bias"]
        x = x + o + ffn  # parallel residual
    x = ln(x, wts["output_norm.weight"], wts["output_norm.bias"])
    return x @ wts["output.weight"].T + wts["output.bias"]


def test_phi2_hparams_parsed(tmp_path):
    from llama_cpp_test_tpu.models.hparams import hparams_from_metadata
    from llama_cpp_test_tpu.gguf.reader import GGUFReader

    path = str(tmp_path / "p2.gguf")
    make_tiny_phi2(path)
    with GGUFReader(path) as r:
        hp = hparams_from_metadata(r.metadata)
    assert hp.parallel_residual
    assert hp.norm_type == "ln"
    assert hp.rope_dim == PHI_HP["n_rot"]
    assert hp.rope_type == "neox"


def test_phi2_prefill_matches_reference(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "p2.gguf")
    wts = make_tiny_phi2(path)
    tokens = [3, 17, 42, 9, 88, 123, 6, 54]
    ref = ref_forward_phi2(wts, tokens)
    m = Model(path)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    assert got.shape == (len(tokens), PHI_HP["n_vocab"])
    assert nmse(ref, got) < 2e-3, nmse(ref, got)
    assert np.argmax(ref[-1]) == np.argmax(got[-1])


def test_phi2_decode_matches_prefill(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "p2.gguf")
    make_tiny_phi2(path)
    m = Model(path)
    tokens = [3, 17, 42, 9, 88]
    ctx_a = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    ref = ctx_a.prefill(ctx_a.new_seq(), tokens, all_logits=True)
    ctx_b = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    s = ctx_b.new_seq()
    ctx_b.prefill(s, tokens[:1])
    rows = [ctx_b.decode([s], [t])[0] for t in tokens[1:]]
    assert nmse(np.stack(rows), ref[1:]) < 1e-4


# ---------------------------------------------------------------------------
# qwen2/qwen3: neox rope + attention biases (+ per-head qk-norms for qwen3)


def make_tiny_qwen(path, arch="qwen2", seed=0):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.gguf.writer import GGUFWriter

    rng = np.random.default_rng(seed)
    hp = HP
    c, hq, hkv, d = hp["n_embd"], hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    v, ff, L = hp["n_vocab"], hp["n_ff"], hp["n_layer"]
    qk_norm = arch == "qwen3"

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
        if qk_norm:
            wts[p + "attn_q_norm.weight"] = 1.0 + rand(d, s=0.05)
            wts[p + "attn_k_norm.weight"] = 1.0 + rand(d, s=0.05)
        else:  # qwen2: attention biases
            wts[p + "attn_q.bias"] = rand(hq * d, s=0.05)
            wts[p + "attn_k.bias"] = rand(hkv * d, s=0.05)
            wts[p + "attn_v.bias"] = rand(hkv * d, s=0.05)

    w = GGUFWriter(path, arch=arch)
    md = {
        f"{arch}.context_length": 256,
        f"{arch}.embedding_length": c,
        f"{arch}.block_count": L,
        f"{arch}.attention.head_count": hq,
        f"{arch}.attention.head_count_kv": hkv,
        f"{arch}.attention.key_length": d,
        f"{arch}.feed_forward_length": ff,
        f"{arch}.rope.dimension_count": d,
        f"{arch}.rope.freq_base": hp["rope_base"],
        f"{arch}.attention.layer_norm_rms_epsilon": hp["rms_eps"],
        f"{arch}.vocab_size": v,
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
        "tokenizer.ggml.add_bos_token": False,
    })
    for key, val in md.items():
        w.add_kv(key, val)
    for name, arr in wts.items():
        w.add_tensor(name, arr, ggml_type=GGMLType.F32)
    w.write()
    return wts


def ref_forward_qwen(wts, tokens, qk_norm=False):
    """float64 reference: llama decoder, neox rope, biases or qk-norms."""
    hp = HP
    c, hq, hkv, d = hp["n_embd"], hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    L, eps = hp["n_layer"], hp["rms_eps"]

    def rms(x, wv):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * wv

    def rope(x, pos):
        half = d // 2
        inv = hp["rope_base"] ** (-2.0 * np.arange(half) / d)
        th = pos[:, None] * inv[None, :]
        cos, sin = np.cos(th)[:, None, :], np.sin(th)[:, None, :]
        x1, x2 = x[..., :half], x[..., half:]
        return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    T = len(tokens)
    x = wts["token_embd.weight"][tokens].astype(np.float64)
    pos = np.arange(T, dtype=np.float64)
    for i in range(L):
        p = f"blk.{i}."
        cur = rms(x, wts[p + "attn_norm.weight"])
        q = cur @ wts[p + "attn_q.weight"].T
        k = cur @ wts[p + "attn_k.weight"].T
        vv = cur @ wts[p + "attn_v.weight"].T
        if p + "attn_q.bias" in wts:
            q = q + wts[p + "attn_q.bias"]
            k = k + wts[p + "attn_k.bias"]
            vv = vv + wts[p + "attn_v.bias"]
        q = q.reshape(T, hq, d)
        k = k.reshape(T, hkv, d)
        vv = vv.reshape(T, hkv, d)
        if qk_norm:
            q = rms(q, wts[p + "attn_q_norm.weight"])
            k = rms(k, wts[p + "attn_k_norm.weight"])
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
        x = x + out.reshape(T, hq * d) @ wts[p + "attn_output.weight"].T
        cur = rms(x, wts[p + "ffn_norm.weight"])
        g = cur @ wts[p + "ffn_gate.weight"].T
        u = cur @ wts[p + "ffn_up.weight"].T
        silu = g / (1.0 + np.exp(-g))
        x = x + (silu * u) @ wts[p + "ffn_down.weight"].T
    x = rms(x, wts["output_norm.weight"])
    return x @ wts["output.weight"].T


def test_qwen2_prefill_matches_reference(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "q2.gguf")
    wts = make_tiny_qwen(path, arch="qwen2")
    tokens = [3, 17, 42, 9, 88, 123]
    ref = ref_forward_qwen(wts, tokens)
    m = Model(path)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    assert nmse(ref, got) < 2e-3, nmse(ref, got)
    assert np.argmax(ref[-1]) == np.argmax(got[-1])


def test_qwen3_prefill_matches_reference(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "q3.gguf")
    wts = make_tiny_qwen(path, arch="qwen3")
    tokens = [3, 17, 42, 9, 88, 123]
    ref = ref_forward_qwen(wts, tokens, qk_norm=True)
    m = Model(path)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    assert nmse(ref, got) < 2e-3, nmse(ref, got)
    assert np.argmax(ref[-1]) == np.argmax(got[-1])


def test_unknown_arch_refused(tmp_path):
    """Registry honesty: an arch without an implemented forward raises at
    load instead of silently producing llama logits."""
    import pytest as _pytest

    from llama_cpp_test_tpu.runtime.engine import Model

    # gptj: in the reference's arch enum but builder-less even there
    # (llama-model.cpp has no llm_build_gptj) — never implemented here
    path = str(tmp_path / "gptj.gguf")
    make_tiny_qwen(path, arch="gptj")
    with _pytest.raises(ValueError, match="no implemented forward"):
        Model(path)


# ---------------------------------------------------------------------------
# falcon: parallel residual like phi2, but full-head neox rope, GQA,
# bias-free projections, and (40B-style) attn_norm_2 feeding the FFN branch


FALCON_HP = dict(n_vocab=199, n_embd=96, n_head=4, n_head_kv=2, head_dim=24,
                 n_ff=192, n_layer=2, eps=1e-5, rope_base=10000.0)


def make_tiny_falcon(path, seed=0, norm2=True):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.gguf.writer import GGUFWriter

    rng = np.random.default_rng(seed)
    hp = FALCON_HP
    c, hq, hkv, d = hp["n_embd"], hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    v, ff, L = hp["n_vocab"], hp["n_ff"], hp["n_layer"]

    def rand(*shape, s=0.08):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    wts = {
        "token_embd.weight": rand(v, c, s=0.3),
        "output_norm.weight": 1.0 + rand(c, s=0.05),
        "output_norm.bias": rand(c, s=0.05),
        "output.weight": rand(v, c, s=0.2),
    }
    for i in range(L):
        p = f"blk.{i}."
        wts[p + "attn_norm.weight"] = 1.0 + rand(c, s=0.05)
        wts[p + "attn_norm.bias"] = rand(c, s=0.05)
        if norm2:
            wts[p + "attn_norm_2.weight"] = 1.0 + rand(c, s=0.05)
            wts[p + "attn_norm_2.bias"] = rand(c, s=0.05)
        wts[p + "attn_qkv.weight"] = rand((hq + 2 * hkv) * d, c)
        wts[p + "attn_output.weight"] = rand(c, hq * d)
        wts[p + "ffn_up.weight"] = rand(ff, c)
        wts[p + "ffn_down.weight"] = rand(c, ff)
    w = GGUFWriter(path, arch="falcon")
    md = {
        "falcon.context_length": 256,
        "falcon.embedding_length": c,
        "falcon.block_count": L,
        "falcon.attention.head_count": hq,
        "falcon.attention.head_count_kv": hkv,
        "falcon.attention.key_length": d,
        "falcon.attention.value_length": d,
        "falcon.feed_forward_length": ff,
        "falcon.rope.dimension_count": d,
        "falcon.rope.freq_base": hp["rope_base"],
        "falcon.attention.layer_norm_epsilon": hp["eps"],
        "falcon.vocab_size": v,
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": [f"<t{i}>" for i in range(v)],
        "tokenizer.ggml.scores": [0.0] * v,
        "tokenizer.ggml.token_type": [1] * v,
    }
    for k_, v_ in md.items():
        w.add_kv(k_, v_)
    for name, arr in wts.items():
        w.add_tensor(name, arr, ggml_type=GGMLType.F32)
    w.write()
    return wts


def ref_forward_falcon(wts, tokens, norm2=True):
    """Independent float64 reference for falcon-40B-style layers."""
    hp = FALCON_HP
    c, hq, hkv, d = hp["n_embd"], hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    L, eps = hp["n_layer"], hp["eps"]

    def ln(x, wv, bv):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * wv + bv

    def rope(x, pos):
        half = d // 2
        inv = hp["rope_base"] ** (-2.0 * np.arange(half) / d)
        th = pos[:, None] * inv[None, :]
        cos, sin = np.cos(th)[:, None, :], np.sin(th)[:, None, :]
        x1, x2 = x[..., :half], x[..., half:]
        return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    def gelu_tanh(g):
        return 0.5 * g * (1.0 + np.tanh(
            math.sqrt(2.0 / math.pi) * (g + 0.044715 * g ** 3)))

    T = len(tokens)
    x = wts["token_embd.weight"][tokens].astype(np.float64)
    pos = np.arange(T, dtype=np.float64)
    for i in range(L):
        p = f"blk.{i}."
        cur = ln(x, wts[p + "attn_norm.weight"], wts[p + "attn_norm.bias"])
        ffn_in = ln(x, wts[p + "attn_norm_2.weight"],
                    wts[p + "attn_norm_2.bias"]) if norm2 else cur
        qkv = cur @ wts[p + "attn_qkv.weight"].T
        q = qkv[:, : hq * d].reshape(T, hq, d)
        k = qkv[:, hq * d: (hq + hkv) * d].reshape(T, hkv, d)
        vv = qkv[:, (hq + hkv) * d:].reshape(T, hkv, d)
        q, k = rope(q, pos), rope(k, pos)
        g = hq // hkv
        out = np.zeros((T, hq, d))
        for h in range(hq):
            kh = k[:, h // g]
            logits = (q[:, h] @ kh.T) / math.sqrt(d)
            mask = np.tril(np.ones((T, T), bool))
            logits = np.where(mask, logits, -1e30)
            pr = np.exp(logits - logits.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            out[:, h] = pr @ vv[:, h // g]
        o = out.reshape(T, hq * d) @ wts[p + "attn_output.weight"].T
        u = ffn_in @ wts[p + "ffn_up.weight"].T
        ffn = gelu_tanh(u) @ wts[p + "ffn_down.weight"].T
        x = x + o + ffn
    x = ln(x, wts["output_norm.weight"], wts["output_norm.bias"])
    return x @ wts["output.weight"].T


@pytest.mark.parametrize("norm2", [True, False], ids=["40b", "7b"])
def test_falcon_prefill_matches_reference(tmp_path, norm2):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / f"f{norm2}.gguf")
    wts = make_tiny_falcon(path, norm2=norm2)
    tokens = [3, 17, 42, 9, 88, 123, 6, 54]
    ref = ref_forward_falcon(wts, tokens, norm2=norm2)
    m = Model(path)
    assert m.hp.parallel_residual and m.hp.norm_type == "ln"
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    assert nmse(ref, got) < 2e-3, nmse(ref, got)
    assert np.argmax(ref[-1]) == np.argmax(got[-1])


def test_falcon_decode_matches_prefill(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "fd.gguf")
    make_tiny_falcon(path)
    m = Model(path)
    tokens = [3, 17, 42, 9, 88]
    ctx_a = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    ref = ctx_a.prefill(ctx_a.new_seq(), tokens, all_logits=True)
    ctx_b = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    s = ctx_b.new_seq()
    ctx_b.prefill(s, tokens[:1])
    rows = [ctx_b.decode([s], [t])[0] for t in tokens[1:]]
    assert nmse(np.stack(rows), ref[1:]) < 1e-4


# ---------------------------------------------------------------------------
# qwen2moe: routed experts WITHOUT top-k renormalization + sigmoid-gated
# shared expert (reference llm_build_qwen2moe, llama-model.cpp:6104-6225)


QMOE_HP = dict(n_vocab=199, n_embd=64, n_head=4, n_head_kv=2, head_dim=16,
               n_ff=96, n_layer=2, n_expert=4, n_expert_used=2,
               n_ff_shexp=80, eps=1e-5, rope_base=10000.0)


def make_tiny_qwen2moe(path, seed=0):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from llama_cpp_test_tpu.gguf.writer import GGUFWriter

    rng = np.random.default_rng(seed)
    hp = QMOE_HP
    c, hq, hkv, d = hp["n_embd"], hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    v, ff, L, E = hp["n_vocab"], hp["n_ff"], hp["n_layer"], hp["n_expert"]
    ffs = hp["n_ff_shexp"]

    def rand(*shape, s=0.08):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    wts = {
        "token_embd.weight": rand(v, c, s=0.3),
        "output_norm.weight": 1.0 + rand(c, s=0.05),
        "output.weight": rand(v, c, s=0.2),
    }
    for i in range(L):
        p = f"blk.{i}."
        wts.update({
            p + "attn_norm.weight": 1.0 + rand(c, s=0.05),
            p + "attn_q.weight": rand(hq * d, c),
            p + "attn_q.bias": rand(hq * d),
            p + "attn_k.weight": rand(hkv * d, c),
            p + "attn_k.bias": rand(hkv * d),
            p + "attn_v.weight": rand(hkv * d, c),
            p + "attn_v.bias": rand(hkv * d),
            p + "attn_output.weight": rand(c, hq * d),
            p + "ffn_norm.weight": 1.0 + rand(c, s=0.05),
            p + "ffn_gate_inp.weight": rand(E, c),
            p + "ffn_gate_exps.weight": rand(E, ff, c),
            p + "ffn_up_exps.weight": rand(E, ff, c),
            p + "ffn_down_exps.weight": rand(E, c, ff),
            p + "ffn_gate_inp_shexp.weight": rand(c),
            p + "ffn_gate_shexp.weight": rand(ffs, c),
            p + "ffn_up_shexp.weight": rand(ffs, c),
            p + "ffn_down_shexp.weight": rand(c, ffs),
        })
    w = GGUFWriter(path, arch="qwen2moe")
    md = {
        "qwen2moe.context_length": 256,
        "qwen2moe.embedding_length": c,
        "qwen2moe.block_count": L,
        "qwen2moe.attention.head_count": hq,
        "qwen2moe.attention.head_count_kv": hkv,
        "qwen2moe.attention.key_length": d,
        "qwen2moe.attention.value_length": d,
        "qwen2moe.feed_forward_length": ff,
        "qwen2moe.expert_count": E,
        "qwen2moe.expert_used_count": hp["n_expert_used"],
        "qwen2moe.rope.dimension_count": d,
        "qwen2moe.rope.freq_base": hp["rope_base"],
        "qwen2moe.attention.layer_norm_rms_epsilon": hp["eps"],
        "qwen2moe.vocab_size": v,
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": [f"<t{i}>" for i in range(v)],
        "tokenizer.ggml.scores": [0.0] * v,
        "tokenizer.ggml.token_type": [1] * v,
    }
    from llama_cpp_test_tpu.gguf.constants import GGMLType as GT
    for k_, v_ in md.items():
        w.add_kv(k_, v_)
    for name, arr in wts.items():
        w.add_tensor(name, arr, ggml_type=GT.F32)
    w.write()
    return wts


def ref_forward_qwen2moe(wts, tokens):
    hp = QMOE_HP
    c, hq, hkv, d = hp["n_embd"], hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    L, E, ku, eps = hp["n_layer"], hp["n_expert"], hp["n_expert_used"], hp["eps"]

    def rms(x, wv):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * wv

    def rope(x, pos):
        half = d // 2
        inv = hp["rope_base"] ** (-2.0 * np.arange(half) / d)
        th = pos[:, None] * inv[None, :]
        cos, sin = np.cos(th)[:, None, :], np.sin(th)[:, None, :]
        x1, x2 = x[..., :half], x[..., half:]
        return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    silu = lambda x: x / (1 + np.exp(-x))
    T = len(tokens)
    x = wts["token_embd.weight"][tokens].astype(np.float64)
    pos = np.arange(T, dtype=np.float64)
    for i in range(L):
        p = f"blk.{i}."
        cur = rms(x, wts[p + "attn_norm.weight"])
        q = (cur @ wts[p + "attn_q.weight"].T +
             wts[p + "attn_q.bias"]).reshape(T, hq, d)
        k = (cur @ wts[p + "attn_k.weight"].T +
             wts[p + "attn_k.bias"]).reshape(T, hkv, d)
        vv = (cur @ wts[p + "attn_v.weight"].T +
              wts[p + "attn_v.bias"]).reshape(T, hkv, d)
        q, k = rope(q, pos), rope(k, pos)
        g = hq // hkv
        out = np.zeros((T, hq, d))
        for h in range(hq):
            lg = (q[:, h] @ k[:, h // g].T) / math.sqrt(d)
            mask = np.tril(np.ones((T, T), bool))
            lg = np.where(mask, lg, -1e30)
            pr = np.exp(lg - lg.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            out[:, h] = pr @ vv[:, h // g]
        x = x + out.reshape(T, hq * d) @ wts[p + "attn_output.weight"].T
        cur = rms(x, wts[p + "ffn_norm.weight"])
        router = cur @ wts[p + "ffn_gate_inp.weight"].T
        probs = np.exp(router - router.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        ffn = np.zeros_like(cur)
        for t in range(T):
            top = np.argsort(-probs[t])[:ku]
            for e in top:
                ge = silu(cur[t] @ wts[p + "ffn_gate_exps.weight"][e].T)
                ue = cur[t] @ wts[p + "ffn_up_exps.weight"][e].T
                ye = (ge * ue) @ wts[p + "ffn_down_exps.weight"][e].T
                ffn[t] += probs[t, e] * ye   # NO top-k renormalization
        gate = 1 / (1 + np.exp(-(cur @ wts[p + "ffn_gate_inp_shexp.weight"])))
        gs = silu(cur @ wts[p + "ffn_gate_shexp.weight"].T)
        us = cur @ wts[p + "ffn_up_shexp.weight"].T
        sh = (gs * us) @ wts[p + "ffn_down_shexp.weight"].T
        ffn = ffn + sh * gate[:, None]
        x = x + ffn
    x = rms(x, wts["output_norm.weight"])
    return x @ wts["output.weight"].T


def test_qwen2moe_prefill_matches_reference(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "qmoe.gguf")
    wts = make_tiny_qwen2moe(path)
    tokens = [3, 17, 42, 9, 88, 123]
    ref = ref_forward_qwen2moe(wts, tokens)
    m = Model(path)
    assert not m.hp.norm_topk
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    assert nmse(ref, got) < 2e-3, nmse(ref, got)
    assert np.argmax(ref[-1]) == np.argmax(got[-1])


def test_qwen2moe_decode_matches_prefill(tmp_path):
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "qmoe2.gguf")
    make_tiny_qwen2moe(path)
    m = Model(path)
    tokens = [3, 17, 42, 9, 88]
    ctx_a = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    ref = ctx_a.prefill(ctx_a.new_seq(), tokens, all_logits=True)
    ctx_b = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    s = ctx_b.new_seq()
    ctx_b.prefill(s, tokens[:1])
    rows = [ctx_b.decode([s], [t])[0] for t in tokens[1:]]
    assert nmse(np.stack(rows), ref[1:]) < 1e-4
