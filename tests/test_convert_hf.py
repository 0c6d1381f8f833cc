"""HF -> GGUF converter test: synthesize a tiny HF llama checkpoint
(config.json + safetensors + tokenizer.json), convert, load, and verify
logits against transformers' own forward pass."""
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
st = pytest.importorskip("safetensors.numpy")


def make_hf_llama(d, seed=0):
    rng = np.random.default_rng(seed)
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "hidden_size": 64,
        "intermediate_size": 96,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "num_hidden_layers": 2,
        "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "vocab_size": 256,
        "bos_token_id": 1,
        "eos_token_id": 2,
        "tie_word_embeddings": False,
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    def rand(*shape, s=0.08):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    ws = {
        "model.embed_tokens.weight": rand(256, 64, s=0.3),
        "model.norm.weight": 1.0 + rand(64, s=0.05),
        "lm_head.weight": rand(256, 64, s=0.2),
    }
    for i in range(2):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + rand(64, s=0.05),
            p + "self_attn.q_proj.weight": rand(64, 64),
            p + "self_attn.k_proj.weight": rand(32, 64),
            p + "self_attn.v_proj.weight": rand(32, 64),
            p + "self_attn.o_proj.weight": rand(64, 64),
            p + "post_attention_layernorm.weight": 1.0 + rand(64, s=0.05),
            p + "mlp.gate_proj.weight": rand(96, 64),
            p + "mlp.up_proj.weight": rand(96, 64),
            p + "mlp.down_proj.weight": rand(64, 96),
        })
    st.save_file(ws, os.path.join(d, "model.safetensors"))
    # BPE tokenizer.json with a byte-ish vocab
    vocab = {f"<t{i}>": i for i in range(256)}
    tj = {
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
        "added_tokens": [
            {"id": 1, "content": "<s>", "special": True},
            {"id": 2, "content": "</s>", "special": True},
        ],
    }
    with open(os.path.join(d, "tokenizer.json"), "w") as f:
        json.dump(tj, f)
    return cfg, ws


def test_convert_and_match_transformers(tmp_path):
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    cfg, ws = make_hf_llama(str(hf_dir))

    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "model.gguf")
    convert(str(hf_dir), out, dtype="F32")

    # reference logits from transformers
    from transformers import LlamaConfig, LlamaForCausalLM

    tcfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    hf = LlamaForCausalLM(tcfg)
    sd = {k: torch.from_numpy(v.copy()) for k, v in ws.items()}
    hf.load_state_dict(sd, strict=True)
    hf.eval()
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()

    from llama_cpp_test_tpu.runtime.engine import Context, Model

    model = Model(out)
    assert model.hp.n_layer == 2
    assert model.tokenizer is not None
    ctx = Context(model, n_ctx=64, n_seq_max=1, block_size=8)
    s = ctx.new_seq()
    ours = ctx.prefill(s, tokens, all_logits=True)

    denom = (ref.astype(np.float64) ** 2).mean() + 1e-12
    nmse = float(((ref - ours) ** 2).mean() / denom)
    assert nmse < 2e-3, nmse
    assert np.argmax(ref[-1]) == np.argmax(ours[-1])


def _bpe_tokenizer_json(d, n_vocab):
    vocab = {f"<t{i}>": i for i in range(n_vocab)}
    tj = {
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
        "added_tokens": [
            {"id": 1, "content": "<s>", "special": True},
            {"id": 2, "content": "</s>", "special": True},
        ],
    }
    with open(os.path.join(d, "tokenizer.json"), "w") as f:
        json.dump(tj, f)


def _convert_and_compare(tmp_path, cfg, ws, hf_cls, tcfg, tol=5e-3,
                         tokens=None, n_ctx=64, hf_weights=None):
    """hf_weights: separate weight dict for the transformers side (same
    values under that library's names) — used for llama-EQUIVALENCE
    validation of remote-code archs whose graph is llama's (qwen v1,
    exaone). hf_cls None defaults to LlamaForCausalLM."""
    if hf_cls is None:
        from transformers import LlamaForCausalLM as hf_cls  # noqa: N813
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir(exist_ok=True)
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), cfg["vocab_size"])

    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")

    hf = hf_cls(tcfg)
    hws = hf_weights if hf_weights is not None else ws
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in hws.items()},
        strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    if tokens is None:
        tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()

    from llama_cpp_test_tpu.runtime.engine import Context, Model

    model = Model(out)
    ctx = Context(model, n_ctx=n_ctx, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < tol, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])
    return model


def test_convert_phi2_matches_transformers(tmp_path):
    from transformers import PhiConfig, PhiForCausalLM

    rng = np.random.default_rng(1)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L, FF = 256, 64, 4, 2, 96
    cfg = {
        "architectures": ["PhiForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": H,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "layer_norm_eps": 1e-5, "rope_theta": 10000.0,
        "partial_rotary_factor": 0.5, "vocab_size": V,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.final_layernorm.weight": 1.0 + r(C),
        "model.final_layernorm.bias": r(C),
        "lm_head.weight": r(V, C), "lm_head.bias": r(V),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "input_layernorm.bias": r(C),
            p + "self_attn.q_proj.weight": r(C, C),
            p + "self_attn.q_proj.bias": r(C),
            p + "self_attn.k_proj.weight": r(C, C),
            p + "self_attn.k_proj.bias": r(C),
            p + "self_attn.v_proj.weight": r(C, C),
            p + "self_attn.v_proj.bias": r(C),
            p + "self_attn.dense.weight": r(C, C),
            p + "self_attn.dense.bias": r(C),
            p + "mlp.fc1.weight": r(FF, C), p + "mlp.fc1.bias": r(FF),
            p + "mlp.fc2.weight": r(C, FF), p + "mlp.fc2.bias": r(C),
        })
    tcfg = PhiConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=H,
        partial_rotary_factor=0.5, layer_norm_eps=1e-5,
        rope_theta=10000.0, attn_implementation="eager")
    _convert_and_compare(tmp_path, cfg, ws, PhiForCausalLM, tcfg)


def test_convert_falcon40b_matches_transformers(tmp_path):
    from transformers import FalconConfig, FalconForCausalLM

    rng = np.random.default_rng(2)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L = 256, 64, 4, 2, 2
    d = C // H
    cfg = {
        "architectures": ["FalconForCausalLM"],
        "hidden_size": C, "num_attention_heads": H,
        "num_kv_heads": KV, "new_decoder_architecture": True,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "layer_norm_epsilon": 1e-5, "rope_theta": 10000.0,
        "vocab_size": V, "bos_token_id": 1, "eos_token_id": 2,
        "parallel_attn": True, "bias": False, "alibi": False,
        "tie_word_embeddings": False,
    }
    ws = {
        "transformer.word_embeddings.weight": r(V, C),
        "transformer.ln_f.weight": 1.0 + r(C),
        "transformer.ln_f.bias": r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"transformer.h.{i}."
        ws.update({
            p + "ln_attn.weight": 1.0 + r(C), p + "ln_attn.bias": r(C),
            p + "ln_mlp.weight": 1.0 + r(C), p + "ln_mlp.bias": r(C),
            p + "self_attention.query_key_value.weight":
                r(KV * (H // KV + 2) * d, C),
            p + "self_attention.dense.weight": r(C, C),
            p + "mlp.dense_h_to_4h.weight": r(4 * C, C),
            p + "mlp.dense_4h_to_h.weight": r(C, 4 * C),
        })
    tcfg = FalconConfig(
        vocab_size=V, hidden_size=C, num_hidden_layers=L,
        num_attention_heads=H, num_kv_heads=KV,
        new_decoder_architecture=True, parallel_attn=True, bias=False,
        alibi=False, layer_norm_epsilon=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager")
    _convert_and_compare(tmp_path, cfg, ws, FalconForCausalLM, tcfg)


def test_convert_gemma_matches_transformers(tmp_path):
    from transformers import GemmaConfig, GemmaForCausalLM

    rng = np.random.default_rng(3)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF, D = 256, 64, 4, 2, 2, 96, 16
    cfg = {
        "architectures": ["GemmaForCausalLM"],
        "hidden_size": C, "intermediate_size": FF, "head_dim": D,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
        "vocab_size": V, "bos_token_id": 1, "eos_token_id": 2,
        "tie_word_embeddings": True, "hidden_act": "gelu_pytorch_tanh",
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": r(C),   # HF gemma stores w-1
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": r(C),
            p + "self_attn.q_proj.weight": r(H * D, C),
            p + "self_attn.k_proj.weight": r(KV * D, C),
            p + "self_attn.v_proj.weight": r(KV * D, C),
            p + "self_attn.o_proj.weight": r(C, H * D),
            p + "post_attention_layernorm.weight": r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = GemmaConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF, head_dim=D,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=True,
        hidden_act="gelu_pytorch_tanh", attn_implementation="eager")
    _convert_and_compare(tmp_path, cfg, ws, GemmaForCausalLM, tcfg)


def test_convert_qwen3_matches_transformers(tmp_path):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    rng = np.random.default_rng(4)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF, D = 256, 64, 4, 2, 2, 96, 16
    cfg = {
        "architectures": ["Qwen3ForCausalLM"],
        "hidden_size": C, "intermediate_size": FF, "head_dim": D,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
        "vocab_size": V, "bos_token_id": 1, "eos_token_id": 2,
        "tie_word_embeddings": False,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * D, C),
            p + "self_attn.k_proj.weight": r(KV * D, C),
            p + "self_attn.v_proj.weight": r(KV * D, C),
            p + "self_attn.o_proj.weight": r(C, H * D),
            p + "self_attn.q_norm.weight": 1.0 + r(D),
            p + "self_attn.k_norm.weight": 1.0 + r(D),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = Qwen3Config(
        vocab_size=V, hidden_size=C, intermediate_size=FF, head_dim=D,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager")
    _convert_and_compare(tmp_path, cfg, ws, Qwen3ForCausalLM, tcfg)


def test_convert_falcon7b_multiquery_matches_transformers(tmp_path):
    """Old-architecture falcon (7B style): multi-query attention, single
    input_layernorm feeding both parallel branches, no qkv de-interleave."""
    from transformers import FalconConfig, FalconForCausalLM

    rng = np.random.default_rng(5)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L = 256, 64, 4, 2
    d = C // H
    cfg = {
        "architectures": ["FalconForCausalLM"],
        "hidden_size": C, "num_attention_heads": H,
        "multi_query": True, "new_decoder_architecture": False,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "layer_norm_epsilon": 1e-5, "rope_theta": 10000.0,
        "vocab_size": V, "bos_token_id": 1, "eos_token_id": 2,
        "parallel_attn": True, "bias": False, "alibi": False,
        "tie_word_embeddings": False,
    }
    ws = {
        "transformer.word_embeddings.weight": r(V, C),
        "transformer.ln_f.weight": 1.0 + r(C),
        "transformer.ln_f.bias": r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"transformer.h.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "input_layernorm.bias": r(C),
            # old arch: [all q; k; v] rows already
            p + "self_attention.query_key_value.weight": r((H + 2) * d, C),
            p + "self_attention.dense.weight": r(C, C),
            p + "mlp.dense_h_to_4h.weight": r(4 * C, C),
            p + "mlp.dense_4h_to_h.weight": r(C, 4 * C),
        })
    tcfg = FalconConfig(
        vocab_size=V, hidden_size=C, num_hidden_layers=L,
        num_attention_heads=H, multi_query=True,
        new_decoder_architecture=False, parallel_attn=True, bias=False,
        alibi=False, layer_norm_epsilon=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager")
    _convert_and_compare(tmp_path, cfg, ws, FalconForCausalLM, tcfg)


def test_convert_qwen2moe_matches_transformers(tmp_path):
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    rng = np.random.default_rng(7)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, E, FFE, FFS = 256, 64, 4, 2, 2, 4, 48, 80
    cfg = {
        "architectures": ["Qwen2MoeForCausalLM"],
        "hidden_size": C, "intermediate_size": 96,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "num_experts": E, "num_experts_per_tok": 2,
        "moe_intermediate_size": FFE,
        "shared_expert_intermediate_size": FFS,
        "decoder_sparse_step": 1, "norm_topk_prob": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    d = C // H
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.q_proj.bias": r(H * d),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.k_proj.bias": r(KV * d),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.bias": r(KV * d),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate.weight": r(E, C),
            p + "mlp.shared_expert.gate_proj.weight": r(FFS, C),
            p + "mlp.shared_expert.up_proj.weight": r(FFS, C),
            p + "mlp.shared_expert.down_proj.weight": r(C, FFS),
            p + "mlp.shared_expert_gate.weight": r(1, C),
        })
        for e in range(E):
            q = p + f"mlp.experts.{e}."
            ws.update({
                q + "gate_proj.weight": r(FFE, C),
                q + "up_proj.weight": r(FFE, C),
                q + "down_proj.weight": r(C, FFE),
            })
    tcfg = Qwen2MoeConfig(
        vocab_size=V, hidden_size=C, intermediate_size=96,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        num_experts=E, num_experts_per_tok=2, moe_intermediate_size=FFE,
        shared_expert_intermediate_size=FFS, decoder_sparse_step=1,
        norm_topk_prob=False, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, Qwen2MoeForCausalLM, tcfg)
    assert m.hp.arch == "qwen2moe" and m.hp.n_expert == E


def test_convert_qwen3moe_matches_transformers(tmp_path):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    rng = np.random.default_rng(8)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, E, FFE = 256, 64, 4, 2, 2, 4, 48
    d = 16
    cfg = {
        "architectures": ["Qwen3MoeForCausalLM"],
        "hidden_size": C, "intermediate_size": 96, "head_dim": d,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "num_experts": E, "num_experts_per_tok": 2,
        "moe_intermediate_size": FFE, "decoder_sparse_step": 1,
        "norm_topk_prob": True,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "self_attn.q_norm.weight": 1.0 + r(d),
            p + "self_attn.k_norm.weight": 1.0 + r(d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate.weight": r(E, C),
        })
        for e in range(E):
            q = p + f"mlp.experts.{e}."
            ws.update({
                q + "gate_proj.weight": r(FFE, C),
                q + "up_proj.weight": r(FFE, C),
                q + "down_proj.weight": r(C, FFE),
            })
    tcfg = Qwen3MoeConfig(
        vocab_size=V, hidden_size=C, intermediate_size=96, head_dim=d,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        num_experts=E, num_experts_per_tok=2, moe_intermediate_size=FFE,
        decoder_sparse_step=1, norm_topk_prob=True, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, Qwen3MoeForCausalLM, tcfg)
    assert m.hp.arch == "qwen3moe"


def test_convert_phi3_matches_transformers(tmp_path):
    from transformers import Phi3Config, Phi3ForCausalLM

    rng = np.random.default_rng(9)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["Phi3ForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.qkv_proj.weight": r((H + 2 * KV) * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_up_proj.weight": r(2 * FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = Phi3Config(
        pad_token_id=0,
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, Phi3ForCausalLM, tcfg)
    assert m.hp.arch == "phi3"


def test_convert_phi3_longrope_matches_transformers(tmp_path):
    """Longrope (su) scaling: factor tensors + attn factor + per-context
    long/short table selection (reference Phi3MiniModel
    generate_extra_tensors / llama-model.cpp:11434-11445)."""
    from transformers import Phi3Config, Phi3ForCausalLM

    rng = np.random.default_rng(11)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    orig_ctx, max_ctx = 16, 64
    long_f = (1.0 + rng.uniform(0.5, 4.0, d // 2)).astype(np.float32)
    short_f = (1.0 + rng.uniform(0.0, 0.2, d // 2)).astype(np.float32)
    rope_scaling = {"type": "longrope",
                    "long_factor": [float(x) for x in long_f],
                    "short_factor": [float(x) for x in short_f]}
    cfg = {
        "architectures": ["Phi3ForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L,
        "max_position_embeddings": max_ctx,
        "original_max_position_embeddings": orig_ctx,
        "rope_scaling": rope_scaling,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.qkv_proj.weight": r((H + 2 * KV) * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_up_proj.weight": r(2 * FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = Phi3Config(
        pad_token_id=0,
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        max_position_embeddings=max_ctx,
        original_max_position_embeddings=orig_ctx,
        rope_scaling=rope_scaling,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager")
    # short branch: sequence and n_ctx both within the pretraining window
    m = _convert_and_compare(tmp_path, cfg, ws, Phi3ForCausalLM, tcfg,
                             tokens=[3, 17, 42, 9, 150, 7], n_ctx=orig_ctx)
    assert m.hp.rope_scaling == "longrope"
    assert m.hp.rope_orig_ctx == orig_ctx
    assert m.hp.rope_attn_factor > 1.0
    assert m.weights.rope_inv_freq_long is not None
    # long branch: n_ctx > orig on our side; transformers flips to long
    # factors because max(position_ids)+1 > original_max_position_embeddings
    long_toks = [int(x) for x in rng.integers(3, V, 20)]
    _convert_and_compare(tmp_path, cfg, ws, Phi3ForCausalLM, tcfg,
                         tokens=long_toks, n_ctx=max_ctx)


def test_convert_granite_matches_transformers(tmp_path):
    from transformers import GraniteConfig, GraniteForCausalLM

    rng = np.random.default_rng(12)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    mults = dict(attention_multiplier=0.25, embedding_multiplier=2.0,
                 residual_multiplier=0.5, logits_scaling=4.0)
    cfg = {
        "architectures": ["GraniteForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "bos_token_id": 1, "eos_token_id": 2, **mults,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = GraniteConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager", **mults,
    )
    m = _convert_and_compare(tmp_path, cfg, ws, GraniteForCausalLM, tcfg)
    assert m.hp.arch == "granite"
    assert m.hp.residual_scale == 0.5 and m.hp.logits_scale == 4.0


def test_convert_stablelm_matches_transformers(tmp_path):
    from transformers import StableLmConfig, StableLmForCausalLM

    rng = np.random.default_rng(15)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["StableLmForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "layer_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "partial_rotary_factor": 0.25, "use_qkv_bias": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "model.norm.bias": r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "input_layernorm.bias": r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "post_attention_layernorm.bias": r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = StableLmConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        layer_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        partial_rotary_factor=0.25, use_qkv_bias=False,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, StableLmForCausalLM, tcfg)
    assert m.hp.arch == "stablelm"
    assert m.hp.norm_type == "ln" and m.hp.rope_dim == d // 4


def _stablelm_fixture(seed, parallel, qk_layernorm):
    """Shared synthetic StableLM checkpoint across the variant axes
    (per-head qk LayerNorms; use_parallel_residual a la StableLM-2-12B)."""
    from transformers import StableLmConfig

    rng = np.random.default_rng(seed)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["StableLmForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "layer_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "partial_rotary_factor": 0.25, "use_qkv_bias": False,
        "qk_layernorm": qk_layernorm,
        "use_parallel_residual": parallel,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "model.norm.bias": r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "input_layernorm.bias": r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
        if not parallel:
            ws.update({
                p + "post_attention_layernorm.weight": 1.0 + r(C),
                p + "post_attention_layernorm.bias": r(C),
            })
        if qk_layernorm:
            for j in range(H):
                ws[p + f"self_attn.q_layernorm.norms.{j}.weight"] = \
                    1.0 + r(d)
            for j in range(KV):
                ws[p + f"self_attn.k_layernorm.norms.{j}.weight"] = \
                    1.0 + r(d)
    tcfg = StableLmConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        layer_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        partial_rotary_factor=0.25, use_qkv_bias=False,
        qk_layernorm=qk_layernorm, use_parallel_residual=parallel,
        attn_implementation="eager",
    )
    return cfg, ws, tcfg


def _patched_stablelm(tcfg):
    """StableLmForCausalLM factory working around a transformers init bug:
    _init_weights assumes every nn.LayerNorm has a bias, but the per-head
    qk norms are built with bias=False."""
    import torch.nn as nn
    from transformers.models.stablelm import modeling_stablelm as ms

    orig = ms.StableLmPreTrainedModel._init_weights

    def safe(self, module):
        if isinstance(module, nn.LayerNorm) and module.bias is None:
            module.weight.data.fill_(1.0)
            return
        orig(self, module)

    ms.StableLmPreTrainedModel._init_weights = safe
    try:
        return ms.StableLmForCausalLM(tcfg)
    finally:
        ms.StableLmPreTrainedModel._init_weights = orig


def test_convert_stablelm_qk_layernorm_matches_transformers(tmp_path):
    """Distinct per-head LayerNorms stacked to [H, d] (reference
    StableLMModel._stack_qk_norm; llm_build_stablelm LLM_NORM on the
    head-split view)."""
    cfg, ws, tcfg = _stablelm_fixture(21, parallel=False, qk_layernorm=True)
    m = _convert_and_compare(tmp_path, cfg, ws, _patched_stablelm, tcfg)
    assert m.weights.layers[0].attn_q_norm.shape == (4, 16)
    assert m.weights.layers[0].attn_k_norm.shape == (2, 16)
    assert not m.hp.parallel_residual


def test_convert_stablelm_parallel_residual_matches_transformers(tmp_path):
    """StableLM-2-12B layout: parallel residual (no post-attention norm,
    FFN fed from the attn norm) plus per-head qk LayerNorms (reference
    llm_build_stablelm's ffn_norm-absent branch)."""
    cfg, ws, tcfg = _stablelm_fixture(22, parallel=True, qk_layernorm=True)
    m = _convert_and_compare(tmp_path, cfg, ws, _patched_stablelm, tcfg)
    assert m.hp.parallel_residual
    assert m.weights.layers[0].ffn_norm is None


def test_convert_olmo2_matches_transformers(tmp_path):
    from transformers import Olmo2Config, Olmo2ForCausalLM

    rng = np.random.default_rng(16)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["Olmo2ForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "self_attn.q_norm.weight": 1.0 + r(H * d),
            p + "self_attn.k_norm.weight": 1.0 + r(KV * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "post_feedforward_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = Olmo2Config(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, Olmo2ForCausalLM, tcfg)
    assert m.hp.arch == "olmo2"


def test_convert_olmoe_matches_transformers(tmp_path):
    from transformers import OlmoeConfig, OlmoeForCausalLM

    rng = np.random.default_rng(17)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, E, FFE = 256, 64, 4, 2, 2, 4, 48
    d = C // H
    cfg = {
        "architectures": ["OlmoeForCausalLM"],
        "hidden_size": C, "intermediate_size": FFE,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "num_experts": E, "num_experts_per_tok": 2,
        "norm_topk_prob": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "self_attn.q_norm.weight": 1.0 + r(H * d),
            p + "self_attn.k_norm.weight": 1.0 + r(KV * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate.weight": r(E, C),
        })
        for e in range(E):
            q = p + f"mlp.experts.{e}."
            ws.update({
                q + "gate_proj.weight": r(FFE, C),
                q + "up_proj.weight": r(FFE, C),
                q + "down_proj.weight": r(C, FFE),
            })
    tcfg = OlmoeConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FFE,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        num_experts=E, num_experts_per_tok=2, norm_topk_prob=False,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, OlmoeForCausalLM, tcfg)
    assert m.hp.arch == "olmoe" and m.hp.n_expert == E


def test_convert_commandr_matches_transformers(tmp_path):
    from transformers import CohereConfig, CohereForCausalLM

    rng = np.random.default_rng(18)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["CohereForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "layer_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "logit_scale": 0.25, "tie_word_embeddings": False,
        "use_qk_norm": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = CohereConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        layer_norm_eps=1e-5, rope_theta=10000.0, logit_scale=0.25,
        tie_word_embeddings=False, use_qk_norm=False,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, CohereForCausalLM, tcfg)
    assert m.hp.arch == "command-r"
    assert m.hp.parallel_residual and m.hp.norm_type == "ln"


def test_convert_commandr_qk_norm_matches_transformers(tmp_path):
    """Command R+ use_qk_norm: distinct per-head LayerNorms [H, d]/[KV, d]
    before rope on the parallel-residual family (reference
    llm_build_command_r:8044-8067). The weights must also survive the
    within-head interleaved->half-split load permutation."""
    from transformers import CohereConfig, CohereForCausalLM

    rng = np.random.default_rng(23)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["CohereForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "layer_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "logit_scale": 0.25, "tie_word_embeddings": False,
        "use_qk_norm": True,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "self_attn.q_norm.weight": 1.0 + r(H, d),
            p + "self_attn.k_norm.weight": 1.0 + r(KV, d),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = CohereConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        layer_norm_eps=1e-5, rope_theta=10000.0, logit_scale=0.25,
        tie_word_embeddings=False, use_qk_norm=True,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, CohereForCausalLM, tcfg)
    assert m.weights.layers[0].attn_q_norm.shape == (H, d)
    assert m.weights.layers[0].attn_k_norm.shape == (KV, d)


def test_convert_starcoder2_matches_transformers(tmp_path):
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    rng = np.random.default_rng(19)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["Starcoder2ForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "norm_epsilon": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "use_bias": True, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "model.norm.bias": r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "input_layernorm.bias": r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.q_proj.bias": r(H * d),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.k_proj.bias": r(KV * d),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.bias": r(KV * d),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "self_attn.o_proj.bias": r(C),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "post_attention_layernorm.bias": r(C),
            p + "mlp.c_fc.weight": r(FF, C),
            p + "mlp.c_fc.bias": r(FF),
            p + "mlp.c_proj.weight": r(C, FF),
            p + "mlp.c_proj.bias": r(C),
        })
    tcfg = Starcoder2Config(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        norm_epsilon=1e-5, rope_theta=10000.0, use_bias=True,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, Starcoder2ForCausalLM, tcfg)
    assert m.hp.arch == "starcoder2"
    assert m.hp.norm_type == "ln" and m.hp.act_fn == "gelu"


def test_convert_qwen2vl_text_matches_transformers(tmp_path):
    """Qwen2-VL text side: visual.* dropped (like the reference's
    Qwen2VLModel), model.language_model.* prefix rewritten, mrope sections
    recorded; text-only M-RoPE with equal position streams equals standard
    NEOX rope, so logits must match transformers exactly."""
    import torch
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    tcfg = Qwen2VLConfig(
        text_config=dict(
            hidden_size=C, intermediate_size=FF, num_hidden_layers=L,
            num_attention_heads=H, num_key_value_heads=KV, vocab_size=V,
            rope_theta=10000.0, max_position_embeddings=256,
            rms_norm_eps=1e-5, tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]}),
        vision_config=dict(depth=2, embed_dim=32, hidden_size=C,
                           num_heads=2, in_chans=3, spatial_merge_size=2),
        attn_implementation="eager")
    torch.manual_seed(7)
    hf = Qwen2VLForConditionalGeneration(tcfg)
    sd = hf.state_dict()
    rng = np.random.default_rng(24)
    ws = {}
    for k, v in sd.items():
        a = v.detach().numpy().astype(np.float32)
        if a.ndim >= 1 and ("proj" in k or "embed" in k or "lm_head" in k
                            or "mlp" in k):
            a = (rng.standard_normal(a.shape) * 0.08).astype(np.float32)
        elif "norm" in k and k.endswith("weight"):
            a = a + (rng.standard_normal(a.shape) * 0.05).astype(np.float32)
        ws[k] = a

    cfg = {
        "architectures": ["Qwen2VLForConditionalGeneration"],
        "vocab_size": V,
        "text_config": {
            "hidden_size": C, "intermediate_size": FF,
            "num_hidden_layers": L, "num_attention_heads": H,
            "num_key_value_heads": KV, "vocab_size": V,
            "rope_theta": 10000.0, "max_position_embeddings": 256,
            "rms_norm_eps": 1e-5,
            "rope_scaling": {"type": "mrope", "mrope_section": [4, 2, 2]},
        },
        "bos_token_id": 1, "eos_token_id": 2,
    }
    m = _convert_and_compare(
        tmp_path, cfg, ws,
        lambda c: Qwen2VLForConditionalGeneration(c), tcfg)
    assert m.hp.arch == "qwen2vl"
    md = m.reader.metadata
    assert list(md["qwen2vl.rope.dimension_sections"]) == [4, 2, 2, 0]


def test_convert_phi3_partial_rotary_matches_transformers(tmp_path):
    """Phi-4-mini class: partial_rotary_factor < 1 must reach
    rope.dimension_count (reference Phi3MiniModel: rope_dims =
    rot_pct * n_embd // n_head)."""
    from transformers import Phi3Config, Phi3ForCausalLM

    rng = np.random.default_rng(26)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["Phi3ForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "partial_rotary_factor": 0.5,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.qkv_proj.weight": r((H + 2 * KV) * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_up_proj.weight": r(2 * FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = Phi3Config(
        pad_token_id=0,
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        partial_rotary_factor=0.5,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager")
    m = _convert_and_compare(tmp_path, cfg, ws, Phi3ForCausalLM, tcfg)
    assert m.hp.rope_dim == d // 2


def test_convert_nemotron_matches_transformers(tmp_path):
    """Nemotron: LayerNorm1p (+1 folded at convert), non-gated squared-ReLU
    FFN, partial rotary (reference NemotronModel + llm_build_nemotron)."""
    from transformers import NemotronConfig, NemotronForCausalLM

    rng = np.random.default_rng(27)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["NemotronForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "partial_rotary_factor": 0.5, "hidden_act": "relu2",
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": r(C),        # layernorm1p: stored ~0-centered
        "model.norm.bias": r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": r(C),
            p + "input_layernorm.bias": r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": r(C),
            p + "post_attention_layernorm.bias": r(C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = NemotronConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        partial_rotary_factor=0.5, hidden_act="relu2",
        attn_implementation="eager")
    m = _convert_and_compare(tmp_path, cfg, ws, NemotronForCausalLM, tcfg)
    assert m.hp.arch == "nemotron"
    assert m.hp.act_fn == "relu2" and m.hp.norm_type == "ln"
    assert m.hp.rope_dim == d // 2


def _gptneox_fixture(seed, parallel):
    from transformers import GPTNeoXConfig

    rng = np.random.default_rng(seed)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L, FF = 256, 64, 4, 2, 96
    d = C // H
    cfg = {
        "architectures": ["GPTNeoXForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_hidden_layers": L,
        "max_position_embeddings": 256, "rotary_pct": 0.25,
        "layer_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "use_parallel_residual": parallel,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "gpt_neox.embed_in.weight": r(V, C),
        "gpt_neox.final_layer_norm.weight": 1.0 + r(C),
        "gpt_neox.final_layer_norm.bias": r(C),
        "embed_out.weight": r(V, C),
    }
    for i in range(L):
        p = f"gpt_neox.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "input_layernorm.bias": r(C),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "post_attention_layernorm.bias": r(C),
            p + "attention.query_key_value.weight": r(3 * C, C),
            p + "attention.query_key_value.bias": r(3 * C),
            p + "attention.dense.weight": r(C, C),
            p + "attention.dense.bias": r(C),
            p + "mlp.dense_h_to_4h.weight": r(FF, C),
            p + "mlp.dense_h_to_4h.bias": r(FF),
            p + "mlp.dense_4h_to_h.weight": r(C, FF),
            p + "mlp.dense_4h_to_h.bias": r(C),
        })
    tcfg = GPTNeoXConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, rotary_pct=0.25,
        layer_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        use_parallel_residual=parallel, attn_implementation="eager")
    return cfg, ws, tcfg


def test_convert_gptneox_parallel_matches_transformers(tmp_path):
    """Pythia layout: parallel residual with the dedicated ffn_norm on the
    layer input, interleaved fused qkv deinterleaved at convert (reference
    GPTNeoXModel + llm_build_gptneox)."""
    from transformers import GPTNeoXForCausalLM

    cfg, ws, tcfg = _gptneox_fixture(28, parallel=True)
    m = _convert_and_compare(tmp_path, cfg, ws, GPTNeoXForCausalLM, tcfg)
    assert m.hp.arch == "gptneox" and m.hp.parallel_residual
    assert m.hp.rope_dim == 4  # rotary_pct 0.25 of d=16


def test_convert_gptneox_sequential_matches_transformers(tmp_path):
    """use_parallel_residual=False routes through the sequential family."""
    from transformers import GPTNeoXForCausalLM

    cfg, ws, tcfg = _gptneox_fixture(29, parallel=False)
    m = _convert_and_compare(tmp_path, cfg, ws, GPTNeoXForCausalLM, tcfg)
    assert not m.hp.parallel_residual


def test_convert_olmo_matches_transformers(tmp_path):
    """OLMo-1: non-parametric LayerNorms (no norm tensors in the
    checkpoint or the GGUF) + clip_qkv clamping (reference OlmoModel +
    llm_build_olmo's NULL-weight build_norm and ggml_clamp)."""
    from transformers import OlmoConfig, OlmoForCausalLM

    rng = np.random.default_rng(30)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["OlmoForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rope_theta": 10000.0, "vocab_size": V, "clip_qkv": 0.05,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = OlmoConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        rope_theta=10000.0, tie_word_embeddings=False, clip_qkv=0.05,
        attn_implementation="eager")
    m = _convert_and_compare(tmp_path, cfg, ws, OlmoForCausalLM, tcfg)
    assert m.hp.arch == "olmo" and m.hp.norm_type == "ln"
    assert abs(m.hp.clamp_kqv - 0.05) < 1e-6
    assert m.weights.layers[0].attn_norm is None
    assert m.weights.output_norm is None


def _deepseek_ws(rng, cfg, q_lora=None):
    """Synthesize DeepseekV2 HF weights for the given tiny config."""
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, L = cfg["vocab_size"], cfg["hidden_size"], cfg["num_hidden_layers"]
    H = cfg["num_attention_heads"]
    dk = cfg["qk_nope_head_dim"] + cfg["qk_rope_head_dim"]
    dv = cfg["v_head_dim"]
    kvr = cfg["kv_lora_rank"]
    E, FFE = cfg["n_routed_experts"], cfg["moe_intermediate_size"]
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "self_attn.kv_a_proj_with_mqa.weight":
                r(kvr + cfg["qk_rope_head_dim"], C),
            p + "self_attn.kv_a_layernorm.weight": 1.0 + r(kvr),
            p + "self_attn.kv_b_proj.weight":
                r(H * (cfg["qk_nope_head_dim"] + dv), kvr),
            p + "self_attn.o_proj.weight": r(C, H * dv),
        })
        if q_lora:
            ws.update({
                p + "self_attn.q_a_proj.weight": r(q_lora, C),
                p + "self_attn.q_a_layernorm.weight": 1.0 + r(q_lora),
                p + "self_attn.q_b_proj.weight": r(H * dk, q_lora),
            })
        else:
            ws[p + "self_attn.q_proj.weight"] = r(H * dk, C)
        if i < cfg["first_k_dense_replace"]:
            ws.update({
                p + "mlp.gate_proj.weight": r(cfg["intermediate_size"], C),
                p + "mlp.up_proj.weight": r(cfg["intermediate_size"], C),
                p + "mlp.down_proj.weight": r(C, cfg["intermediate_size"]),
            })
        else:
            ws[p + "mlp.gate.weight"] = r(E, C)
            nsh = cfg["n_shared_experts"]
            ws.update({
                p + "mlp.shared_experts.gate_proj.weight": r(FFE * nsh, C),
                p + "mlp.shared_experts.up_proj.weight": r(FFE * nsh, C),
                p + "mlp.shared_experts.down_proj.weight": r(C, FFE * nsh),
            })
            for e in range(E):
                q = p + f"mlp.experts.{e}."
                ws.update({
                    q + "gate_proj.weight": r(FFE, C),
                    q + "up_proj.weight": r(FFE, C),
                    q + "down_proj.weight": r(C, FFE),
                })
    return ws


def _deepseek_cfg(q_lora=None, rope_scaling=None):
    return {
        "architectures": ["DeepseekV2ForCausalLM"],
        "hidden_size": 64, "intermediate_size": 96,
        "num_attention_heads": 4, "num_key_value_heads": 4,
        "num_hidden_layers": 3, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": 256,
        "qk_nope_head_dim": 16, "qk_rope_head_dim": 8, "v_head_dim": 12,
        "kv_lora_rank": 32, "q_lora_rank": q_lora,
        "first_k_dense_replace": 1, "n_routed_experts": 4,
        "num_experts_per_tok": 2, "moe_intermediate_size": 48,
        "n_shared_experts": 2, "routed_scaling_factor": 2.5,
        "norm_topk_prob": False, "scoring_func": "softmax",
        "topk_method": "greedy", "n_group": 1, "topk_group": 1,
        "aux_loss_alpha": 0.0, "seq_aux": False,
        "attention_bias": False, "rope_scaling": rope_scaling,
        "bos_token_id": 1, "eos_token_id": 2,
    }


def test_convert_deepseek2_lite_matches_transformers(tmp_path):
    """DeepSeek-V2-Lite shape: plain wq (no q lora), MLA kv compression,
    1 dense lead + MoE layers with ungated shared experts and
    routed_scaling_factor (reference llm_build_deepseek2 is_lite path)."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = _deepseek_cfg()
    ws = _deepseek_ws(np.random.default_rng(21), cfg)
    tcfg = DeepseekV2Config(
        **{k: v for k, v in cfg.items() if k != "architectures"},
        tie_word_embeddings=False, attn_implementation="eager")
    m = _convert_and_compare(tmp_path, cfg, ws, DeepseekV2ForCausalLM, tcfg)
    assert m.hp.arch == "deepseek2"
    assert m.hp.head_dim == 24 and m.hp.v_dim == 12
    assert m.hp.n_lora_kv == 32 and m.hp.n_lora_q == 0
    assert m.hp.n_layer_dense_lead == 1 and m.hp.n_expert_shared == 2
    assert abs(m.hp.expert_weights_scale - 2.5) < 1e-6
    assert m.weights.layers[0].gate_inp is None       # dense lead
    assert m.weights.layers[1].gate_inp is not None   # MoE
    assert m.weights.layers[1].up_shexp is not None
    assert m.weights.layers[1].gate_inp_shexp is None  # ungated shared


def test_convert_deepseek2_qlora_yarn_matches_transformers(tmp_path):
    """Big-model shape: q_a/q_b low-rank q + yarn rope with mscale_all_dim.

    The yarn attention magnitude: the reference (llama-model.cpp:9216-9220,
    matching DeepSeek's original modeling code) folds
    mscale^2 = (1 + 0.1*mscale_all_dim*ln(factor))^2 into the softmax
    scale. transformers' NATIVE DeepseekV2 port does NOT (its
    attention_scaling ratio is 1 when mscale == mscale_all_dim and
    self.scaling stays qk_head_dim**-0.5) — a known divergence from the
    original trust_remote_code implementation. The HF reference here is
    patched to the original semantics before comparing."""
    import math as _math

    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    factor, msad = 8.0, 0.707
    rs = {"type": "yarn", "factor": factor,
          "original_max_position_embeddings": 32,
          "beta_fast": 32.0, "beta_slow": 1.0,
          "mscale": msad, "mscale_all_dim": msad}
    cfg = _deepseek_cfg(q_lora=24, rope_scaling=rs)
    ws = _deepseek_ws(np.random.default_rng(22), cfg, q_lora=24)

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir(exist_ok=True)
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), cfg["vocab_size"])

    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")

    tcfg = DeepseekV2Config(
        **{k: v for k, v in cfg.items() if k != "architectures"},
        tie_word_embeddings=False, attn_implementation="eager")
    hf = DeepseekV2ForCausalLM(tcfg)
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in ws.items()}, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    m2 = (1.0 + 0.1 * msad * _math.log(factor)) ** 2
    for lyr in hf.model.layers:
        lyr.self_attn.scaling = m2 / _math.sqrt(24)  # original semantics
    hf.eval()
    tokens = [3, 17, 42, 9, 150, 7, 88, 201]
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()

    from llama_cpp_test_tpu.runtime.engine import Context, Model

    model = Model(out)
    assert model.hp.n_lora_q == 24
    assert abs(model.hp.rope_yarn_log_mul - 0.1 * msad) < 1e-6
    assert abs(model.hp.attn_scale - m2 / _math.sqrt(24)) < 1e-6
    ctx = Context(model, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_deepseek2_e2e_greedy_decode_matches_transformers(tmp_path):
    """Full engine decode loop (prefill + paged-KV greedy steps) vs HF
    greedy generation on the converted DeepSeek-V2-Lite-shaped model."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = _deepseek_cfg()
    ws = _deepseek_ws(np.random.default_rng(23), cfg)
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir(exist_ok=True)
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), cfg["vocab_size"])

    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")

    tcfg = DeepseekV2Config(
        **{k: v for k, v in cfg.items() if k != "architectures"},
        tie_word_embeddings=False, attn_implementation="eager")
    hf = DeepseekV2ForCausalLM(tcfg)
    hf.load_state_dict({k: torch.from_numpy(v.copy())
                        for k, v in ws.items()}, strict=False)
    hf.eval()
    prompt = [3, 17, 42, 9]
    # 6 steps: step 8 of this random tiny model hits a near-tied logit
    # pair and flips on f32 summation order; 6 is stably separated
    n_new = 6
    with torch.no_grad():
        ref = hf.generate(torch.tensor([prompt]), max_new_tokens=n_new,
                          do_sample=False, eos_token_id=None,
                          pad_token_id=0)[0].tolist()[len(prompt):]

    from llama_cpp_test_tpu.runtime.engine import Context, Model, generate

    model = Model(out)
    ctx = Context(model, n_ctx=64, n_seq_max=1, block_size=8)
    got = list(generate(ctx, prompt, n_new))
    assert got == ref, (got, ref)


def test_convert_bert_matches_transformers(tmp_path):
    """bert embedding-class encoder: post-norm layers, learned positions,
    token-type row, bidirectional attention, CLS/mean pooled embeddings
    cross-validated against transformers BertModel hidden states."""
    from transformers import BertConfig, BertModel

    rng = np.random.default_rng(31)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L, FF, P = 128, 64, 4, 2, 96, 64
    cfg = {
        "architectures": ["BertModel"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_hidden_layers": L,
        "max_position_embeddings": P, "vocab_size": V,
        "layer_norm_eps": 1e-12, "hidden_act": "gelu",
        "type_vocab_size": 2, "pad_token_id": 0,
    }
    ws = {
        "embeddings.word_embeddings.weight": r(V, C),
        "embeddings.position_embeddings.weight": r(P, C),
        "embeddings.token_type_embeddings.weight": r(2, C),
        "embeddings.LayerNorm.weight": 1.0 + r(C),
        "embeddings.LayerNorm.bias": r(C),
    }
    for i in range(L):
        p = f"encoder.layer.{i}."
        ws.update({
            p + "attention.self.query.weight": r(C, C),
            p + "attention.self.query.bias": r(C),
            p + "attention.self.key.weight": r(C, C),
            p + "attention.self.key.bias": r(C),
            p + "attention.self.value.weight": r(C, C),
            p + "attention.self.value.bias": r(C),
            p + "attention.output.dense.weight": r(C, C),
            p + "attention.output.dense.bias": r(C),
            p + "attention.output.LayerNorm.weight": 1.0 + r(C),
            p + "attention.output.LayerNorm.bias": r(C),
            p + "intermediate.dense.weight": r(FF, C),
            p + "intermediate.dense.bias": r(FF),
            p + "output.dense.weight": r(C, FF),
            p + "output.dense.bias": r(C),
            p + "output.LayerNorm.weight": 1.0 + r(C),
            p + "output.LayerNorm.bias": r(C),
        })
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    # WordPiece tokenizer.json
    vocab = {f"[T{i}]": i for i in range(V)}
    vocab["[UNK]"] = 0
    tj = {"model": {"type": "WordPiece", "vocab": vocab},
          "added_tokens": [{"id": 101, "content": "[CLS]", "special": True},
                           {"id": 102, "content": "[SEP]", "special": True}]}
    with open(hf_dir / "tokenizer.json", "w") as f:
        json.dump(tj, f)

    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")

    tcfg = BertConfig(**{k: v for k, v in cfg.items()
                         if k != "architectures"},
                      attn_implementation="eager")
    hf = BertModel(tcfg, add_pooling_layer=False)
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in ws.items()}, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    tokens = [101, 7, 42, 9, 55, 102]
    with torch.no_grad():
        hid = hf(torch.tensor([tokens])).last_hidden_state[0].numpy()

    def norm(v):
        return v / np.linalg.norm(v)

    from llama_cpp_test_tpu.runtime.engine import Context, Model

    model = Model(out)
    assert model.hp.arch == "bert" and model.hp.post_norm
    assert not model.hp.causal and model.hp.pooling == "cls"
    ctx = Context(model, n_ctx=64, n_seq_max=1, block_size=8)
    cls = ctx.embed(tokens, pooling="cls", causal=False)
    ref_cls = norm(hid[0])
    assert np.abs(cls - ref_cls).max() < 2e-2, np.abs(cls - ref_cls).max()
    mean = ctx.embed(tokens, pooling="mean", causal=False)
    ref_mean = norm(hid.mean(axis=0))
    assert np.abs(mean - ref_mean).max() < 2e-2
    cos = float(np.dot(cls, ref_cls))
    assert cos > 0.999, cos


def _llama_body_ws(rng, V=256, C=64, H=4, KV=2, L=2, FF=96, d=16):
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    return ws


def _ref_llama_logits(ws, tokens, V=256, C=64, H=4, KV=2, L=2, FF=96, d=16):
    from transformers import LlamaConfig, LlamaForCausalLM

    tcfg = LlamaConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF, head_dim=d,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager")
    hf = LlamaForCausalLM(tcfg)
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in ws.items()}, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    with torch.no_grad():
        return hf(torch.tensor([tokens])).logits[0].numpy()


def _convert_and_logits(tmp_path, cfg, ws, tokens, sub="hf"):
    hf_dir = tmp_path / sub
    hf_dir.mkdir(exist_ok=True)
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), cfg["vocab_size"])
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / f"{sub}.gguf")
    convert(str(hf_dir), out, dtype="F32")
    model = Model(out)
    ctx = Context(model, n_ctx=64, n_seq_max=1, block_size=8)
    return model, ctx.prefill(ctx.new_seq(), tokens, all_logits=True)


def test_convert_minicpm_scale_folding_equivalence(tmp_path):
    """minicpm == llama with scale_emb folded into embeddings,
    scale_depth/sqrt(L) into o/down projections, and 1/logit_scale into
    the lm head (exact: RMSNorm is scale-invariant) — so the HF Llama
    forward on folded weights is bit-level ground truth."""
    rng = np.random.default_rng(41)
    V, C, H, KV, L, FF, d = 256, 64, 4, 2, 2, 96, 16
    ws = _llama_body_ws(rng, V, C, H, KV, L, FF, d)
    s_emb, s_depth, dim_base = 12.0, 1.4, 16.0
    s_res = s_depth / L ** 0.5
    s_logit = C / dim_base
    cfg = {
        "architectures": ["MiniCPMForCausalLM"],
        "hidden_size": C, "intermediate_size": FF, "head_dim": d,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "scale_emb": s_emb, "scale_depth": s_depth, "dim_model_base":
        dim_base, "bos_token_id": 1, "eos_token_id": 2,
    }
    tokens = [3, 17, 42, 9, 150, 7]
    m, got = _convert_and_logits(tmp_path, cfg, ws, tokens)
    assert m.hp.arch == "minicpm"
    assert abs(m.hp.embd_scale - s_emb) < 1e-6
    assert abs(m.hp.residual_scale - s_res) < 1e-6

    folded = dict(ws)
    folded["model.embed_tokens.weight"] = ws["model.embed_tokens.weight"] * s_emb
    folded["lm_head.weight"] = ws["lm_head.weight"] / s_logit
    for i in range(L):
        p = f"model.layers.{i}."
        folded[p + "self_attn.o_proj.weight"] = \
            ws[p + "self_attn.o_proj.weight"] * s_res
        folded[p + "mlp.down_proj.weight"] = \
            ws[p + "mlp.down_proj.weight"] * s_res
    ref = _ref_llama_logits(folded, tokens, V, C, H, KV, L, FF, d)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_internlm2_wqkv_deinterleave(tmp_path):
    """internlm2's grouped fused wqkv, assembled from a known llama
    checkpoint's q/k/v, must convert back to logits identical to the HF
    Llama forward on the original weights."""
    rng = np.random.default_rng(42)
    V, C, H, KV, L, FF, d = 256, 64, 4, 2, 2, 96, 16
    lws = _llama_body_ws(rng, V, C, H, KV, L, FF, d)
    qpk = H // KV
    ws = {
        "model.tok_embeddings.weight": lws["model.embed_tokens.weight"],
        "model.norm.weight": lws["model.norm.weight"],
        "output.weight": lws["lm_head.weight"],
    }
    for i in range(L):
        p = f"model.layers.{i}."
        q = lws[p + "self_attn.q_proj.weight"].reshape(KV, qpk, d, C)
        k = lws[p + "self_attn.k_proj.weight"].reshape(KV, 1, d, C)
        v = lws[p + "self_attn.v_proj.weight"].reshape(KV, 1, d, C)
        wqkv = np.concatenate([q, k, v], axis=1).reshape(-1, C)
        ws.update({
            p + "attention.wqkv.weight": wqkv,
            p + "attention.wo.weight": lws[p + "self_attn.o_proj.weight"],
            p + "attention_norm.weight": lws[p + "input_layernorm.weight"],
            p + "ffn_norm.weight": lws[p + "post_attention_layernorm.weight"],
            p + "feed_forward.w1.weight": lws[p + "mlp.gate_proj.weight"],
            p + "feed_forward.w3.weight": lws[p + "mlp.up_proj.weight"],
            p + "feed_forward.w2.weight": lws[p + "mlp.down_proj.weight"],
        })
    cfg = {
        "architectures": ["InternLM2ForCausalLM"],
        "hidden_size": C, "intermediate_size": FF, "head_dim": d,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    tokens = [3, 17, 42, 9, 150, 7]
    m, got = _convert_and_logits(tmp_path, cfg, ws, tokens)
    assert m.hp.arch == "internlm2"
    ref = _ref_llama_logits(lws, tokens, V, C, H, KV, L, FF, d)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_baichuan_wpack_split(tmp_path):
    """baichuan-7B's fused W_pack (stacked [q; k; v]) assembled from a
    known llama checkpoint converts to identical logits; the ALiBi
    13B-class config is refused."""
    rng = np.random.default_rng(43)
    V, C, H, L, FF = 256, 64, 4, 2, 96
    d = C // H
    lws = _llama_body_ws(rng, V, C, H, H, L, FF, d)
    ws = {k: v for k, v in lws.items() if "q_proj" not in k
          and "k_proj" not in k and "v_proj" not in k}
    for i in range(L):
        p = f"model.layers.{i}."
        ws[p + "self_attn.W_pack.weight"] = np.concatenate([
            lws[p + "self_attn.q_proj.weight"],
            lws[p + "self_attn.k_proj.weight"],
            lws[p + "self_attn.v_proj.weight"]], axis=0)
    cfg = {
        "architectures": ["BaichuanForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_hidden_layers": L,
        "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "vocab_size": V,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    tokens = [3, 17, 42, 9, 150, 7]
    m, got = _convert_and_logits(tmp_path, cfg, ws, tokens)
    assert m.hp.arch == "baichuan"
    ref = _ref_llama_logits(lws, tokens, V, C, H, H, L, FF, d)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])

    # 13B-class (ALiBi) config: detected by the reference's layer-count
    # rule; loads with alibi + no rope and decodes (the slope math itself
    # is HF-cross-validated in the bloom/mpt tests; no native HF class
    # exists for baichuan to compare against)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model, generate

    al_dir = tmp_path / "alibi"
    al_dir.mkdir()
    with open(al_dir / "config.json", "w") as f:
        json.dump({**cfg, "position_embedding": "alibi"}, f)
    st.save_file(ws, str(al_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(al_dir), V)
    out13 = str(tmp_path / "b13.gguf")
    convert(str(al_dir), out13, dtype="F32")
    m13 = Model(out13)
    assert m13.hp.alibi and m13.hp.pos_embd == "none"
    ctx13 = Context(m13, n_ctx=64, n_seq_max=1, block_size=8)
    toks13 = list(generate(ctx13, tokens, 4))
    assert len(toks13) == 4
    # and it is NOT the rope model's stream (positions matter)
    m7 = Model(str(tmp_path / "hf.gguf"))
    ctx7 = Context(m7, n_ctx=64, n_seq_max=1, block_size=8)
    assert list(generate(ctx7, tokens, 4)) is not None


def test_convert_gpt2_matches_transformers(tmp_path):
    """gpt2: learned absolute positions (no rope), LayerNorm decoder with
    fused Conv1D qkv (transposed at convert), non-gated GELU FFN, tied
    head — logits cross-validated vs transformers GPT2LMHeadModel."""
    from transformers import GPT2Config, GPT2LMHeadModel

    rng = np.random.default_rng(61)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L, FF, P = 256, 64, 4, 2, 96, 128
    cfg = {
        "architectures": ["GPT2LMHeadModel"],
        "n_embd": C, "n_head": H, "n_layer": L, "n_positions": P,
        "n_inner": FF, "vocab_size": V, "layer_norm_epsilon": 1e-5,
        "activation_function": "gelu_new",
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "transformer.wte.weight": r(V, C),
        "transformer.wpe.weight": r(P, C),
        "transformer.ln_f.weight": 1.0 + r(C),
        "transformer.ln_f.bias": r(C),
    }
    for i in range(L):
        p = f"transformer.h.{i}."
        ws.update({
            p + "ln_1.weight": 1.0 + r(C), p + "ln_1.bias": r(C),
            p + "attn.c_attn.weight": r(C, 3 * C),   # Conv1D [in, out]
            p + "attn.c_attn.bias": r(3 * C),
            p + "attn.c_proj.weight": r(C, C),
            p + "attn.c_proj.bias": r(C),
            p + "ln_2.weight": 1.0 + r(C), p + "ln_2.bias": r(C),
            p + "mlp.c_fc.weight": r(C, FF), p + "mlp.c_fc.bias": r(FF),
            p + "mlp.c_proj.weight": r(FF, C), p + "mlp.c_proj.bias": r(C),
        })
    tokens = [3, 17, 42, 9, 150, 7]
    m, got = _convert_and_logits(tmp_path, cfg, ws, tokens)
    assert m.hp.arch == "gpt2" and m.hp.pos_embd == "learned"
    assert m.hp.norm_type == "ln" and m.weights.pos_embd is not None

    tcfg = GPT2Config(vocab_size=V, n_embd=C, n_head=H, n_layer=L,
                      n_positions=P, n_inner=FF, layer_norm_epsilon=1e-5,
                      activation_function="gelu_new",
                      attn_implementation="eager")
    hf = GPT2LMHeadModel(tcfg)
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in ws.items()}, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])

    # decode steps (incremental positions through embed_extras)
    from llama_cpp_test_tpu.runtime.engine import Context, generate
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    out = list(generate(ctx, tokens, 4))
    with torch.no_grad():
        ref_gen = hf.generate(torch.tensor([tokens]), max_new_tokens=4,
                              do_sample=False, eos_token_id=None,
                              pad_token_id=0)[0].tolist()[len(tokens):]
    assert out == ref_gen, (out, ref_gen)


def test_convert_starcoder_matches_transformers(tmp_path):
    """starcoder1/santacoder (GPTBigCode): gpt2 body with multi-query
    attention and Linear (untransposed) projections."""
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    rng = np.random.default_rng(62)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L, FF, P = 256, 64, 4, 2, 96, 128
    d = C // H
    cfg = {
        "architectures": ["GPTBigCodeForCausalLM"],
        "n_embd": C, "n_head": H, "n_layer": L, "n_positions": P,
        "n_inner": FF, "vocab_size": V, "layer_norm_epsilon": 1e-5,
        "activation_function": "gelu_pytorch_tanh", "multi_query": True,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "transformer.wte.weight": r(V, C),
        "transformer.wpe.weight": r(P, C),
        "transformer.ln_f.weight": 1.0 + r(C),
        "transformer.ln_f.bias": r(C),
    }
    for i in range(L):
        p = f"transformer.h.{i}."
        ws.update({
            p + "ln_1.weight": 1.0 + r(C), p + "ln_1.bias": r(C),
            p + "attn.c_attn.weight": r(C + 2 * d, C),  # Linear [out, in]
            p + "attn.c_attn.bias": r(C + 2 * d),
            p + "attn.c_proj.weight": r(C, C),
            p + "attn.c_proj.bias": r(C),
            p + "ln_2.weight": 1.0 + r(C), p + "ln_2.bias": r(C),
            p + "mlp.c_fc.weight": r(FF, C), p + "mlp.c_fc.bias": r(FF),
            p + "mlp.c_proj.weight": r(C, FF), p + "mlp.c_proj.bias": r(C),
        })
    tokens = [3, 17, 42, 9, 150, 7]
    m, got = _convert_and_logits(tmp_path, cfg, ws, tokens)
    assert m.hp.arch == "starcoder" and m.hp.n_head_kv == 1
    assert m.hp.pos_embd == "learned"

    tcfg = GPTBigCodeConfig(vocab_size=V, n_embd=C, n_head=H, n_layer=L,
                            n_positions=P, n_inner=FF,
                            layer_norm_epsilon=1e-5, multi_query=True,
                            activation_function="gelu_pytorch_tanh",
                            attn_implementation="eager")
    hf = GPTBigCodeForCausalLM(tcfg)
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in ws.items()}, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_bloom_alibi_matches_transformers(tmp_path):
    """bloom: ALiBi decoder (no positional embedding), embedding
    LayerNorm, per-head-interleaved fused qkv deinterleaved at convert,
    non-gated GELU FFN — logits + greedy generation cross-validated vs
    transformers BloomForCausalLM (ALiBi slope parity included)."""
    from transformers import BloomConfig, BloomForCausalLM

    rng = np.random.default_rng(71)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L = 256, 64, 4, 2
    FF = 4 * C
    cfg = {
        "architectures": ["BloomForCausalLM"],
        "hidden_size": C, "n_head": H, "n_layer": L, "vocab_size": V,
        "layer_norm_epsilon": 1e-5, "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "transformer.word_embeddings.weight": r(V, C),
        "transformer.word_embeddings_layernorm.weight": 1.0 + r(C),
        "transformer.word_embeddings_layernorm.bias": r(C),
        "transformer.ln_f.weight": 1.0 + r(C),
        "transformer.ln_f.bias": r(C),
    }
    for i in range(L):
        p = f"transformer.h.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "input_layernorm.bias": r(C),
            p + "self_attention.query_key_value.weight": r(3 * C, C),
            p + "self_attention.query_key_value.bias": r(3 * C),
            p + "self_attention.dense.weight": r(C, C),
            p + "self_attention.dense.bias": r(C),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "post_attention_layernorm.bias": r(C),
            p + "mlp.dense_h_to_4h.weight": r(FF, C),
            p + "mlp.dense_h_to_4h.bias": r(FF),
            p + "mlp.dense_4h_to_h.weight": r(C, FF),
            p + "mlp.dense_4h_to_h.bias": r(C),
        })
    tokens = [3, 17, 42, 9, 150, 7]
    m, got = _convert_and_logits(tmp_path, cfg, ws, tokens)
    assert m.hp.arch == "bloom" and m.hp.alibi
    assert m.hp.pos_embd == "none" and m.weights.tok_norm is not None

    tcfg = BloomConfig(vocab_size=V, hidden_size=C, n_head=H, n_layer=L,
                       layer_norm_epsilon=1e-5,
                       attn_implementation="eager")
    hf = BloomForCausalLM(tcfg)
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in ws.items()}, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])

    # greedy decode steps keep parity (ALiBi bias in the decode path too)
    from llama_cpp_test_tpu.runtime.engine import Context, generate
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    out = list(generate(ctx, tokens, 4))
    with torch.no_grad():
        ref_gen = hf.generate(torch.tensor([tokens]), max_new_tokens=4,
                              do_sample=False, eos_token_id=None,
                              pad_token_id=0)[0].tolist()[len(tokens):]
    assert out == ref_gen, (out, ref_gen)


def test_alibi_slopes_match_hf():
    """Per-head slope formula parity with HF build_alibi_tensor, incl.
    non-power-of-two head counts (the interleaved second ladder)."""
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    from llama_cpp_test_tpu.ops.layers import alibi_slopes

    for H in (4, 6, 12, 14, 32, 71):
        mask = torch.ones(1, 5)
        hf = build_alibi_tensor(mask, H, torch.float32)[:, 0, 1].numpy()
        np.testing.assert_allclose(alibi_slopes(H), hf, rtol=1e-6)


def test_convert_mpt_alibi_matches_transformers(tmp_path):
    """mpt: bias-free ALiBi decoder with the MPT slope ordering and a
    contiguous fused Wqkv — logits + greedy decode vs transformers."""
    from transformers import MptConfig, MptForCausalLM

    # seed 73: seed 72's random logits had a sub-1e-4 top-2 margin at the
    # last position (bf16 activation noise flips it); margins here are
    # robust
    rng = np.random.default_rng(73)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L = 256, 60, 6, 2   # 6 heads: MPT's non-pow2 slope order
    FF = 4 * C
    cfg = {
        "architectures": ["MptForCausalLM"],
        "d_model": C, "n_heads": H, "n_layers": L, "vocab_size": V,
        "max_seq_len": 256, "expansion_ratio": 4,
        "attn_config": {"alibi": True, "alibi_bias_max": 8},
        "no_bias": True, "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "transformer.wte.weight": r(V, C),
        "transformer.norm_f.weight": 1.0 + r(C),
    }
    for i in range(L):
        p = f"transformer.blocks.{i}."
        ws.update({
            p + "norm_1.weight": 1.0 + r(C),
            p + "attn.Wqkv.weight": r(3 * C, C),
            p + "attn.out_proj.weight": r(C, C),
            p + "norm_2.weight": 1.0 + r(C),
            p + "ffn.up_proj.weight": r(FF, C),
            p + "ffn.down_proj.weight": r(C, FF),
        })
    tokens = [3, 17, 42, 9, 150, 7]
    m, got = _convert_and_logits(tmp_path, cfg, ws, tokens)
    assert m.hp.arch == "mpt" and m.hp.alibi
    assert m.hp.alibi_style == "mpt" and m.hp.n_head == 6

    tcfg = MptConfig(vocab_size=V, d_model=C, n_heads=H, n_layers=L,
                     max_seq_len=256, expansion_ratio=4, no_bias=True,
                     attn_implementation="eager")
    hf = MptForCausalLM(tcfg)
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in ws.items()}, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])

    from llama_cpp_test_tpu.runtime.engine import Context, generate
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    out = list(generate(ctx, tokens, 4))
    with torch.no_grad():
        ref_gen = hf.generate(torch.tensor([tokens]), max_new_tokens=4,
                              do_sample=False, eos_token_id=None,
                              pad_token_id=0)[0].tolist()[len(tokens):]
    assert out == ref_gen, (out, ref_gen)


def test_convert_dbrx_matches_transformers(tmp_path):
    """dbrx (reference DbrxModel + llm_build_dbrx): bias-free LayerNorms,
    fused clamped Wqkv, router + fused [E*F, C] expert planes (w1=gate,
    v1=up, w2=down used untransposed in HF), softmax top-k renorm."""
    from transformers import DbrxConfig, DbrxForCausalLM

    rng = np.random.default_rng(23)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, E, FF = 256, 64, 4, 2, 2, 4, 96
    d = C // H
    cfg = {
        "architectures": ["DbrxForCausalLM"],
        "d_model": C, "n_heads": H, "n_layers": L, "max_seq_len": 256,
        "vocab_size": V,
        "ffn_config": {"ffn_hidden_size": FF, "moe_num_experts": E,
                       "moe_top_k": 2},
        "attn_config": {"kv_n_heads": KV, "clip_qkv": 0.12,
                        "rope_theta": 10000.0},
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "transformer.wte.weight": r(V, C),
        "transformer.norm_f.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"transformer.blocks.{i}."
        ws.update({
            p + "norm_attn_norm.norm_1.weight": 1.0 + r(C),
            p + "norm_attn_norm.attn.Wqkv.weight": r((H + 2 * KV) * d, C),
            p + "norm_attn_norm.attn.out_proj.weight": r(C, C),
            p + "norm_attn_norm.norm_2.weight": 1.0 + r(C),
            p + "ffn.router.layer.weight": r(E, C),
            p + "ffn.experts.mlp.w1": r(E * FF, C),
            p + "ffn.experts.mlp.v1": r(E * FF, C),
            p + "ffn.experts.mlp.w2": r(E * FF, C),
        })
    tcfg = DbrxConfig(
        d_model=C, n_heads=H, n_layers=L, max_seq_len=256, vocab_size=V,
        ffn_config={"ffn_hidden_size": FF, "moe_num_experts": E,
                    "moe_top_k": 2},
        attn_config={"kv_n_heads": KV, "clip_qkv": 0.12,
                     "rope_theta": 10000.0},
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, DbrxForCausalLM, tcfg)
    assert m.hp.arch == "dbrx" and m.hp.n_expert == E
    assert m.hp.clamp_kqv == pytest.approx(0.12)


def test_convert_cohere2_matches_transformers(tmp_path):
    """cohere2 / Command R7B (reference Cohere2Model + llm_build_cohere2):
    command-r parallel-residual LayerNorm body, 3:1 sliding/global layer
    pattern, and NO rope at all on the global layers (NoPE) — prompt
    longer than the window exercises both the SWA mask and the NoPE
    global layer."""
    from transformers import Cohere2Config, Cohere2ForCausalLM

    rng = np.random.default_rng(29)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF, W = 256, 64, 4, 2, 4, 96, 8
    d = C // H
    cfg = {
        "architectures": ["Cohere2ForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "layer_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "logit_scale": 0.25, "sliding_window": W,
        "sliding_window_pattern": 4, "tie_word_embeddings": True,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = Cohere2Config(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        sliding_window=W, sliding_window_pattern=4, layer_norm_eps=1e-5,
        logit_scale=0.25, rope_theta=10000.0, tie_word_embeddings=True,
        attn_implementation="eager",
    )
    tokens = [3, 17, 42, 9, 150, 7, 22, 100, 5, 61, 77, 130]
    m = _convert_and_compare(tmp_path, cfg, ws, Cohere2ForCausalLM, tcfg,
                             tokens=tokens)
    assert m.hp.arch == "cohere2" and m.hp.nope_global
    assert m.hp.swa_pattern == 4 and m.hp.sliding_window == W


def test_convert_chatglm_glm4_matches_transformers(tmp_path):
    """chatglm via the native GlmForCausalLM class (reference ChatGLMModel
    registers it too): PARTIAL interleaved rotary over half the head dims
    (NORM rope + rope_dim = head_dim/2 exercises the partial-aware row
    unpermute), qkv biases, fused gate_up split at convert."""
    from transformers import GlmConfig, GlmForCausalLM

    rng = np.random.default_rng(31)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF, d = 256, 64, 4, 2, 2, 96, 16
    cfg = {
        "architectures": ["GlmForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "head_dim": d, "partial_rotary_factor": 0.5,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "attention_bias": True, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.q_proj.bias": r(H * d),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.k_proj.bias": r(KV * d),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.bias": r(KV * d),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_up_proj.weight": r(2 * FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = GlmConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        head_dim=d, partial_rotary_factor=0.5, rms_norm_eps=1e-5,
        rope_theta=10000.0, attention_bias=True, tie_word_embeddings=False,
        pad_token_id=0, attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, GlmForCausalLM, tcfg)
    assert m.hp.arch == "chatglm" and m.hp.rope_dim == d // 2


def test_fused_swiglu_ffn_up_gguf_loads(tmp_path):
    """Reference-converted phi3/chatglm GGUFs store gate|up FUSED in one
    ffn_up tensor (LLM_FFN_SWIGLU splits at runtime). The loader's
    row-slice fallback must produce identical logits to the split form."""
    from test_engine import make_tiny_gguf

    from llama_cpp_test_tpu.gguf.reader import open_gguf
    from llama_cpp_test_tpu.gguf.writer import GGUFWriter
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    raw = str(tmp_path / "raw.gguf")
    make_tiny_gguf(raw)
    r = open_gguf(raw)
    # rewrite BOTH layouts in F32 so the only difference is fused vs
    # split (the tiny model's own planes are quantized)
    src = str(tmp_path / "split.gguf")
    dst = str(tmp_path / "fused.gguf")
    for out, fuse in ((src, False), (dst, True)):
        w = GGUFWriter(out)
        for k, v in r.metadata.items():
            w.add_kv(k, v)
        done = set()
        for name, info in r.tensors.items():
            if fuse and (".ffn_gate.weight" in name or
                         ".ffn_up.weight" in name):
                blk = name.rsplit(".ffn_", 1)[0]
                if blk in done:
                    continue
                done.add(blk)
                g = r.dequantize(blk + ".ffn_gate.weight", np.float32)
                u = r.dequantize(blk + ".ffn_up.weight", np.float32)
                gi = r.tensors[blk + ".ffn_gate.weight"]
                ff, c = gi.shape[1], gi.shape[0]
                fused = np.concatenate([g.reshape(ff, c),
                                        u.reshape(ff, c)])
                w.add_tensor(blk + ".ffn_up.weight", fused)
                continue
            arr = r.dequantize(name, np.float32)
            shape = tuple(reversed(info.shape))
            w.add_tensor(name, arr.reshape(shape))
        w.write()

    tokens = [3, 17, 42, 9]
    ref_m = Model(src)
    ref = Context(ref_m, n_ctx=32, n_seq_max=1, block_size=8)
    a = ref.prefill(ref.new_seq(), tokens, all_logits=True)
    got_m = Model(dst)
    got = Context(got_m, n_ctx=32, n_seq_max=1, block_size=8)
    b = got.prefill(got.new_seq(), tokens, all_logits=True)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_convert_phimoe_matches_transformers(tmp_path):
    """phimoe / Phi-3.5-MoE: phi3 attention (neox rope, qkv+head biases)
    over mixtral-stacked experts with TRUE LayerNorms and HF's
    sparsemixer inference routing — per-pick masked softmax, weights NOT
    renormalized across the two picks. (The reference routes phimoe
    through llm_build_phi3's RMS+bias norms and renormalized top-2
    softmax; both diverge from the original model, so this test
    validates against transformers, not the reference.)"""
    from transformers import PhimoeConfig, PhimoeForCausalLM

    rng = np.random.default_rng(37)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, E, FFE = 256, 64, 4, 2, 2, 4, 96
    d = C // H
    cfg = {
        "architectures": ["PhimoeForCausalLM"],
        "hidden_size": C, "intermediate_size": FFE,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "num_local_experts": E, "num_experts_per_tok": 2,
        "router_jitter_noise": 0.01, "attention_bias": True,
        "lm_head_bias": True, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "model.norm.bias": r(C),
        "lm_head.weight": r(V, C),
        "lm_head.bias": r(V),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "input_layernorm.bias": r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.q_proj.bias": r(H * d),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.k_proj.bias": r(KV * d),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.bias": r(KV * d),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "self_attn.o_proj.bias": r(C),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "post_attention_layernorm.bias": r(C),
            p + "block_sparse_moe.gate.weight": r(E, C),
        })
        for e in range(E):
            q = p + f"block_sparse_moe.experts.{e}."
            ws.update({
                q + "w1.weight": r(FFE, C),
                q + "w3.weight": r(FFE, C),
                q + "w2.weight": r(C, FFE),
            })
    tcfg = PhimoeConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FFE,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        num_local_experts=E, num_experts_per_tok=2,
        router_jitter_noise=0.01, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=True, lm_head_bias=True, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, PhimoeForCausalLM, tcfg)
    assert m.hp.arch == "phimoe"
    assert m.hp.expert_gating == "sparsemixer"


def _chameleon_ws(rng, swin):
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF, d = 256, 64, 4, 2, 2, 96, 16
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "self_attn.q_norm.weight": 1.0 + r(H, d),
            p + "self_attn.q_norm.bias": r(H, d),
            p + "self_attn.k_norm.weight": 1.0 + r(KV, d),
            p + "self_attn.k_norm.bias": r(KV, d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    cfg = {
        "architectures": ["ChameleonForConditionalGeneration"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "swin_norm": swin, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    return cfg, ws


def _chameleon_cfg(swin):
    from transformers import ChameleonConfig

    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    return ChameleonConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        rms_norm_eps=1e-5, rope_theta=10000.0, swin_norm=swin,
        tie_word_embeddings=False, attn_implementation="eager",
        vocabulary_map={"<image>": 255},
    )


def test_convert_chameleon_matches_transformers(tmp_path):
    """chameleon: llama body + per-head qk LayerNorms WITH bias (stats
    over head_dim only, before rope) — the norm weights ride the same
    within-head interleave permutation as the q/k rows."""
    from transformers import ChameleonForConditionalGeneration

    cfg, ws = _chameleon_ws(np.random.default_rng(41), swin=False)
    m = _convert_and_compare(tmp_path, cfg, ws,
                             ChameleonForConditionalGeneration,
                             _chameleon_cfg(False))
    assert m.hp.arch == "chameleon" and not m.hp.swin_norm


def test_convert_chameleon_swin_norm_matches_transformers(tmp_path):
    """chameleon 34B swin_norm: NO pre-norms, attn/ffn norms on the
    branch outputs — loads into the gemma2 sandwich post-norm slots."""
    from transformers import ChameleonForConditionalGeneration

    cfg, ws = _chameleon_ws(np.random.default_rng(43), swin=True)
    m = _convert_and_compare(tmp_path, cfg, ws,
                             ChameleonForConditionalGeneration,
                             _chameleon_cfg(True))
    assert m.hp.arch == "chameleon" and m.hp.swin_norm


def test_convert_deepseek_v1_matches_torch_reference(tmp_path):
    """deepseek v1 (llm_build_deepseek): llama attention + deepseek-MoE
    with softmax top-k WITHOUT renorm, always-on UNGATED shared experts,
    and a leading dense layer. The HF class is remote-code, so this
    validates against an independent torch implementation of the
    published v1 architecture."""
    import torch.nn.functional as F

    rng = np.random.default_rng(59)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, E, FF, FFE = 256, 64, 4, 2, 3, 4, 96, 48
    d = C // H
    cfg = {
        "architectures": ["DeepseekForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "moe_intermediate_size": FFE,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "n_routed_experts": E, "num_experts_per_tok": 2,
        "n_shared_experts": 1, "first_k_dense_replace": 1,
        "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
        })
        if i < 1:   # dense lead
            ws.update({p + "mlp.gate_proj.weight": r(FF, C),
                       p + "mlp.up_proj.weight": r(FF, C),
                       p + "mlp.down_proj.weight": r(C, FF)})
            continue
        ws[p + "mlp.gate.weight"] = r(E, C)
        ws.update({p + "mlp.shared_experts.gate_proj.weight": r(FFE, C),
                   p + "mlp.shared_experts.up_proj.weight": r(FFE, C),
                   p + "mlp.shared_experts.down_proj.weight": r(C, FFE)})
        for e in range(E):
            q = p + f"mlp.experts.{e}."
            ws.update({q + "gate_proj.weight": r(FFE, C),
                       q + "up_proj.weight": r(FFE, C),
                       q + "down_proj.weight": r(C, FFE)})

    def rms(x, w):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + 1e-5) \
            * torch.from_numpy(w)

    def lin(x, w):
        return x @ torch.from_numpy(w).T

    def ref_forward(tokens):
        T = len(tokens)
        x = torch.from_numpy(ws["model.embed_tokens.weight"])[
            torch.tensor(tokens)]
        pos = torch.arange(T, dtype=torch.float32)
        inv = 1.0 / (10000.0 ** (torch.arange(0, d, 2).float() / d))
        theta = pos[:, None] * inv[None, :]
        cos = torch.cat([theta.cos(), theta.cos()], -1)   # [T, d]
        sin = torch.cat([theta.sin(), theta.sin()], -1)

        def rope(q):  # [T, h, d] half-split convention
            q1, q2 = q[..., :d // 2], q[..., d // 2:]
            rot = torch.cat([-q2, q1], -1)
            return q * cos[:, None, :] + rot * sin[:, None, :]

        mask = torch.full((T, T), float("-inf")).triu(1)
        for i in range(L):
            p = f"model.layers.{i}."
            cur = rms(x, ws[p + "input_layernorm.weight"])
            q = rope(lin(cur, ws[p + "self_attn.q_proj.weight"])
                     .view(T, H, d))
            k = rope(lin(cur, ws[p + "self_attn.k_proj.weight"])
                     .view(T, KV, d))
            v = lin(cur, ws[p + "self_attn.v_proj.weight"]).view(T, KV, d)
            k = k.repeat_interleave(H // KV, dim=1)
            v = v.repeat_interleave(H // KV, dim=1)
            att = torch.einsum("qhd,khd->hqk", q, k) / d ** 0.5
            att = (att + mask).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, H * d)
            x = x + lin(o, ws[p + "self_attn.o_proj.weight"])
            cur = rms(x, ws[p + "post_attention_layernorm.weight"])
            if i < 1:
                ffn = lin(F.silu(lin(cur, ws[p + "mlp.gate_proj.weight"]))
                          * lin(cur, ws[p + "mlp.up_proj.weight"]),
                          ws[p + "mlp.down_proj.weight"])
            else:
                probs = lin(cur, ws[p + "mlp.gate.weight"]).softmax(-1)
                topv, topi = probs.topk(2, dim=-1)   # NO renorm, scale 1
                ffn = torch.zeros_like(cur)
                for t in range(T):
                    for j in range(2):
                        e = int(topi[t, j])
                        qq = f"{p}mlp.experts.{e}."
                        h = F.silu(
                            lin(cur[t], ws[qq + "gate_proj.weight"])) \
                            * lin(cur[t], ws[qq + "up_proj.weight"])
                        ffn[t] += topv[t, j] * lin(
                            h, ws[qq + "down_proj.weight"])
                sp = p + "mlp.shared_experts."
                ffn = ffn + lin(
                    F.silu(lin(cur, ws[sp + "gate_proj.weight"]))
                    * lin(cur, ws[sp + "up_proj.weight"]),
                    ws[sp + "down_proj.weight"])
            x = x + ffn
        x = rms(x, ws["model.norm.weight"])
        return lin(x, ws["lm_head.weight"]).numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "deepseek" and not m.hp.norm_topk
    assert m.hp.n_layer_dense_lead == 1 and m.hp.n_expert_shared == 1
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_granitemoe_matches_transformers(tmp_path):
    """granitemoe (IBM granite-3 MoE / PowerMoE): granite's mup
    multipliers + mixtral-routed experts stored jetmoe-style — ONE fused
    input_linear [E, 2F, C] (gate;up) split at convert, output_linear
    [E, C, F] as the down plane (reference GraniteMoeModel)."""
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM

    rng = np.random.default_rng(61)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, E, FFE = 256, 64, 4, 2, 2, 4, 48
    d = C // H
    cfg = {
        "architectures": ["GraniteMoeForCausalLM"],
        "hidden_size": C, "intermediate_size": FFE,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "num_local_experts": E, "num_experts_per_tok": 2,
        "embedding_multiplier": 2.0, "residual_multiplier": 0.5,
        "attention_multiplier": 0.1, "logits_scaling": 4.0,
        "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "block_sparse_moe.router.layer.weight": r(E, C),
            p + "block_sparse_moe.input_linear.weight": r(E, 2 * FFE, C),
            p + "block_sparse_moe.output_linear.weight": r(E, C, FFE),
        })
    tcfg = GraniteMoeConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FFE,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        num_local_experts=E, num_experts_per_tok=2,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=4.0,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, GraniteMoeForCausalLM,
                             tcfg)
    assert m.hp.arch == "granitemoe" and m.hp.n_expert == E
    assert m.hp.embd_scale == pytest.approx(2.0)
    assert m.hp.attn_scale == pytest.approx(0.1)


def test_convert_xverse_matches_transformers(tmp_path):
    """xverse: llm_build_xverse is a strict subset of llm_build_llama
    (no biases/moe), with llama HF tensor names — validated by running
    llama-structured weights through the xverse arch label."""
    from transformers import LlamaConfig, LlamaForCausalLM

    rng = np.random.default_rng(67)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["XverseForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    tcfg = LlamaConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ws, LlamaForCausalLM, tcfg)
    assert m.hp.arch == "xverse"


def test_convert_jina_bert_v2_matches_torch_reference(tmp_path):
    """jina-bert-v2 (llm_build_bert JINA_BERT_V2 branches): bert post-norm
    body with SYMMETRIC bidirectional ALiBi (-slope*|i-j|, max_bias 8, no
    position embeddings) and an erf-GELU-gated FFN whose HF plane is one
    fused gated_layers [2F, C] ([gate; up]). The HF class is remote-code,
    so this validates against an independent torch implementation."""
    import torch.nn.functional as F

    rng = np.random.default_rng(71)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L, FF = 128, 64, 4, 2, 96
    d = C // H
    cfg = {
        "architectures": ["JinaBertModel"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_hidden_layers": L,
        "max_position_embeddings": 64, "vocab_size": V,
        "layer_norm_eps": 1e-12, "type_vocab_size": 2, "pad_token_id": 0,
    }
    ws = {
        "embeddings.word_embeddings.weight": r(V, C),
        "embeddings.token_type_embeddings.weight": r(2, C),
        "embeddings.LayerNorm.weight": 1.0 + r(C),
        "embeddings.LayerNorm.bias": r(C),
    }
    for i in range(L):
        p = f"encoder.layer.{i}."
        ws.update({
            p + "attention.self.query.weight": r(C, C),
            p + "attention.self.query.bias": r(C),
            p + "attention.self.key.weight": r(C, C),
            p + "attention.self.key.bias": r(C),
            p + "attention.self.value.weight": r(C, C),
            p + "attention.self.value.bias": r(C),
            p + "attention.output.dense.weight": r(C, C),
            p + "attention.output.dense.bias": r(C),
            p + "attention.output.LayerNorm.weight": 1.0 + r(C),
            p + "attention.output.LayerNorm.bias": r(C),
            p + "mlp.gated_layers.weight": r(2 * FF, C),
            p + "mlp.wo.weight": r(C, FF),
            p + "mlp.wo.bias": r(C),
            p + "mlp.layernorm.weight": 1.0 + r(C),
            p + "mlp.layernorm.bias": r(C),
        })

    def ln(x, p):
        return F.layer_norm(x, (C,), torch.from_numpy(ws[p + ".weight"]),
                            torch.from_numpy(ws[p + ".bias"]), 1e-12)

    def lin(x, w, b=None):
        y = x @ torch.from_numpy(ws[w]).T
        return y + torch.from_numpy(ws[b]) if b else y

    def ref_forward(tokens):
        T = len(tokens)
        x = torch.from_numpy(ws["embeddings.word_embeddings.weight"])[
            torch.tensor(tokens)]
        x = x + torch.from_numpy(
            ws["embeddings.token_type_embeddings.weight"])[0]
        x = ln(x, "embeddings.LayerNorm")
        slopes = torch.tensor([2 ** (-(8.0 / H) * (i + 1))
                               for i in range(H)])
        idx = torch.arange(T, dtype=torch.float32)
        dist = -(idx[:, None] - idx[None, :]).abs()       # [T, T]
        bias = slopes[:, None, None] * dist[None]         # [H, T, T]
        for i in range(L):
            p = f"encoder.layer.{i}."
            q = lin(x, p + "attention.self.query.weight",
                    p + "attention.self.query.bias").view(T, H, d)
            k = lin(x, p + "attention.self.key.weight",
                    p + "attention.self.key.bias").view(T, H, d)
            v = lin(x, p + "attention.self.value.weight",
                    p + "attention.self.value.bias").view(T, H, d)
            att = torch.einsum("qhd,khd->hqk", q, k) / d ** 0.5 + bias
            att = att.softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, C)
            o = lin(o, p + "attention.output.dense.weight",
                    p + "attention.output.dense.bias")
            x = ln(x + o, p + "attention.output.LayerNorm")
            gu = lin(x, p + "mlp.gated_layers.weight")
            g, u = gu[:, :FF], gu[:, FF:]
            ffn = lin(F.gelu(g) * u, p + "mlp.wo.weight", p + "mlp.wo.bias")
            x = ln(x + ffn, p + "mlp.layernorm")
        return x.numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    vocab = {f"[T{i}]": i for i in range(V)}
    vocab["[UNK]"] = 0
    with open(hf_dir / "tokenizer.json", "w") as f:
        json.dump({"model": {"type": "WordPiece", "vocab": vocab},
                   "added_tokens": []}, f)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "jina-bert-v2"
    assert m.hp.alibi and m.hp.alibi_sym and not m.hp.causal
    assert m.hp.post_norm and m.hp.pooling == "mean"
    tokens = [7, 42, 9, 55, 3, 101]
    with torch.no_grad():
        hid = ref_forward(tokens)

    def norm(v):
        return v / np.linalg.norm(v)

    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    mean = ctx.embed(tokens, pooling="mean", causal=False)
    ref_mean = norm(hid.mean(axis=0))
    assert np.abs(mean - ref_mean).max() < 2e-2
    assert float(np.dot(mean, ref_mean)) > 0.999


def test_convert_qwen1_matches_llama_equivalent(tmp_path):
    """qwen v1 (llm_build_qwen): MHA with fused biased c_attn, neox
    rope, w2(gate)/w1(up) swiglu — math-identical to HF llama with qkv
    biases, so equivalence against LlamaForCausalLM with the same
    weights under llama names is exact validation."""
    from transformers import LlamaConfig, LlamaForCausalLM

    rng = np.random.default_rng(73)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L, FF = 256, 64, 4, 2, 96
    d = C // H
    qws = {
        "transformer.wte.weight": r(V, C),
        "transformer.ln_f.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    lws = {
        "model.embed_tokens.weight": qws["transformer.wte.weight"],
        "model.norm.weight": qws["transformer.ln_f.weight"],
        "lm_head.weight": qws["lm_head.weight"],
    }
    for i in range(L):
        qp, lp = f"transformer.h.{i}.", f"model.layers.{i}."
        wq, wk, wv = r(C, C), r(C, C), r(C, C)
        bq, bk, bv = r(C), r(C), r(C)
        qws.update({
            qp + "ln_1.weight": 1.0 + r(C),
            qp + "attn.c_attn.weight": np.concatenate([wq, wk, wv]),
            qp + "attn.c_attn.bias": np.concatenate([bq, bk, bv]),
            qp + "attn.c_proj.weight": r(C, C),
            qp + "ln_2.weight": 1.0 + r(C),
            qp + "mlp.w2.weight": r(FF, C),     # gate
            qp + "mlp.w1.weight": r(FF, C),     # up
            qp + "mlp.c_proj.weight": r(C, FF),
        })
        lws.update({
            lp + "input_layernorm.weight": qws[qp + "ln_1.weight"],
            lp + "self_attn.q_proj.weight": wq,
            lp + "self_attn.q_proj.bias": bq,
            lp + "self_attn.k_proj.weight": wk,
            lp + "self_attn.k_proj.bias": bk,
            lp + "self_attn.v_proj.weight": wv,
            lp + "self_attn.v_proj.bias": bv,
            lp + "self_attn.o_proj.weight": qws[qp + "attn.c_proj.weight"],
            lp + "self_attn.o_proj.bias": np.zeros(C, np.float32),
            lp + "post_attention_layernorm.weight": qws[qp + "ln_2.weight"],
            lp + "mlp.gate_proj.weight": qws[qp + "mlp.w2.weight"],
            lp + "mlp.up_proj.weight": qws[qp + "mlp.w1.weight"],
            lp + "mlp.down_proj.weight": qws[qp + "mlp.c_proj.weight"],
        })
    cfg = {
        "architectures": ["QWenLMHeadModel"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_hidden_layers": L,
        "max_position_embeddings": 256, "vocab_size": V,
        "layer_norm_epsilon": 1e-6, "rotary_emb_base": 10000.0,
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2,
    }
    tcfg = LlamaConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=H,
        rms_norm_eps=1e-6, rope_theta=10000.0, attention_bias=True,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, qws, None, tcfg,
                             hf_weights=lws)
    assert m.hp.arch == "qwen" and m.hp.n_head_kv == H


def test_convert_exaone_matches_llama_equivalent(tmp_path):
    """exaone 3.5 (llm_build_exaone): the llama graph under
    transformer.h.* naming — llama-equivalence is exact validation."""
    from transformers import LlamaConfig, LlamaForCausalLM

    rng = np.random.default_rng(79)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    ews, lws = {
        "transformer.wte.weight": r(V, C),
        "transformer.ln_f.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }, {}
    lws = {
        "model.embed_tokens.weight": ews["transformer.wte.weight"],
        "model.norm.weight": ews["transformer.ln_f.weight"],
        "lm_head.weight": ews["lm_head.weight"],
    }
    for i in range(L):
        ep, lp = f"transformer.h.{i}.", f"model.layers.{i}."
        pieces = {
            "ln_1.weight": 1.0 + r(C),
            "attn.attention.q_proj.weight": r(H * d, C),
            "attn.attention.k_proj.weight": r(KV * d, C),
            "attn.attention.v_proj.weight": r(KV * d, C),
            "attn.attention.out_proj.weight": r(C, H * d),
            "ln_2.weight": 1.0 + r(C),
            "mlp.c_fc_0.weight": r(FF, C),
            "mlp.c_fc_1.weight": r(FF, C),
            "mlp.c_proj.weight": r(C, FF),
        }
        ews.update({ep + k: v for k, v in pieces.items()})
        lmap = {
            "ln_1.weight": "input_layernorm.weight",
            "attn.attention.q_proj.weight": "self_attn.q_proj.weight",
            "attn.attention.k_proj.weight": "self_attn.k_proj.weight",
            "attn.attention.v_proj.weight": "self_attn.v_proj.weight",
            "attn.attention.out_proj.weight": "self_attn.o_proj.weight",
            "ln_2.weight": "post_attention_layernorm.weight",
            "mlp.c_fc_0.weight": "mlp.gate_proj.weight",
            "mlp.c_fc_1.weight": "mlp.up_proj.weight",
            "mlp.c_proj.weight": "mlp.down_proj.weight",
        }
        lws.update({lp + lmap[k]: v for k, v in pieces.items()})
    cfg = {
        "architectures": ["ExaoneForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_layers": L, "max_position_embeddings": 256, "vocab_size": V,
        "layer_norm_epsilon": 1e-5, "rope_theta": 10000.0,
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2,
    }
    tcfg = LlamaConfig(
        vocab_size=V, hidden_size=C, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=KV,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = _convert_and_compare(tmp_path, cfg, ews, None, tcfg,
                             hf_weights=lws)
    assert m.hp.arch == "exaone" and m.hp.rope_type == "neox"


def test_convert_orion_matches_torch_reference(tmp_path):
    """orion (Orion-14B, llm_build_orion): llama body whose norms are
    TRUE LayerNorm WITH bias (the config key claims rms_norm_eps), gated
    silu FFN, no projection biases. Validated against an independent
    torch implementation (remote-code HF class); rope follows the
    model's half-split convention — see hparams.py for the divergence
    note vs the reference runtime's interleaved read."""
    import torch.nn.functional as F

    rng = np.random.default_rng(83)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["OrionForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "model.norm.bias": r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "input_layernorm.bias": r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "post_attention_layernorm.bias": r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })

    def ln(x, p):
        return F.layer_norm(x, (C,), torch.from_numpy(ws[p + ".weight"]),
                            torch.from_numpy(ws[p + ".bias"]), 1e-5)

    def lin(x, w):
        return x @ torch.from_numpy(ws[w]).T

    def ref_forward(tokens):
        T = len(tokens)
        x = torch.from_numpy(ws["model.embed_tokens.weight"])[
            torch.tensor(tokens)]
        pos = torch.arange(T, dtype=torch.float32)
        inv = 1.0 / (10000.0 ** (torch.arange(0, d, 2).float() / d))
        theta = pos[:, None] * inv[None, :]
        cos = torch.cat([theta.cos(), theta.cos()], -1)
        sin = torch.cat([theta.sin(), theta.sin()], -1)

        def rope(q):
            q1, q2 = q[..., :d // 2], q[..., d // 2:]
            rot = torch.cat([-q2, q1], -1)
            return q * cos[:, None, :] + rot * sin[:, None, :]

        mask = torch.full((T, T), float("-inf")).triu(1)
        for i in range(L):
            p = f"model.layers.{i}."
            cur = ln(x, p + "input_layernorm")
            q = rope(lin(cur, p + "self_attn.q_proj.weight").view(T, H, d))
            k = rope(lin(cur, p + "self_attn.k_proj.weight").view(T, KV, d))
            v = lin(cur, p + "self_attn.v_proj.weight").view(T, KV, d)
            k = k.repeat_interleave(H // KV, dim=1)
            v = v.repeat_interleave(H // KV, dim=1)
            att = torch.einsum("qhd,khd->hqk", q, k) / d ** 0.5
            att = (att + mask).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, H * d)
            x = x + lin(o, p + "self_attn.o_proj.weight")
            cur = ln(x, p + "post_attention_layernorm")
            ffn = lin(F.silu(lin(cur, p + "mlp.gate_proj.weight"))
                      * lin(cur, p + "mlp.up_proj.weight"),
                      p + "mlp.down_proj.weight")
            x = x + ffn
        x = ln(x, "model.norm")
        return lin(x, "lm_head.weight").numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "orion" and m.hp.norm_type == "ln"
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_jais_matches_torch_reference(tmp_path):
    """jais (llm_build_jais): gpt2 LayerNorm body with fused biased
    Conv1D qkv, ALiBi (max bias recovered from the checkpoint's slopes
    tensor), BIASED swiglu (c_fc2 gate / c_fc up), 1/d_head attention
    scale, and mup embedding/output scales baked at convert."""
    import torch.nn.functional as F

    rng = np.random.default_rng(89)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L, FF = 256, 64, 4, 2, 96
    d = C // H
    EMB_S, ALPHA, WIDTH_S = 2.0, 1.5, 0.5
    cfg = {
        "architectures": ["JAISLMHeadModel"],
        "n_embd": C, "n_inner": FF, "n_head": H, "n_layer": L,
        "n_positions": 256, "vocab_size": V,
        "layer_norm_epsilon": 1e-5, "position_embedding_type": "alibi",
        "mup_embeddings_scale": EMB_S, "mup_output_alpha": ALPHA,
        "mup_width_scale": WIDTH_S,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    slopes = np.array([2 ** (-(8.0 / H) * (i + 1)) for i in range(H)],
                      np.float32)
    ws = {
        "transformer.wte.weight": r(V, C),
        "transformer.ln_f.weight": 1.0 + r(C),
        "transformer.ln_f.bias": r(C),
        "transformer.relative_pe.slopes": slopes,
    }
    for i in range(L):
        p = f"transformer.h.{i}."
        ws.update({
            p + "ln_1.weight": 1.0 + r(C), p + "ln_1.bias": r(C),
            # Conv1D layout [in, out]
            p + "attn.c_attn.weight": r(C, 3 * C),
            p + "attn.c_attn.bias": r(3 * C),
            p + "attn.c_proj.weight": r(C, C),
            p + "attn.c_proj.bias": r(C),
            p + "ln_2.weight": 1.0 + r(C), p + "ln_2.bias": r(C),
            p + "mlp.c_fc.weight": r(C, FF),     # up
            p + "mlp.c_fc.bias": r(FF),
            p + "mlp.c_fc2.weight": r(C, FF),    # gate (silu side)
            p + "mlp.c_fc2.bias": r(FF),
            p + "mlp.c_proj.weight": r(FF, C),
            p + "mlp.c_proj.bias": r(C),
        })

    def ln(x, p):
        return F.layer_norm(x, (C,), torch.from_numpy(ws[p + ".weight"]),
                            torch.from_numpy(ws[p + ".bias"]), 1e-5)

    def conv(x, w, b):   # Conv1D: x @ W + b, W stored [in, out]
        return x @ torch.from_numpy(ws[w]) + torch.from_numpy(ws[b])

    def ref_forward(tokens):
        T = len(tokens)
        x = torch.from_numpy(ws["transformer.wte.weight"])[
            torch.tensor(tokens)] * EMB_S
        idx = torch.arange(T, dtype=torch.float32)
        dist = -(idx[:, None] - idx[None, :])       # -(i - j) for j <= i
        bias = torch.from_numpy(slopes)[:, None, None] * dist[None]
        mask = torch.full((T, T), float("-inf")).triu(1)
        for i in range(L):
            p = f"transformer.h.{i}."
            cur = ln(x, p + "ln_1")
            qkv = conv(cur, p + "attn.c_attn.weight", p + "attn.c_attn.bias")
            q = qkv[:, :C].view(T, H, d)
            k = qkv[:, C:2 * C].view(T, H, d)
            v = qkv[:, 2 * C:].view(T, H, d)
            att = torch.einsum("qhd,khd->hqk", q, k) / d   # 1/d_head mup
            att = (att + bias + mask).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, C)
            x = x + conv(o, p + "attn.c_proj.weight", p + "attn.c_proj.bias")
            cur = ln(x, p + "ln_2")
            g = conv(cur, p + "mlp.c_fc2.weight", p + "mlp.c_fc2.bias")
            u = conv(cur, p + "mlp.c_fc.weight", p + "mlp.c_fc.bias")
            x = x + conv(F.silu(g) * u, p + "mlp.c_proj.weight",
                         p + "mlp.c_proj.bias")
        x = ln(x, "transformer.ln_f")
        head = torch.from_numpy(ws["transformer.wte.weight"]) \
            * (ALPHA * WIDTH_S)
        return (x @ head.T).numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "jais" and m.hp.alibi
    assert m.hp.alibi_max_bias == pytest.approx(8.0)
    assert m.hp.attn_scale == pytest.approx(1.0 / d)
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_refact_matches_torch_reference(tmp_path):
    """refact (llm_build_refact): rms/swiglu body with MQA (fused
    attn.kv plane split to one k + one v head), ALiBi positions (no
    rope), fused gate_up at the llama-style 2/3-rounded ffn width."""
    import torch.nn.functional as F

    rng = np.random.default_rng(97)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L = 256, 64, 4, 2
    d = C // H
    FFD = 256 * ((int(2 * (4 * C) / 3) + 255) // 256)
    cfg = {
        "architectures": ["GPTRefactForCausalLM"],
        "n_embd": C, "n_head": H, "n_layer": L, "n_positions": 256,
        "vocab_size": V, "layer_norm_epsilon": 1e-5,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "transformer.wte.weight": r(V, C),
        "ln_f.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"transformer.h.{i}."
        ws.update({
            p + "ln_1.weight": 1.0 + r(C),
            p + "attn.q.weight": r(H * d, C),
            p + "attn.kv.weight": r(2 * d, C),     # [k; v], 1 kv head
            p + "attn.c_proj.weight": r(C, H * d),
            p + "ln_2.weight": 1.0 + r(C),
            p + "mlp.gate_up_proj.weight": r(2 * FFD, C),
            p + "mlp.c_proj.weight": r(C, FFD),
        })

    def rms(x, w):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + 1e-5) \
            * torch.from_numpy(w)

    def lin(x, w):
        return x @ torch.from_numpy(ws[w]).T

    def ref_forward(tokens):
        T = len(tokens)
        x = torch.from_numpy(ws["transformer.wte.weight"])[
            torch.tensor(tokens)]
        slopes = torch.tensor([2 ** (-(8.0 / H) * (i + 1))
                               for i in range(H)])
        idx = torch.arange(T, dtype=torch.float32)
        bias = slopes[:, None, None] * (-(idx[:, None] - idx[None, :]))
        mask = torch.full((T, T), float("-inf")).triu(1)
        for i in range(L):
            p = f"transformer.h.{i}."
            cur = rms(x, ws[p + "ln_1.weight"])
            q = lin(cur, p + "attn.q.weight").view(T, H, d)
            kv = lin(cur, p + "attn.kv.weight")
            k = kv[:, :d].view(T, 1, d).expand(T, H, d)
            v = kv[:, d:].view(T, 1, d).expand(T, H, d)
            att = torch.einsum("qhd,khd->hqk", q, k) / d ** 0.5
            att = (att + bias + mask).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, H * d)
            x = x + lin(o, p + "attn.c_proj.weight")
            cur = rms(x, ws[p + "ln_2.weight"])
            gu = lin(cur, p + "mlp.gate_up_proj.weight")
            g, u = gu[:, :FFD], gu[:, FFD:]
            x = x + lin(F.silu(g) * u, p + "mlp.c_proj.weight")
        x = rms(x, ws["ln_f.weight"])
        return lin(x, "lm_head.weight").numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "refact" and m.hp.alibi and m.hp.n_head_kv == 1
    assert m.hp.n_ff == FFD
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_codeshell_matches_torch_reference(tmp_path):
    """codeshell (llm_build_codeshell): starcoder body (LayerNorm+bias,
    fused biased qkv, tanh-gelu SEQ ffn with biases) with NEOX rope
    instead of learned positions and num_query_groups GQA."""
    import torch.nn.functional as F

    rng = np.random.default_rng(101)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 4, 2, 2, 96
    d = C // H
    cfg = {
        "architectures": ["CodeShellForCausalLM"],
        "n_embd": C, "n_head": H, "num_query_groups": KV, "n_layer": L,
        "n_positions": 256, "n_inner": FF, "vocab_size": V,
        "layer_norm_epsilon": 1e-5,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "transformer.wte.weight": r(V, C),
        "transformer.ln_f.weight": 1.0 + r(C),
        "transformer.ln_f.bias": r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"transformer.h.{i}."
        ws.update({
            p + "ln_1.weight": 1.0 + r(C), p + "ln_1.bias": r(C),
            p + "attn.c_attn.weight": r((H + 2 * KV) * d, C),
            p + "attn.c_attn.bias": r((H + 2 * KV) * d),
            p + "attn.c_proj.weight": r(C, C),
            p + "attn.c_proj.bias": r(C),
            p + "ln_2.weight": 1.0 + r(C), p + "ln_2.bias": r(C),
            p + "mlp.c_fc.weight": r(FF, C),
            p + "mlp.c_fc.bias": r(FF),
            p + "mlp.c_proj.weight": r(C, FF),
            p + "mlp.c_proj.bias": r(C),
        })

    def ln(x, p):
        return F.layer_norm(x, (C,), torch.from_numpy(ws[p + ".weight"]),
                            torch.from_numpy(ws[p + ".bias"]), 1e-5)

    def lin(x, w, b=None):
        y = x @ torch.from_numpy(ws[w]).T
        return y + torch.from_numpy(ws[b]) if b else y

    def ref_forward(tokens):
        T = len(tokens)
        x = torch.from_numpy(ws["transformer.wte.weight"])[
            torch.tensor(tokens)]
        pos = torch.arange(T, dtype=torch.float32)
        inv = 1.0 / (10000.0 ** (torch.arange(0, d, 2).float() / d))
        theta = pos[:, None] * inv[None, :]
        cos = torch.cat([theta.cos(), theta.cos()], -1)
        sin = torch.cat([theta.sin(), theta.sin()], -1)

        def rope(q):
            q1, q2 = q[..., :d // 2], q[..., d // 2:]
            rot = torch.cat([-q2, q1], -1)
            return q * cos[:, None, :] + rot * sin[:, None, :]

        mask = torch.full((T, T), float("-inf")).triu(1)
        for i in range(L):
            p = f"transformer.h.{i}."
            cur = ln(x, p + "ln_1")
            qkv = lin(cur, p + "attn.c_attn.weight", p + "attn.c_attn.bias")
            q = rope(qkv[:, :H * d].view(T, H, d))
            k = rope(qkv[:, H * d:(H + KV) * d].view(T, KV, d))
            v = qkv[:, (H + KV) * d:].view(T, KV, d)
            k = k.repeat_interleave(H // KV, dim=1)
            v = v.repeat_interleave(H // KV, dim=1)
            att = torch.einsum("qhd,khd->hqk", q, k) / d ** 0.5
            att = (att + mask).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, C)
            x = x + lin(o, p + "attn.c_proj.weight", p + "attn.c_proj.bias")
            cur = ln(x, p + "ln_2")
            h = F.gelu(lin(cur, p + "mlp.c_fc.weight", p + "mlp.c_fc.bias"),
                       approximate="tanh")
            x = x + lin(h, p + "mlp.c_proj.weight", p + "mlp.c_proj.bias")
        x = ln(x, "transformer.ln_f")
        return lin(x, "lm_head.weight").numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "codeshell" and m.hp.n_head_kv == KV
    assert m.hp.pos_embd == "rope" and m.hp.rope_type == "neox"
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_minicpm3_matches_torch_reference(tmp_path):
    """minicpm3 (llm_build_minicpm3): deepseek2-style MLA (q-lora +
    kv-lora, pe-only NEOX rope — no load permutation, unlike deepseek2's
    NORM convention) combined with minicpm's mup scales. Validated
    against an independent torch MLA implementation (remote-code HF
    class)."""
    import torch.nn.functional as F

    rng = np.random.default_rng(103)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, L, FF = 256, 64, 4, 2, 96
    DN, DR, DV, QR, KVR = 16, 8, 16, 32, 24
    DK = DN + DR
    cfg = {
        "architectures": ["MiniCPM3ForCausalLM"],
        "hidden_size": C, "intermediate_size": FF,
        "num_attention_heads": H, "num_key_value_heads": H,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "qk_nope_head_dim": DN, "qk_rope_head_dim": DR, "v_head_dim": DV,
        "q_lora_rank": QR, "kv_lora_rank": KVR,
        "scale_emb": 2.0, "scale_depth": 1.4, "dim_model_base": 32,
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_a_proj.weight": r(QR, C),
            p + "self_attn.q_a_layernorm.weight": 1.0 + r(QR),
            p + "self_attn.q_b_proj.weight": r(H * DK, QR),
            p + "self_attn.kv_a_proj_with_mqa.weight": r(KVR + DR, C),
            p + "self_attn.kv_a_layernorm.weight": 1.0 + r(KVR),
            p + "self_attn.kv_b_proj.weight": r(H * (DN + DV), KVR),
            p + "self_attn.o_proj.weight": r(C, H * DV),
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })

    def rms(x, w, eps=1e-5):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + eps) \
            * torch.from_numpy(w)

    def lin(x, w):
        return x @ torch.from_numpy(ws[w]).T

    SCALE_RES = 1.4 / L ** 0.5

    def ref_forward(tokens):
        T = len(tokens)
        x = torch.from_numpy(ws["model.embed_tokens.weight"])[
            torch.tensor(tokens)] * 2.0                   # scale_emb
        pos = torch.arange(T, dtype=torch.float32)
        inv = 1.0 / (10000.0 ** (torch.arange(0, DR, 2).float() / DR))
        theta = pos[:, None] * inv[None, :]
        cos = torch.cat([theta.cos(), theta.cos()], -1)   # [T, DR]
        sin = torch.cat([theta.sin(), theta.sin()], -1)

        def rope(q):  # [T, ..., DR] half-split
            q1, q2 = q[..., :DR // 2], q[..., DR // 2:]
            rot = torch.cat([-q2, q1], -1)
            shape = (T,) + (1,) * (q.dim() - 2) + (DR,)
            return q * cos.view(shape) + rot * sin.view(shape)

        mask = torch.full((T, T), float("-inf")).triu(1)
        for i in range(L):
            p = f"model.layers.{i}."
            cur = rms(x, ws[p + "input_layernorm.weight"])
            q = lin(rms(lin(cur, p + "self_attn.q_a_proj.weight"),
                        ws[p + "self_attn.q_a_layernorm.weight"]),
                    p + "self_attn.q_b_proj.weight").view(T, H, DK)
            q_nope, q_pe = q[..., :DN], rope(q[..., DN:])
            ckv_pe = lin(cur, p + "self_attn.kv_a_proj_with_mqa.weight")
            ckv = rms(ckv_pe[:, :KVR],
                      ws[p + "self_attn.kv_a_layernorm.weight"])
            k_pe = rope(ckv_pe[:, KVR:])                  # [T, DR] shared
            kv = lin(ckv, p + "self_attn.kv_b_proj.weight") \
                .view(T, H, DN + DV)
            k = torch.cat([kv[..., :DN],
                           k_pe[:, None, :].expand(T, H, DR)], -1)
            qf = torch.cat([q_nope, q_pe], -1)
            att = torch.einsum("qhd,khd->hqk", qf, k) / DK ** 0.5
            att = (att + mask).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, kv[..., DN:]) \
                .reshape(T, H * DV)
            x = x + lin(o, p + "self_attn.o_proj.weight") * SCALE_RES
            cur = rms(x, ws[p + "post_attention_layernorm.weight"])
            ffn = lin(F.silu(lin(cur, p + "mlp.gate_proj.weight"))
                      * lin(cur, p + "mlp.up_proj.weight"),
                      p + "mlp.down_proj.weight")
            x = x + ffn * SCALE_RES
        x = rms(x, ws["model.norm.weight"])
        return (lin(x, "lm_head.weight") / (C / 32)).numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "minicpm3" and m.hp.n_lora_q == QR
    assert m.hp.head_dim == DK and m.hp.v_dim == DV
    assert m.hp.rope_type == "neox"
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_grok_matches_torch_reference(tmp_path):
    """grok (Grok-1): neox rope, post-attn/ffn rms norms applied BEFORE
    the residual adds, 8-expert top-2 renormalized tanh-GELU MoE,
    hardcoded embd x78.38 and logits x1/sqrt(3) multipliers, tied
    in_out_embed head, and the model's 30*tanh(x/30) attention softcap
    (the C++ reference omits the softcap — this engine follows the
    model, so the test validates against an independent torch
    reference with the softcap in place)."""
    import torch.nn.functional as F

    rng = np.random.default_rng(107)
    r = lambda *s: (rng.standard_normal(s) * 0.02).astype(np.float32)
    V, C, H, KV, L, E, FFE = 256, 64, 4, 2, 2, 4, 48
    d = C // H
    EMB_S, LOGIT_M = 78.38367176906169, 3.0 ** -0.5
    cfg = {
        "architectures": ["GrokForCausalLM"],
        "hidden_size": C, "intermediate_size": FFE,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "num_local_experts": E, "num_experts_per_tok": 2,
        "tie_word_embeddings": True, "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "transformer.in_out_embed.weight": r(V, C),
        "transformer.rms_norm.weight": 1.0 + r(C),
    }
    for i in range(L):
        p = f"transformer.decoder_layer.{i}."
        ws.update({
            p + "rms_norm.weight": 1.0 + r(C),
            p + "multi_head_attention.query.weight": r(H * d, C),
            p + "multi_head_attention.key.weight": r(KV * d, C),
            p + "multi_head_attention.value.weight": r(KV * d, C),
            p + "multi_head_attention.linear.weight": r(C, H * d),
            p + "rms_norm_1.weight": 1.0 + r(C),
            p + "rms_norm_2.weight": 1.0 + r(C),
            p + "router.weight": r(E, C),
            p + "rms_norm_3.weight": 1.0 + r(C),
        })
        for e in range(E):
            q = p + f"moe.{e}."
            ws.update({q + "linear.weight": r(FFE, C),      # gate
                       q + "linear_v.weight": r(FFE, C),    # up
                       q + "linear_1.weight": r(C, FFE)})   # down

    def rms(x, w):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + 1e-5) \
            * torch.from_numpy(w)

    def lin(x, w):
        return x @ torch.from_numpy(ws[w]).T

    def ref_forward(tokens):
        T = len(tokens)
        x = torch.from_numpy(ws["transformer.in_out_embed.weight"])[
            torch.tensor(tokens)] * EMB_S
        pos = torch.arange(T, dtype=torch.float32)
        inv = 1.0 / (10000.0 ** (torch.arange(0, d, 2).float() / d))
        theta = pos[:, None] * inv[None, :]
        cos = torch.cat([theta.cos(), theta.cos()], -1)
        sin = torch.cat([theta.sin(), theta.sin()], -1)

        def rope(q):
            q1, q2 = q[..., :d // 2], q[..., d // 2:]
            rot = torch.cat([-q2, q1], -1)
            return q * cos[:, None, :] + rot * sin[:, None, :]

        mask = torch.full((T, T), float("-inf")).triu(1)
        for i in range(L):
            p = f"transformer.decoder_layer.{i}."
            cur = rms(x, ws[p + "rms_norm.weight"])
            q = rope(lin(cur, p + "multi_head_attention.query.weight")
                     .view(T, H, d))
            k = rope(lin(cur, p + "multi_head_attention.key.weight")
                     .view(T, KV, d))
            v = lin(cur, p + "multi_head_attention.value.weight") \
                .view(T, KV, d)
            k = k.repeat_interleave(H // KV, dim=1)
            v = v.repeat_interleave(H // KV, dim=1)
            att = torch.einsum("qhd,khd->hqk", q, k) / d ** 0.5
            att = 30.0 * torch.tanh(att / 30.0)       # grok softcap
            att = (att + mask).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, H * d)
            o = lin(o, p + "multi_head_attention.linear.weight")
            x = x + rms(o, ws[p + "rms_norm_1.weight"])
            cur = rms(x, ws[p + "rms_norm_2.weight"])
            probs = lin(cur, p + "router.weight").softmax(-1)
            topv, topi = probs.topk(2, dim=-1)
            topv = topv / topv.sum(-1, keepdim=True)  # renorm
            ffn = torch.zeros_like(cur)
            for t in range(T):
                for j in range(2):
                    e = int(topi[t, j])
                    qq = f"{p}moe.{e}."
                    h = F.gelu(lin(cur[t], qq + "linear.weight"),
                               approximate="tanh") \
                        * lin(cur[t], qq + "linear_v.weight")
                    ffn[t] += topv[t, j] * lin(h, qq + "linear_1.weight")
            x = x + rms(ffn, ws[p + "rms_norm_3.weight"])
        x = rms(x, ws["transformer.rms_norm.weight"])
        head = torch.from_numpy(ws["transformer.in_out_embed.weight"])
        return ((x @ head.T) * LOGIT_M).numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "grok" and m.hp.n_expert == E
    assert m.hp.attn_softcap == pytest.approx(30.0)
    assert m.hp.embd_scale == pytest.approx(EMB_S)
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_arctic_matches_torch_reference(tmp_path):
    """arctic (llm_build_arctic): each layer runs a dense residual MLP
    on the post-attention sum IN PARALLEL with a top-2 renormalized MoE
    over the LAYER INPUT through its own norm (ffn_norm_exps); both add
    into the layer output."""
    import torch.nn.functional as F

    rng = np.random.default_rng(109)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, E, FF, FFE = 256, 64, 4, 2, 2, 4, 96, 48
    d = C // H
    cfg = {
        "architectures": ["ArcticForCausalLM"],
        "hidden_size": C, "intermediate_size": FFE,
        "num_attention_heads": H, "num_key_value_heads": KV,
        "num_hidden_layers": L, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": V,
        "num_local_experts": E, "num_experts_per_tok": 2,
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "input_layernorm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "residual_layernorm.weight": 1.0 + r(C),
            p + "residual_mlp.w1.weight": r(FF, C),      # gate
            p + "residual_mlp.w3.weight": r(FF, C),      # up
            p + "residual_mlp.w2.weight": r(C, FF),      # down
            p + "post_attention_layernorm.weight": 1.0 + r(C),  # moe norm
            p + "block_sparse_moe.gate.weight": r(E, C),
        })
        for e in range(E):
            q = p + f"block_sparse_moe.experts.{e}."
            ws.update({q + "w1.weight": r(FFE, C),
                       q + "w3.weight": r(FFE, C),
                       q + "w2.weight": r(C, FFE)})

    def rms(x, w):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + 1e-5) \
            * torch.from_numpy(w)

    def lin(x, w):
        return x @ torch.from_numpy(ws[w]).T

    def ref_forward(tokens):
        T = len(tokens)
        x = torch.from_numpy(ws["model.embed_tokens.weight"])[
            torch.tensor(tokens)]
        pos = torch.arange(T, dtype=torch.float32)
        inv = 1.0 / (10000.0 ** (torch.arange(0, d, 2).float() / d))
        theta = pos[:, None] * inv[None, :]
        cos = torch.cat([theta.cos(), theta.cos()], -1)
        sin = torch.cat([theta.sin(), theta.sin()], -1)

        def rope(q):
            q1, q2 = q[..., :d // 2], q[..., d // 2:]
            rot = torch.cat([-q2, q1], -1)
            return q * cos[:, None, :] + rot * sin[:, None, :]

        mask = torch.full((T, T), float("-inf")).triu(1)
        for i in range(L):
            p = f"model.layers.{i}."
            x_in = x
            cur = rms(x, ws[p + "input_layernorm.weight"])
            q = rope(lin(cur, p + "self_attn.q_proj.weight").view(T, H, d))
            k = rope(lin(cur, p + "self_attn.k_proj.weight").view(T, KV, d))
            v = lin(cur, p + "self_attn.v_proj.weight").view(T, KV, d)
            k = k.repeat_interleave(H // KV, dim=1)
            v = v.repeat_interleave(H // KV, dim=1)
            att = torch.einsum("qhd,khd->hqk", q, k) / d ** 0.5
            att = (att + mask).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, H * d)
            x = x + lin(o, p + "self_attn.o_proj.weight")
            # dense residual MLP on the post-attention sum
            cur = rms(x, ws[p + "residual_layernorm.weight"])
            dense = lin(F.silu(lin(cur, p + "residual_mlp.w1.weight"))
                        * lin(cur, p + "residual_mlp.w3.weight"),
                        p + "residual_mlp.w2.weight")
            ffn_out = x + dense
            # parallel MoE over the LAYER INPUT
            cur = rms(x_in, ws[p + "post_attention_layernorm.weight"])
            probs = lin(cur, p + "block_sparse_moe.gate.weight").softmax(-1)
            topv, topi = probs.topk(2, dim=-1)
            topv = topv / topv.sum(-1, keepdim=True)
            moe = torch.zeros_like(cur)
            for t in range(T):
                for j in range(2):
                    e = int(topi[t, j])
                    qq = f"{p}block_sparse_moe.experts.{e}."
                    h = F.silu(lin(cur[t], qq + "w1.weight")) \
                        * lin(cur[t], qq + "w3.weight")
                    moe[t] += topv[t, j] * lin(h, qq + "w2.weight")
            x = ffn_out + moe
        x = rms(x, ws["model.norm.weight"])
        return lin(x, "lm_head.weight").numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "arctic" and m.hp.n_expert == E
    assert m.weights.layers[0].ffn_norm_exps is not None
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_convert_openelm_matches_torch_reference(tmp_path):
    """openelm (llm_build_openelm): PER-LAYER head counts and ffn widths
    (GGUF head_count/head_count_kv/feed_forward_length arrays — reference
    llama-hparams.h n_head_arr), fused qkv split at the layer's counts,
    SHARED per-head q/k rms norms applied before NEOX rope, tied head."""
    import torch.nn.functional as F

    rng = np.random.default_rng(171)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, L, d = 256, 64, 3, 16
    NQ, NKV = [2, 3, 4], [1, 1, 2]
    MULT, DIV = [0.5, 1.0, 1.5], 32
    from llama_cpp_test_tpu.tools.convert_hf import _make_divisible
    FFD = [_make_divisible(m * C, DIV) for m in MULT]
    cfg = {
        "architectures": ["OpenELMForCausalLM"],
        "model_dim": C, "num_transformer_layers": L, "head_dim": d,
        "num_query_heads": NQ, "num_kv_heads": NKV,
        "ffn_multipliers": MULT, "ffn_dim_divisor": DIV,
        "max_context_length": 256, "rope_freq_constant": 10000,
        "vocab_size": V, "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "transformer.token_embeddings.weight": r(V, C),
        "transformer.norm.weight": 1.0 + r(C),
    }
    for i in range(L):
        p = f"transformer.layers.{i}."
        nq, nkv, ff = NQ[i], NKV[i], FFD[i]
        ws.update({
            p + "attn_norm.weight": 1.0 + r(C),
            p + "attn.qkv_proj.weight": r((nq + 2 * nkv) * d, C),
            p + "attn.q_norm.weight": 1.0 + r(d),
            p + "attn.k_norm.weight": 1.0 + r(d),
            p + "attn.out_proj.weight": r(C, nq * d),
            p + "ffn_norm.weight": 1.0 + r(C),
            p + "ffn.proj_1.weight": r(2 * ff, C),
            p + "ffn.proj_2.weight": r(C, ff),
        })

    def rms(x, w, eps=1e-6):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + eps) \
            * torch.from_numpy(w)

    def lin(x, w):
        return x @ torch.from_numpy(ws[w]).T

    def rope(x, pos):
        # NEOX half-split (HF rotate_half)
        half = d // 2
        inv = 1.0 / (10000.0 ** (torch.arange(half).float() / half))
        th = pos[:, None].float() * inv[None]
        cos, sin = th.cos()[:, None], th.sin()[:, None]
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    def ref_forward(tokens):
        T = len(tokens)
        pos = torch.arange(T)
        x = torch.from_numpy(
            ws["transformer.token_embeddings.weight"])[torch.tensor(tokens)]
        mask = torch.full((T, T), float("-inf")).triu(1)
        for i in range(L):
            p = f"transformer.layers.{i}."
            nq, nkv = NQ[i], NKV[i]
            cur = rms(x, ws[p + "attn_norm.weight"])
            qkv = lin(cur, p + "attn.qkv_proj.weight") \
                .view(T, nq + 2 * nkv, d)
            q, k, v = qkv[:, :nq], qkv[:, nq:nq + nkv], qkv[:, nq + nkv:]
            q = rms(q, ws[p + "attn.q_norm.weight"])
            k = rms(k, ws[p + "attn.k_norm.weight"])
            q, k = rope(q, pos), rope(k, pos)
            g = nq // nkv
            k = k.repeat_interleave(g, dim=1)
            v = v.repeat_interleave(g, dim=1)
            att = torch.einsum("qhd,khd->hqk", q, k) / d ** 0.5
            att = (att + mask).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, nq * d)
            x = x + lin(o, p + "attn.out_proj.weight")
            cur = rms(x, ws[p + "ffn_norm.weight"])
            gu = lin(cur, p + "ffn.proj_1.weight")
            gg, u = gu[:, :FFD[i]], gu[:, FFD[i]:]
            x = x + lin(F.silu(gg) * u, p + "ffn.proj_2.weight")
        x = rms(x, ws["transformer.norm.weight"])
        return (x @ torch.from_numpy(
            ws["transformer.token_embeddings.weight"]).T).numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "openelm"
    assert m.hp.n_head_layers == tuple(NQ)
    assert m.hp.n_head_kv_layers == tuple(NKV)
    assert m.hp.n_ff_layers == tuple(FFD)
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    seq = ctx.new_seq()
    got = ctx.prefill(seq, tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])
    # greedy decode parity: exercises the per-layer-kv paged decode path
    cur = list(tokens) + [int(np.argmax(ref[-1]))]
    for _ in range(3):
        logits = ctx.decode([seq], [cur[-1]])[0]
        with torch.no_grad():
            want = np.argmax(ref_forward(cur)[-1])
        assert np.argmax(logits) == want
        cur.append(int(want))


def test_convert_deci_matches_torch_reference(tmp_path):
    """deci (llm_build_deci, Nemotron-51B block_configs): per-layer kv
    head counts, an ATTENTION-FREE layer (n_head 0: block is just the
    FFN) and a LINEAR-ATTENTION layer (n_head_kv 0: one n_embd x n_embd
    projection of the normed input), NORM rope, per-layer ffn widths."""
    import torch.nn.functional as F

    rng = np.random.default_rng(173)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, d = 256, 64, 4, 16
    BLOCKS = [
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
        {"attention": {"n_heads_in_group": None,
                       "replace_with_linear": False},          # attn-free
         "ffn": {"ffn_mult": 1.0}},
        {"attention": {"n_heads_in_group": None,
                       "replace_with_linear": True},           # linear
         "ffn": {"ffn_mult": 1.0}},
        {"attention": {"n_heads_in_group": 4, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
    ]
    L = len(BLOCKS)
    FF = 256  # int(2*1.0*64/3)=42 -> _find_multiple(.., 256)
    cfg = {
        "architectures": ["DeciLMForCausalLM"],
        "hidden_size": C, "num_attention_heads": H,
        "num_hidden_layers": L, "block_configs": BLOCKS,
        "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "vocab_size": V,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i, bc in enumerate(BLOCKS):
        p = f"model.layers.{i}."
        grp = bc["attention"]["n_heads_in_group"]
        if grp is not None:
            nkv = H // grp
            ws.update({
                p + "input_layernorm.weight": 1.0 + r(C),
                p + "self_attn.q_proj.weight": r(H * d, C),
                p + "self_attn.k_proj.weight": r(nkv * d, C),
                p + "self_attn.v_proj.weight": r(nkv * d, C),
                p + "self_attn.o_proj.weight": r(C, H * d),
            })
        elif bc["attention"]["replace_with_linear"]:
            ws.update({
                p + "input_layernorm.weight": 1.0 + r(C),
                p + "self_attn.linear_attn.weight": r(C, C),
            })
        ws.update({
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })

    def rms(x, w, eps=1e-5):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + eps) \
            * torch.from_numpy(w)

    def lin(x, w):
        return x @ torch.from_numpy(ws[w]).T

    def rope(x, pos):
        half = d // 2
        inv = 1.0 / (10000.0 ** (torch.arange(half).float() / half))
        th = pos[:, None].float() * inv[None]
        cos, sin = th.cos()[:, None], th.sin()[:, None]
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    def ref_forward(tokens):
        T = len(tokens)
        pos = torch.arange(T)
        x = torch.from_numpy(
            ws["model.embed_tokens.weight"])[torch.tensor(tokens)]
        mask = torch.full((T, T), float("-inf")).triu(1)
        for i, bc in enumerate(BLOCKS):
            p = f"model.layers.{i}."
            grp = bc["attention"]["n_heads_in_group"]
            if grp is not None:
                nkv = H // grp
                cur = rms(x, ws[p + "input_layernorm.weight"])
                q = lin(cur, p + "self_attn.q_proj.weight").view(T, H, d)
                k = lin(cur, p + "self_attn.k_proj.weight").view(T, nkv, d)
                v = lin(cur, p + "self_attn.v_proj.weight").view(T, nkv, d)
                q, k = rope(q, pos), rope(k, pos)
                k = k.repeat_interleave(grp, dim=1)
                v = v.repeat_interleave(grp, dim=1)
                att = torch.einsum("qhd,khd->hqk", q, k) / d ** 0.5
                att = (att + mask).softmax(-1)
                o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, H * d)
                x = x + lin(o, p + "self_attn.o_proj.weight")
            elif bc["attention"]["replace_with_linear"]:
                cur = rms(x, ws[p + "input_layernorm.weight"])
                x = x + lin(cur, p + "self_attn.linear_attn.weight")
            # attention-free: x unchanged (ffn_inp = layer input)
            cur = rms(x, ws[p + "post_attention_layernorm.weight"])
            g = lin(cur, p + "mlp.gate_proj.weight")
            u = lin(cur, p + "mlp.up_proj.weight")
            x = x + lin(F.silu(g) * u, p + "mlp.down_proj.weight")
        x = rms(x, ws["model.norm.weight"])
        return lin(x, "lm_head.weight").numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "deci"
    assert m.hp.n_head_layers == (4, 0, 4, 4)
    assert m.hp.n_head_kv_layers == (2, 0, 0, 1)
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    seq = ctx.new_seq()
    got = ctx.prefill(seq, tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])
    # greedy decode through the attn-free/linear/per-kv layer mix
    cur = list(tokens) + [int(np.argmax(ref[-1]))]
    for _ in range(3):
        logits = ctx.decode([seq], [cur[-1]])[0]
        with torch.no_grad():
            want = np.argmax(ref_forward(cur)[-1])
        assert np.argmax(logits) == want
        cur.append(int(want))


def test_convert_plamo_matches_torch_reference(tmp_path):
    """plamo (llm_build_plamo): parallel residual — ONE rms norm feeds
    both attention and the swiglu FFN, x + attn + ffn — with INTERLEAVED
    GQA (HF q head i reads kv head i % n_kv; regrouped kv-major at
    convert, generalizing the reference PlamoModel shuffles). The config's
    num_key_value_heads is deliberately wrong here, as on the real
    checkpoint — the converter derives it from the k_proj plane width."""
    import torch.nn.functional as F

    rng = np.random.default_rng(179)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF = 256, 64, 8, 2, 2, 96
    d = C // H
    NS = H // KV
    cfg = {
        "architectures": ["PlamoForCausalLM"],
        "hidden_size": C, "num_attention_heads": H,
        "num_key_value_heads": H,   # wrong, like the real config
        "num_hidden_layers": L, "intermediate_size": FF,
        "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
        "vocab_size": V, "bos_token_id": 1, "eos_token_id": 2,
    }
    ws = {
        "model.embed_tokens.weight": r(V, C),
        "model.norm.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.layers.{i}."
        ws.update({
            p + "norm.weight": 1.0 + r(C),
            p + "self_attn.q_proj.weight": r(H * d, C),
            p + "self_attn.k_proj.weight": r(KV * d, C),
            p + "self_attn.v_proj.weight": r(KV * d, C),
            p + "self_attn.o_proj.weight": r(C, H * d),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })

    def rms(x, w, eps=1e-5):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + eps) \
            * torch.from_numpy(w)

    def lin(x, w):
        return x @ torch.from_numpy(ws[w]).T

    def rope(x, pos):
        dd = x.shape[-1]
        half = dd // 2
        inv = 1.0 / (10000.0 ** (torch.arange(half).float() / half))
        th = pos[:, None].float() * inv[None]
        cos, sin = th.cos()[:, None], th.sin()[:, None]
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    def ref_forward(tokens):
        T = len(tokens)
        pos = torch.arange(T)
        x = torch.from_numpy(
            ws["model.embed_tokens.weight"])[torch.tensor(tokens)]
        mask = torch.full((T, T), float("-inf")).triu(1)
        for i in range(L):
            p = f"model.layers.layers.{i}."
            n = rms(x, ws[p + "norm.weight"])
            q = lin(n, p + "self_attn.q_proj.weight").view(T, H, d)
            k = lin(n, p + "self_attn.k_proj.weight").view(T, KV, d)
            v = lin(n, p + "self_attn.v_proj.weight").view(T, KV, d)
            q, k = rope(q, pos), rope(k, pos)
            # HF interleaved GQA: q head i reads kv head i % KV
            k = k.repeat(1, NS, 1).view(T, H, d)
            v = v.repeat(1, NS, 1).view(T, H, d)
            att = torch.einsum("qhd,khd->hqk", q, k) / d ** 0.5
            att = (att + mask).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, H * d)
            attn_out = lin(o, p + "self_attn.o_proj.weight")
            g = lin(n, p + "mlp.gate_proj.weight")
            u = lin(n, p + "mlp.up_proj.weight")
            ffn = lin(F.silu(g) * u, p + "mlp.down_proj.weight")
            x = x + attn_out + ffn
        x = rms(x, ws["model.norm.weight"])
        return lin(x, "lm_head.weight").numpy()

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    with open(hf_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    _bpe_tokenizer_json(str(hf_dir), V)
    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    m = Model(out)
    assert m.hp.arch == "plamo"
    assert m.hp.n_head_kv == KV     # derived from k_proj, not the config
    assert m.hp.parallel_residual
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Context(m, n_ctx=64, n_seq_max=1, block_size=8)
    got = ctx.prefill(ctx.new_seq(), tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])
