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
