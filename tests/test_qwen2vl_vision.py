"""Qwen2-VL vision tower + image M-RoPE cross-validation vs transformers
(the qwen2vl-cli/clip.cpp qwen2vl-branch analogue)."""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
st = pytest.importorskip("safetensors.numpy")

# tiny geometry: embed 32, 2 heads (head_dim 16 -> 2D rope quarter 4),
# 2 blocks, out dim 48, 4x4 patch grid (16 patches -> 4 merged tokens)
E, HEADS, DEPTH, OUT, MLP, P = 32, 2, 2, 48, 64, 4
GH = GW = 4


def _vision_cfg():
    return {"embed_dim": E, "num_heads": HEADS, "depth": DEPTH,
            "hidden_size": OUT, "mlp_ratio": MLP // E, "in_channels": 3,
            "patch_size": P, "spatial_merge_size": 2,
            "temporal_patch_size": 2, "hidden_act": "quick_gelu"}


def _vision_ws(rng):
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    ws = {"visual.patch_embed.proj.weight":
          r(E, 3, 2, P, P),
          "visual.merger.ln_q.weight": 1.0 + r(E),
          "visual.merger.ln_q.bias": r(E),
          "visual.merger.mlp.0.weight": r(4 * E, 4 * E),
          "visual.merger.mlp.0.bias": r(4 * E),
          "visual.merger.mlp.2.weight": r(OUT, 4 * E),
          "visual.merger.mlp.2.bias": r(OUT)}
    for i in range(DEPTH):
        p = f"visual.blocks.{i}."
        ws.update({
            p + "norm1.weight": 1.0 + r(E), p + "norm1.bias": r(E),
            p + "attn.qkv.weight": r(3 * E, E),
            p + "attn.qkv.bias": r(3 * E),
            p + "attn.proj.weight": r(E, E),
            p + "attn.proj.bias": r(E),
            p + "norm2.weight": 1.0 + r(E), p + "norm2.bias": r(E),
            p + "mlp.fc1.weight": r(MLP, E), p + "mlp.fc1.bias": r(MLP),
            p + "mlp.fc2.weight": r(E, MLP), p + "mlp.fc2.bias": r(E),
        })
    return ws


def _full_cfg():
    return {
        "architectures": ["Qwen2VLForConditionalGeneration"],
        "hidden_size": OUT, "intermediate_size": 64,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "num_hidden_layers": 2, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0, "vocab_size": 128,
        "rope_scaling": {"type": "mrope", "mrope_section": [2, 2, 2]},
        "image_token_id": 120, "vision_start_token_id": 121,
        "vision_end_token_id": 122, "vision_config": _vision_cfg(),
        "bos_token_id": 1, "eos_token_id": 2, "tie_word_embeddings": False,
    }


def _text_ws(rng):
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    V, C, H, KV, L, FF, d = 128, OUT, 4, 2, 2, 64, 12
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
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    return ws


def _write_hf(tmp_path, cfg, ws):
    d = tmp_path / "hf"
    d.mkdir(exist_ok=True)
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(d / "model.safetensors"))
    vocab = {f"<t{i}>": i for i in range(cfg.get("vocab_size", 128))}
    tj = {"model": {"type": "BPE", "vocab": vocab, "merges": []},
          "added_tokens": []}
    with open(d / "tokenizer.json", "w") as f:
        json.dump(tj, f)
    return str(d)


def test_vision_tower_matches_transformers(tmp_path):
    from transformers import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel)

    rng = np.random.default_rng(51)
    ws = _vision_ws(rng)
    hf_dir = _write_hf(tmp_path, _full_cfg(), {**ws, **_text_ws(rng)})

    from llama_cpp_test_tpu.tools.convert_hf import convert_qwen2vl_mmproj
    from llama_cpp_test_tpu.models import qwen2vl_vision as qv

    mmproj = str(tmp_path / "mmproj.gguf")
    convert_qwen2vl_mmproj(hf_dir, mmproj)
    m = qv.load_qwen2vl_vision(mmproj)
    assert m.embed == E and m.n_layer == DEPTH and m.out_dim == OUT

    patches = (rng.standard_normal(
        (GH * GW, 3 * 2 * P * P)) * 0.5).astype(np.float32)
    got = qv.encode_image(m, patches, GH, GW)

    vcfg = Qwen2VLConfig(**{k: v for k, v in _full_cfg().items()
                            if k != "architectures"}).vision_config
    hf = Qwen2VisionTransformerPretrainedModel._from_config(
        vcfg, attn_implementation="eager")
    sd = {k[len("visual."):]: torch.from_numpy(v.copy())
          for k, v in ws.items()}
    missing = hf.load_state_dict(sd, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    with torch.no_grad():
        ref = hf(torch.from_numpy(patches),
                 grid_thw=torch.tensor([[1, GH, GW]])).numpy()
    assert got.shape == ref.shape
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-3, err


def test_image_pipeline_matches_transformers(tmp_path):
    """Full image serving path: vision tower -> prefill_embeds with
    M-RoPE streams -> pos_offset'd text continuation, logits vs the HF
    Qwen2VLForConditionalGeneration forward (which runs get_rope_index)."""
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    rng = np.random.default_rng(52)
    vws = _vision_ws(rng)
    tws = _text_ws(rng)
    cfg = _full_cfg()
    hf_dir = _write_hf(tmp_path, cfg, {**vws, **tws})

    from llama_cpp_test_tpu.models import qwen2vl_vision as qv
    from llama_cpp_test_tpu.tools.convert_hf import (convert,
                                                     convert_qwen2vl_mmproj)

    mmproj = str(tmp_path / "mmproj.gguf")
    convert_qwen2vl_mmproj(hf_dir, mmproj)
    text_gguf = str(tmp_path / "text.gguf")
    convert(hf_dir, text_gguf, dtype="F32")

    patches = (rng.standard_normal(
        (GH * GW, 3 * 2 * P * P)) * 0.5).astype(np.float32)
    pre = [3, 5, 121]
    post = [122, 7, 9]
    ids = pre + [120] * 4 + post

    tcfg = Qwen2VLConfig(**{k: v for k, v in cfg.items()
                            if k != "architectures"},
                         attn_implementation="eager")
    hf = Qwen2VLForConditionalGeneration(tcfg)
    sd = {k: torch.from_numpy(v.copy()) for k, v in {**vws, **tws}.items()}
    sd = {(k if k.startswith("visual.") else
           ("model." + k if not k.startswith(("model.", "lm_head."))
            else k)): v for k, v in sd.items()}
    # HF nests text under model.language_model and vision under
    # model.visual in 4.5x
    fixed = {}
    for k, v in sd.items():
        if k.startswith("visual."):
            fixed["model." + k] = v
        elif k.startswith("model."):
            fixed["model.language_model." + k[len("model."):]] = v
        else:
            fixed[k] = v
    missing = hf.load_state_dict(fixed, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    with torch.no_grad():
        ref = hf(torch.tensor([ids]),
                 pixel_values=torch.from_numpy(patches),
                 image_grid_thw=torch.tensor([[1, GH, GW]])).logits[0].numpy()

    from llama_cpp_test_tpu.runtime.engine import Context, Model

    vm = qv.load_qwen2vl_vision(mmproj)
    embeds = qv.encode_image(vm, patches, GH, GW)
    model = Model(text_gguf)
    assert model.hp.mrope_sections == (2, 2, 2)
    ctx = Context(model, n_ctx=64, n_seq_max=1, block_size=8)
    s = ctx.new_seq()
    ctx.prefill(s, pre)
    t0 = len(pre)
    mr = qv.mrope_image_positions(t0, GH, GW)
    np.testing.assert_array_equal(
        mr, [[3, 3, 3], [3, 3, 4], [3, 4, 3], [3, 4, 4]])
    ctx.prefill_embeds(s, embeds, placeholder_token=120, mrope_pos=mr)
    s.pos_offset = qv.mrope_delta_after_image(t0, GH, GW) - s.n_cached
    assert s.pos_offset == -2
    got = ctx.prefill(s, post)
    err = np.mean((got - ref[-1]) ** 2) / (np.mean(ref[-1] ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got) == np.argmax(ref[-1])

    # greedy continuation stays aligned (decode path rides rope_delta)
    tok = int(np.argmax(got))
    with torch.no_grad():
        ref2 = hf(torch.tensor([ids + [tok]]),
                  pixel_values=torch.from_numpy(patches),
                  image_grid_thw=torch.tensor([[1, GH, GW]])
                  ).logits[0, -1].numpy()
    got2 = ctx.decode([s], [tok])[0]
    assert np.argmax(got2) == np.argmax(ref2)
