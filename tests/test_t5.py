"""T5 encoder-decoder cross-validation vs transformers (reference
llm_build_t5_enc / llm_build_t5_dec + the llama_encode -> decode flow).
Covers: relative bucket bias (bidirectional + unidirectional), NO
attention scale, d_kv != d_model/n_head, cross-attention, relu (v1.0,
tied scaled head) and gated-gelu (v1.1, untied) FFNs, t5encoder arch."""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
st = pytest.importorskip("safetensors.numpy")

V, C, L, H, DKV, FF, NB = 256, 48, 2, 4, 16, 96, 8


def _t5_ws(rng, gated, tied):
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    ws = {"shared.weight": r(V, C)}
    if not tied:
        ws["lm_head.weight"] = r(V, C)
    for side, n_ff_layer in (("encoder", 1), ("decoder", 2)):
        ws[f"{side}.final_layer_norm.weight"] = 1.0 + r(C)
        for i in range(L):
            p = f"{side}.block.{i}."
            ws.update({
                p + "layer.0.SelfAttention.q.weight": r(H * DKV, C),
                p + "layer.0.SelfAttention.k.weight": r(H * DKV, C),
                p + "layer.0.SelfAttention.v.weight": r(H * DKV, C),
                p + "layer.0.SelfAttention.o.weight": r(C, H * DKV),
                p + "layer.0.layer_norm.weight": 1.0 + r(C),
            })
            if i == 0:
                ws[p + "layer.0.SelfAttention.relative_attention_bias"
                     ".weight"] = r(NB, H)
            if side == "decoder":
                ws.update({
                    p + "layer.1.EncDecAttention.q.weight": r(H * DKV, C),
                    p + "layer.1.EncDecAttention.k.weight": r(H * DKV, C),
                    p + "layer.1.EncDecAttention.v.weight": r(H * DKV, C),
                    p + "layer.1.EncDecAttention.o.weight": r(C, H * DKV),
                    p + "layer.1.layer_norm.weight": 1.0 + r(C),
                })
            q = p + f"layer.{n_ff_layer}.DenseReluDense."
            if gated:
                ws[q + "wi_0.weight"] = r(FF, C)
                ws[q + "wi_1.weight"] = r(FF, C)
            else:
                ws[q + "wi.weight"] = r(FF, C)
            ws[q + "wo.weight"] = r(C, FF)
            ws[p + f"layer.{n_ff_layer}.layer_norm.weight"] = 1.0 + r(C)
    return ws


def _cfg(gated, tied):
    return {
        "architectures": ["T5ForConditionalGeneration"],
        "d_model": C, "d_kv": DKV, "d_ff": FF, "num_layers": L,
        "num_decoder_layers": L, "num_heads": H,
        "relative_attention_num_buckets": NB,
        "layer_norm_epsilon": 1e-6, "vocab_size": V,
        "feed_forward_proj": "gated-gelu" if gated else "relu",
        "tie_word_embeddings": tied, "decoder_start_token_id": 0,
        "pad_token_id": 0, "eos_token_id": 1, "n_positions": 128,
    }


def _hf(ws, gated, tied):
    from transformers import T5Config, T5ForConditionalGeneration

    tcfg = T5Config(
        vocab_size=V, d_model=C, d_kv=DKV, d_ff=FF, num_layers=L,
        num_decoder_layers=L, num_heads=H,
        relative_attention_num_buckets=NB, layer_norm_epsilon=1e-6,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tied, decoder_start_token_id=0,
        pad_token_id=0, eos_token_id=1)
    hf = T5ForConditionalGeneration(tcfg)
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in ws.items()},
        strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    return hf


def _build(tmp_path, gated, tied, seed):
    ws = _t5_ws(np.random.default_rng(seed), gated, tied)
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir(exist_ok=True)
    with open(hf_dir / "config.json", "w") as f:
        json.dump(_cfg(gated, tied), f)
    st.save_file(ws, str(hf_dir / "model.safetensors"))
    vocab = {f"<t{i}>": i for i in range(V)}
    with open(hf_dir / "tokenizer.json", "w") as f:
        json.dump({"model": {"type": "BPE", "vocab": vocab, "merges": []},
                   "added_tokens": []}, f)
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(str(hf_dir), out, dtype="F32")
    return ws, out


@pytest.mark.parametrize("gated,tied", [(False, True), (True, False)])
def test_t5_encoder_decoder_matches_transformers(tmp_path, gated, tied):
    """Teacher-forced decoder logits parity over every position, both
    FFN generations (relu/tied-scaled-head and gated-gelu/untied)."""
    ws, out = _build(tmp_path, gated, tied, seed=51 + gated)
    from llama_cpp_test_tpu.models.t5 import T5Context, T5Model

    m = T5Model(out)
    assert m.hp.gated == gated and m.hp.d_kv == DKV
    src = [3, 17, 42, 9, 150]
    dec_in = [0, 7, 22, 100]          # starts with decoder_start_token
    hf = _hf(ws, gated, tied)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([src]),
                 decoder_input_ids=torch.tensor([dec_in])
                 ).logits[0].numpy()
    ctx = T5Context(m, n_ctx=32)
    ctx.encode(src)
    got = np.stack([ctx.decode(t) for t in dec_in])
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 2e-3, err
    for i in range(len(dec_in)):
        assert np.argmax(got[i]) == np.argmax(ref[i])


def test_t5_generate_matches_hf_greedy(tmp_path):
    ws, out = _build(tmp_path, gated=True, tied=False, seed=53)
    from llama_cpp_test_tpu.models.t5 import T5Context, T5Model, generate

    m = T5Model(out)
    hf = _hf(ws, gated=True, tied=False)
    src = [3, 17, 42, 9]
    with torch.no_grad():
        ref = hf.generate(torch.tensor([src]), max_new_tokens=8,
                          do_sample=False)[0].tolist()
    # HF output begins with decoder_start_token and may end with eos
    ref_toks = [t for t in ref[1:] if t != 1]
    ctx = T5Context(m, n_ctx=32)
    got = list(generate(ctx, src, 8, eos_id=1))
    assert got[:len(ref_toks)] == ref_toks


def test_t5encoder_arch_embeddings(tmp_path):
    """t5encoder GGUF (encoder-only): encode() matches the full model's
    encoder output; engine refuses the arch with a pointer."""
    ws, _ = _build(tmp_path, gated=True, tied=False, seed=55)
    # rewrite config as encoder-only and drop decoder tensors
    cfgd = _cfg(True, False)
    cfgd["architectures"] = ["T5EncoderModel"]
    with open(tmp_path / "hf" / "config.json", "w") as f:
        json.dump(cfgd, f)
    enc_ws = {k: v for k, v in ws.items()
              if not k.startswith("decoder.") and k != "lm_head.weight"}
    st.save_file(enc_ws, str(tmp_path / "hf" / "model.safetensors"))
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "enc.gguf")
    convert(str(tmp_path / "hf"), out, dtype="F32")
    from llama_cpp_test_tpu.models.t5 import T5Context, T5Model

    m = T5Model(out)
    assert m.hp.arch == "t5encoder" and m.dec is None
    src = [3, 17, 42, 9, 150]
    got = T5Context(m, n_ctx=32).encode(src)

    from transformers import T5Config, T5EncoderModel as HFT5Enc

    tcfg = T5Config(
        vocab_size=V, d_model=C, d_kv=DKV, d_ff=FF, num_layers=L,
        num_heads=H, relative_attention_num_buckets=NB,
        layer_norm_epsilon=1e-6, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, decoder_start_token_id=0,
        pad_token_id=0, eos_token_id=1)
    hf = HFT5Enc(tcfg)
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in enc_ws.items()},
        strict=False)
    assert not missing.unexpected_keys
    hf.eval()
    with torch.no_grad():
        ref = hf(torch.tensor([src])).last_hidden_state[0].numpy()
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 1e-4, err

    from llama_cpp_test_tpu.runtime.engine import Model

    with pytest.raises(ValueError, match="encoder-decoder"):
        Model(out)
