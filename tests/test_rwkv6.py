"""RWKV6 cross-validation — converter + recurrent prefill/decode
(models/rwkv6.py, the llm_build_rwkv6 analogue).

The HF class is remote-code, so the reference here is an independent
torch transcription of the spec: the reference graph builder
(llama-model.cpp llm_build_rwkv6/build_rwkv6_time_mix) and the wkv6
kernel's scalar loop (ggml-cpu.c ggml_compute_forward_rwkv_wkv6_f32),
operating directly on the HF-layout tensors (time_maa_* naming)."""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
st = pytest.importorskip("safetensors.numpy")

V, C, L, D = 256, 64, 2, 16
H = C // D
E, E2, FF = 8, 16, 96


def _rwkv6_ws(rng):
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    ws = {
        "rwkv.embeddings.weight": r(V, C),
        "rwkv.blocks.0.pre_ln.weight": 1.0 + r(C),
        "rwkv.blocks.0.pre_ln.bias": r(C),
        "rwkv.ln_out.weight": 1.0 + r(C),
        "rwkv.ln_out.bias": r(C),
        "head.weight": r(V, C),
    }
    for i in range(L):
        p = f"rwkv.blocks.{i}."
        ws.update({
            p + "ln1.weight": 1.0 + r(C), p + "ln1.bias": r(C),
            p + "ln2.weight": 1.0 + r(C), p + "ln2.bias": r(C),
            p + "attention.time_maa_x": r(1, 1, C),
            p + "attention.time_maa_w": r(1, 1, C),
            p + "attention.time_maa_k": r(1, 1, C),
            p + "attention.time_maa_v": r(1, 1, C),
            p + "attention.time_maa_r": r(1, 1, C),
            p + "attention.time_maa_g": r(1, 1, C),
            p + "attention.time_maa_w1": r(C, 5 * E),
            p + "attention.time_maa_w2": r(5, E, C),
            p + "attention.time_decay": r(1, 1, C) - 4.0,
            p + "attention.time_decay_w1": r(C, E2),
            p + "attention.time_decay_w2": r(E2, C),
            p + "attention.time_faaaa": r(H, D),
            p + "attention.key.weight": r(C, C),
            p + "attention.value.weight": r(C, C),
            p + "attention.receptance.weight": r(C, C),
            p + "attention.gate.weight": r(C, C),
            p + "attention.ln_x.weight": 1.0 + r(C),
            p + "attention.ln_x.bias": r(C),
            p + "attention.output.weight": r(C, C),
            p + "feed_forward.time_maa_k": r(1, 1, C),
            p + "feed_forward.time_maa_r": r(1, 1, C),
            p + "feed_forward.key.weight": r(FF, C),
            p + "feed_forward.receptance.weight": r(C, C),
            p + "feed_forward.value.weight": r(C, FF),
        })
    return ws


def _write_hf(tmp_path, ws, rescale_every=0):
    cfg = {
        "architectures": ["Rwkv6ForCausalLM"],
        "hidden_size": C, "num_hidden_layers": L, "head_size": D,
        "attention_hidden_size": C, "intermediate_size": FF,
        "vocab_size": V, "layer_norm_epsilon": 1e-5,
        "rescale_every": rescale_every,
        "bos_token_id": 0, "eos_token_id": 0,
    }
    d = tmp_path / "hf"
    d.mkdir(exist_ok=True)
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    st.save_file(ws, str(d / "model.safetensors"))
    vocab = {f"<t{i}>": i for i in range(V)}
    with open(d / "tokenizer.json", "w") as f:
        json.dump({"model": {"type": "BPE", "vocab": vocab, "merges": []},
                   "added_tokens": []}, f)
    return str(d)


def _ref_forward(ws, tokens):
    """UNSCALED rwkv6 forward on HF-layout weights (spec: llm_build_rwkv6
    + ggml wkv6 scalar loop). Returns [T, V] float64 logits."""
    F = torch.nn.functional
    tw = {k: torch.from_numpy(v).double() for k, v in ws.items()}

    def ln(x, p, eps=1e-5):
        return F.layer_norm(x, (C,), tw[p + ".weight"], tw[p + ".bias"],
                            eps)

    T = len(tokens)
    x = tw["rwkv.embeddings.weight"][torch.tensor(tokens)]
    x = ln(x, "rwkv.blocks.0.pre_ln")
    for i in range(L):
        p = f"rwkv.blocks.{i}."
        xa = ln(x, p + "ln1")
        x_prev = torch.cat([torch.zeros(1, C, dtype=torch.float64),
                            xa[:-1]], 0)
        sx = x_prev - xa
        xxx = xa + sx * tw[p + "attention.time_maa_x"].view(C)
        tmp = torch.tanh(xxx @ tw[p + "attention.time_maa_w1"]) \
            .view(T, 5, E).transpose(0, 1)            # [5, T, E]
        five = torch.bmm(tmp, tw[p + "attention.time_maa_w2"])  # [5,T,C]
        maa = torch.stack([tw[p + f"attention.time_maa_{s}"].view(C)
                           for s in "wkvrg"])          # [5, C]
        xi = xa[None] + sx[None] * (five + maa[:, None, :])
        xw, xk, xv, xr, xg = xi.unbind(0)
        r = (xr @ tw[p + "attention.receptance.weight"].T).view(T, H, D)
        k = (xk @ tw[p + "attention.key.weight"].T).view(T, H, D)
        v = (xv @ tw[p + "attention.value.weight"].T).view(T, H, D)
        g = F.silu(xg @ tw[p + "attention.gate.weight"].T)
        w = torch.tanh(xw @ tw[p + "attention.time_decay_w1"]) \
            @ tw[p + "attention.time_decay_w2"]
        w = w + tw[p + "attention.time_decay"].view(C)
        w = torch.exp(-torch.exp(w)).view(T, H, D)
        first = tw[p + "attention.time_faaaa"]         # [H, D]
        S = torch.zeros(H, D, D, dtype=torch.float64)
        outs = []
        for t in range(T):
            kv = k[t][:, :, None] * v[t][:, None, :]   # [H, D, D]
            out = torch.einsum("hi,hij->hj", r[t],
                               first[:, :, None] * kv + S)
            S = S * w[t][:, :, None] + kv
            outs.append(out)
        out = torch.stack(outs).reshape(T, C)
        out = F.group_norm(out, H, tw[p + "attention.ln_x.weight"],
                           tw[p + "attention.ln_x.bias"], eps=64e-5)
        x = x + (out * g) @ tw[p + "attention.output.weight"].T
        # channel mix
        xf = ln(x, p + "ln2")
        f_prev = torch.cat([torch.zeros(1, C, dtype=torch.float64),
                            xf[:-1]], 0)
        sx2 = f_prev - xf
        xk2 = xf + sx2 * tw[p + "feed_forward.time_maa_k"].view(C)
        xr2 = xf + sx2 * tw[p + "feed_forward.time_maa_r"].view(C)
        rr = torch.sigmoid(xr2 @ tw[p + "feed_forward.receptance.weight"].T)
        kk = torch.relu(xk2 @ tw[p + "feed_forward.key.weight"].T) ** 2
        x = x + rr * (kk @ tw[p + "feed_forward.value.weight"].T)
    x = ln(x, "rwkv.ln_out")
    return (x @ tw["head.weight"].T).numpy()


def test_rwkv6_prefill_matches_torch_reference(tmp_path):
    rng = np.random.default_rng(191)
    ws = _rwkv6_ws(rng)
    d = _write_hf(tmp_path, ws)
    from llama_cpp_test_tpu.models.rwkv6 import Rwkv6Context, Rwkv6Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(d, out, dtype="F32")
    m = Rwkv6Model(out)
    assert m.hp.n_head == H and m.hp.head_size == D
    tokens = [3, 17, 42, 9, 150, 7, 20]
    with torch.no_grad():
        ref = _ref_forward(ws, tokens)
    ctx = Rwkv6Context(m)
    got = ctx.prefill(tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_rwkv6_stepwise_state_equals_full_prefill(tmp_path):
    """Chunked prefill + decode must land in the same state (and emit the
    same logits) as one full prefill — the recurrence carries history."""
    rng = np.random.default_rng(193)
    ws = _rwkv6_ws(rng)
    d = _write_hf(tmp_path, ws)
    from llama_cpp_test_tpu.models.rwkv6 import Rwkv6Context, Rwkv6Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(d, out, dtype="F32")
    m = Rwkv6Model(out)
    tokens = [5, 99, 3, 200, 41, 8]
    full = Rwkv6Context(m)
    lf = full.prefill(tokens)
    step = Rwkv6Context(m)
    step.prefill(tokens[:3])
    for t in tokens[3:-1]:
        step.decode(t)
    ls = step.decode(tokens[-1])
    np.testing.assert_allclose(lf, ls, rtol=2e-4, atol=2e-4)
    for a, b in zip(full.states, step.states):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_rwkv6_rescale_equivalence(tmp_path):
    """rescale_every > 0: convert-time weight division by
    2^(il//rescale) composed with the runtime 0.5 activation halving
    equals the unscaled model (LayerNorm scale invariance — reference
    Rwkv6Model.modify_tensors + llm_build_rwkv6 ggml_scale)."""
    rng = np.random.default_rng(197)
    ws = _rwkv6_ws(rng)
    d = _write_hf(tmp_path, ws, rescale_every=1)
    from llama_cpp_test_tpu.models.rwkv6 import Rwkv6Context, Rwkv6Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(d, out, dtype="F32")
    m = Rwkv6Model(out)
    assert m.hp.rescale_every == 1
    tokens = [3, 17, 42, 9]
    with torch.no_grad():
        ref = _ref_forward(ws, tokens)     # UNSCALED math
    got = Rwkv6Context(m).prefill(tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err


def test_engine_model_refuses_rwkv6(tmp_path):
    rng = np.random.default_rng(199)
    d = _write_hf(tmp_path, _rwkv6_ws(rng))
    from llama_cpp_test_tpu.runtime.engine import Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(d, out, dtype="F32")
    with pytest.raises(ValueError, match="recurrent"):
        Model(out)


def test_rwkv6_cli_main_generates(tmp_path, capsys):
    """llama-cli surface: main.py auto-dispatches rwkv6 GGUFs to the
    recurrent context."""
    rng = np.random.default_rng(211)
    d = _write_hf(tmp_path, _rwkv6_ws(rng))
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(d, out, dtype="F32")

    from llama_cpp_test_tpu.cli.main import main

    rc = main(["-m", out, "-p", "<t3><t17>", "-n", "4"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "<t3><t17>" in captured.out


def test_rwkv6qwen2_prefill_matches_torch_reference(tmp_path):
    """rwkv6qwen2 (QRWKV, llm_build_rwkv6qwen2 + ggml_gated_linear_attn):
    qwen rms/swiglu body, q/k/v/o/gate projections with qwen biases on
    the time-mix slots, GQA kv-head repeat, sigmoid gate, k*(1-w), no
    first bonus / group norm, and the checkpoint's rkvwg low-rank lerp
    order permuted to wkvrg at convert."""
    import torch.nn.functional as F

    rng = np.random.default_rng(241)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    KVH = 2                         # GQA kv heads (H=4)
    E2q = 16                        # decay extra dim
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
            p + "self_attn.time_maa_x": r(1, 1, C),
            p + "self_attn.time_maa_w": r(1, 1, C),
            p + "self_attn.time_maa_k": r(1, 1, C),
            p + "self_attn.time_maa_v": r(1, 1, C),
            p + "self_attn.time_maa_r": r(1, 1, C),
            p + "self_attn.time_maa_g": r(1, 1, C),
            # low-rank token-dependent lerps in the checkpoint's rkvwg
            # 5-axis order
            p + "self_attn.time_maa_w1": r(C, 5 * E),
            p + "self_attn.time_maa_w2": r(5, E, C),
            p + "self_attn.time_decay": r(1, 1, C) - 4.0,
            p + "self_attn.time_decay_w1": r(C, E2q),
            p + "self_attn.time_decay_w2": r(E2q, C),
            p + "self_attn.q_proj.weight": r(C, C),
            p + "self_attn.q_proj.bias": r(C),
            p + "self_attn.k_proj.weight": r(KVH * D, C),
            p + "self_attn.k_proj.bias": r(KVH * D),
            p + "self_attn.v_proj.weight": r(KVH * D, C),
            p + "self_attn.v_proj.bias": r(KVH * D),
            p + "self_attn.gate.weight": r(C, C),
            p + "self_attn.o_proj.weight": r(C, C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
    cfg = {
        "architectures": ["RWKV6Qwen2ForCausalLM"],
        "hidden_size": C, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": KVH,
        "intermediate_size": FF, "vocab_size": V, "rms_norm_eps": 1e-5,
        "bos_token_id": 0, "eos_token_id": 0,
    }
    d = _write_hf(tmp_path, ws, 0)
    # overwrite config with the qwen2-variant one
    with open(d + "/config.json", "w") as f:
        json.dump(cfg, f)

    tw = {k: torch.from_numpy(v).double() for k, v in ws.items()}

    def rms(x, w):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + 1e-5) * w

    def ref_forward(tokens):
        T = len(tokens)
        x = tw["model.embed_tokens.weight"][torch.tensor(tokens)]
        for i in range(L):
            p = f"model.layers.{i}."
            xa = rms(x, tw[p + "input_layernorm.weight"])
            x_prev = torch.cat([torch.zeros(1, C, dtype=torch.float64),
                                xa[:-1]], 0)
            sx = x_prev - xa
            xxx = xa + sx * tw[p + "self_attn.time_maa_x"].view(C)
            tmp = torch.tanh(xxx @ tw[p + "self_attn.time_maa_w1"]) \
                .view(T, 5, E).transpose(0, 1)           # rkvwg order
            five = torch.bmm(tmp, tw[p + "self_attn.time_maa_w2"])
            maa = torch.stack([tw[p + f"self_attn.time_maa_{s}"].view(C)
                               for s in "rkvwg"])
            xi = xa[None] + sx[None] * (five + maa[:, None, :])
            xr, xk, xv, xw_, xg = xi.unbind(0)
            rr = xr @ tw[p + "self_attn.q_proj.weight"].T \
                + tw[p + "self_attn.q_proj.bias"]
            k = xk @ tw[p + "self_attn.k_proj.weight"].T \
                + tw[p + "self_attn.k_proj.bias"]
            v = xv @ tw[p + "self_attn.v_proj.weight"].T \
                + tw[p + "self_attn.v_proj.bias"]
            g = torch.sigmoid(xg @ tw[p + "self_attn.gate.weight"].T)
            w = torch.tanh(xw_ @ tw[p + "self_attn.time_decay_w1"]) \
                @ tw[p + "self_attn.time_decay_w2"] \
                + tw[p + "self_attn.time_decay"].view(C)
            w = torch.exp(-torch.exp(w)).view(T, H, D)
            rh = rr.view(T, H, D)
            kh = k.view(T, KVH, D).repeat_interleave(H // KVH, dim=1)
            vh = v.view(T, KVH, D).repeat_interleave(H // KVH, dim=1)
            kh = kh - kh * w                     # k * (1 - w)
            S = torch.zeros(H, D, D, dtype=torch.float64)
            outs = []
            for t in range(T):
                # gated linear attention scalar loop: S [H, Dk, Dv];
                # state read AFTER the decayed update, scale D^-0.5
                S = S * w[t][:, :, None] \
                    + kh[t][:, :, None] * vh[t][:, None, :]
                outs.append(torch.einsum(
                    "hi,hij->hj", rh[t], S) * D ** -0.5)
            out = torch.stack(outs).reshape(T, C) * g
            x = x + out @ tw[p + "self_attn.o_proj.weight"].T
            cur = rms(x, tw[p + "post_attention_layernorm.weight"])
            act = F.silu(cur @ tw[p + "mlp.gate_proj.weight"].T) \
                * (cur @ tw[p + "mlp.up_proj.weight"].T)
            x = x + act @ tw[p + "mlp.down_proj.weight"].T
        x = rms(x, tw["model.norm.weight"])
        return (x @ tw["lm_head.weight"].T).numpy()

    from llama_cpp_test_tpu.models.rwkv6 import Rwkv6Context, Rwkv6Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(d, out, dtype="F32")
    m = Rwkv6Model(out)
    assert m.hp.qrwkv and m.hp.n_head_kv == KVH
    assert m.weights.layers[0].first is None
    assert m.weights.layers[0].ffn_gate is not None
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = ref_forward(tokens)
    ctx = Rwkv6Context(m)
    got = ctx.prefill(tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])
