"""RWKV7 + ARWKV7 cross-validation — converter + recurrent
prefill/decode (models/rwkv7.py, the llm_build_rwkv7/llm_build_arwkv7
analogue).

The HF classes are remote-code, so the reference is an independent torch
transcription of the spec: the reference graph builders
(llama-model.cpp build_rwkv7_time_mix/llm_build_rwkv7/llm_build_arwkv7)
and the wkv7 kernel scalar loop (ggml-cpu.c
ggml_compute_forward_rwkv_wkv7_f32), operating on HF-layout tensors."""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
st = pytest.importorskip("safetensors.numpy")

V, C, L, D = 256, 64, 3, 16
H = C // D
RW, RA, RV, RG, FF = 16, 16, 8, 24, 96


def _rwkv7_ws(rng):
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    ws = {
        "model.embeddings.weight": r(V, C),
        "model.pre_ln.weight": 1.0 + r(C),
        "model.pre_ln.bias": r(C),
        "model.ln_out.weight": 1.0 + r(C),
        "model.ln_out.bias": r(C),
        "head.weight": r(V, C),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        ws.update({
            p + "ln1.weight": 1.0 + r(C), p + "ln1.bias": r(C),
            p + "ln2.weight": 1.0 + r(C), p + "ln2.bias": r(C),
            p + "attention.x_r": r(1, 1, C),
            p + "attention.x_w": r(1, 1, C),
            p + "attention.x_k": r(1, 1, C),
            p + "attention.x_v": r(1, 1, C),
            p + "attention.x_a": r(1, 1, C),
            p + "attention.x_g": r(1, 1, C),
            p + "attention.w0": r(1, 1, C) - 2.0,
            p + "attention.w1": r(C, RW),
            p + "attention.w2": r(RW, C),
            p + "attention.a0": r(1, 1, C),
            p + "attention.a1": r(C, RA),
            p + "attention.a2": r(RA, C),
            p + "attention.g1": r(C, RG),
            p + "attention.g2": r(RG, C),
            p + "attention.k_k": 0.5 + r(C),
            p + "attention.k_a": r(C),
            p + "attention.r_k": r(H, D),
            p + "attention.key.weight": r(C, C),
            p + "attention.value.weight": r(C, C),
            p + "attention.receptance.weight": r(C, C),
            p + "attention.ln_x.weight": 1.0 + r(C),
            p + "attention.ln_x.bias": r(C),
            p + "attention.output.weight": r(C, C),
            p + "feed_forward.x_k": r(1, 1, C),
            p + "feed_forward.key.weight": r(FF, C),
            p + "feed_forward.value.weight": r(C, FF),
        })
        if i > 0:
            ws.update({
                p + "attention.v0": r(1, 1, C),
                p + "attention.v1": r(C, RV),
                p + "attention.v2": r(RV, C),
            })
    return ws


def _write_hf(tmp_path, ws, cfg):
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


def _time_mix_ref(tw, p, xa_n, x_prev, S, v_first, has_gate=True):
    """rwkv7 time mix on HF-layout weights, T tokens sequentially.
    Returns (dx [T, C], S, v_first)."""
    F = torch.nn.functional
    T = xa_n.shape[0]
    sx = x_prev - xa_n
    def lerp(s):
        return xa_n + sx * tw[p + f"attention.x_{s}"].view(C)
    xr, xw, xk, xv, x_a = (lerp(s) for s in "rwkva")
    r = xr @ tw[p + "attention.receptance.weight"].T
    w = torch.exp(-0.606531 * torch.sigmoid(
        torch.tanh(xw @ tw[p + "attention.w1"]) @ tw[p + "attention.w2"]
        + tw[p + "attention.w0"].view(C)))
    k = xk @ tw[p + "attention.key.weight"].T
    v = xv @ tw[p + "attention.value.weight"].T
    if v_first is None:
        v_first = v
    else:
        v = v + (v_first - v) * torch.sigmoid(
            (xv @ tw[p + "attention.v1"]) @ tw[p + "attention.v2"]
            + tw[p + "attention.v0"].view(C))
    a = torch.sigmoid(
        (x_a @ tw[p + "attention.a1"]) @ tw[p + "attention.a2"]
        + tw[p + "attention.a0"].view(C))
    g = None
    if has_gate:
        xg = lerp("g")
        g = torch.sigmoid(xg @ tw[p + "attention.g1"]) \
            @ tw[p + "attention.g2"]
    kk = (k * tw[p + "attention.k_k"].view(C)).view(T, H, D)
    kk = kk / torch.sqrt((kk ** 2).sum(-1, keepdim=True) + 1e-12)
    k = k * (1.0 + tw[p + "attention.k_a"].view(C) * (a - 1.0))
    rh, wh = r.view(T, H, D), w.view(T, H, D)
    kh, vh, ah = k.view(T, H, D), v.view(T, H, D), a.view(T, H, D)
    outs = []
    for t in range(T):
        # wkv7 scalar loop: S [H, Dv, Dk]
        sa = torch.einsum("hij,hj->hi", S, -kk[t])
        S = S * wh[t][:, None, :] \
            + vh[t][:, :, None] * kh[t][:, None, :] \
            + sa[:, :, None] * (kk[t] * ah[t])[:, None, :]
        outs.append(torch.einsum("hij,hj->hi", S, rh[t]))
    out = torch.stack(outs).reshape(T, C)
    out = F.group_norm(out, H, tw[p + "attention.ln_x.weight"],
                       tw[p + "attention.ln_x.bias"], eps=64e-5)
    rk = (kh * rh * tw[p + "attention.r_k"].view(H, D)).sum(-1)  # [T, H]
    out = out + (vh * rk[:, :, None]).reshape(T, C)
    if g is not None:
        out = out * g
    return out @ tw[p + "attention.output.weight"].T, S, v_first


def _ref_forward_rwkv7(ws, tokens):
    F = torch.nn.functional
    tw = {k: torch.from_numpy(v).double() for k, v in ws.items()}

    def ln(x, p, eps=1e-5):
        return F.layer_norm(x, (C,), tw[p + ".weight"], tw[p + ".bias"],
                            eps)

    T = len(tokens)
    x = tw["model.embeddings.weight"][torch.tensor(tokens)]
    x = ln(x, "model.pre_ln")
    # v_first is PER TOKEN: layer 0's raw v at each position is what the
    # later layers' value-residual mixes toward
    vf = None
    for i in range(L):
        p = f"model.layers.{i}."
        xa_n = ln(x, p + "ln1")
        x_prev = torch.cat([torch.zeros(1, C, dtype=torch.float64),
                            xa_n[:-1]], 0)
        S = torch.zeros(H, D, D, dtype=torch.float64)
        dx, S, vff = _time_mix_ref(tw, p, xa_n, x_prev, S, vf)
        if vf is None:
            vf = vff
        x = x + dx
        xf = ln(x, p + "ln2")
        f_prev = torch.cat([torch.zeros(1, C, dtype=torch.float64),
                            xf[:-1]], 0)
        xk2 = xf + (f_prev - xf) * tw[p + "feed_forward.x_k"].view(C)
        kk2 = torch.relu(xk2 @ tw[p + "feed_forward.key.weight"].T) ** 2
        x = x + kk2 @ tw[p + "feed_forward.value.weight"].T
    x = ln(x, "model.ln_out")
    return (x @ tw["head.weight"].T).numpy()


def test_rwkv7_prefill_matches_torch_reference(tmp_path):
    rng = np.random.default_rng(223)
    ws = _rwkv7_ws(rng)
    cfg = {
        "architectures": ["Rwkv7ForCausalLM"],
        "hidden_size": C, "num_hidden_layers": L, "head_size": D,
        "intermediate_size": FF, "vocab_size": V,
        "layer_norm_epsilon": 1e-5,
        "bos_token_id": 0, "eos_token_id": 0,
    }
    d = _write_hf(tmp_path, ws, cfg)
    from llama_cpp_test_tpu.models.rwkv7 import Rwkv7Context, Rwkv7Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(d, out, dtype="F32")
    m = Rwkv7Model(out)
    assert m.hp.arch == "rwkv7" and m.hp.n_head == H
    assert m.weights.layers[0].v1 is None      # layer-0 value residual
    assert m.weights.layers[1].v1 is not None
    tokens = [3, 17, 42, 9, 150, 7, 20]
    with torch.no_grad():
        ref = _ref_forward_rwkv7(ws, tokens)
    ctx = Rwkv7Context(m)
    got = ctx.prefill(tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_rwkv7_stepwise_state_equals_full_prefill(tmp_path):
    rng = np.random.default_rng(227)
    ws = _rwkv7_ws(rng)
    cfg = {
        "architectures": ["Rwkv7ForCausalLM"],
        "hidden_size": C, "num_hidden_layers": L, "head_size": D,
        "intermediate_size": FF, "vocab_size": V,
        "layer_norm_epsilon": 1e-5,
        "bos_token_id": 0, "eos_token_id": 0,
    }
    d = _write_hf(tmp_path, ws, cfg)
    from llama_cpp_test_tpu.models.rwkv7 import Rwkv7Context, Rwkv7Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(d, out, dtype="F32")
    m = Rwkv7Model(out)
    tokens = [5, 99, 3, 200, 41, 8]
    full = Rwkv7Context(m)
    lf = full.prefill(tokens)
    step = Rwkv7Context(m)
    step.prefill(tokens[:2])
    for t in tokens[2:-1]:
        step.decode(t)
    ls = step.decode(tokens[-1])
    np.testing.assert_allclose(lf, ls, rtol=2e-4, atol=2e-4)
    for a, b in zip(full.states, step.states):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def _arwkv7_ws(rng):
    """ARWKV7 (RwkvHybridForCausalLM): qwen body names — self_attn.*
    time mix, rms norms, swiglu mlp, no embedding norm."""
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
            p + "post_attention_layernorm.weight": 1.0 + r(C),
            p + "self_attn.x_r": r(1, 1, C),
            p + "self_attn.x_w": r(1, 1, C),
            p + "self_attn.x_k": r(1, 1, C),
            p + "self_attn.x_v": r(1, 1, C),
            p + "self_attn.x_a": r(1, 1, C),
            p + "self_attn.x_g": r(1, 1, C),
            p + "self_attn.w0": r(1, 1, C) - 2.0,
            p + "self_attn.w1": r(C, RW),
            p + "self_attn.w2": r(RW, C),
            p + "self_attn.a0": r(1, 1, C),
            p + "self_attn.a1": r(C, RA),
            p + "self_attn.a2": r(RA, C),
            p + "self_attn.g1": r(C, RG),
            p + "self_attn.g2": r(RG, C),
            p + "self_attn.k_k": 0.5 + r(C),
            p + "self_attn.k_a": r(C),
            p + "self_attn.r_k": r(H, D),
            p + "self_attn.key.weight": r(C, C),
            p + "self_attn.value.weight": r(C, C),
            p + "self_attn.receptance.weight": r(C, C),
            p + "self_attn.g_norm.weight": 1.0 + r(C),
            p + "self_attn.g_norm.bias": r(C),
            p + "self_attn.output.weight": r(C, C),
            p + "mlp.gate_proj.weight": r(FF, C),
            p + "mlp.up_proj.weight": r(FF, C),
            p + "mlp.down_proj.weight": r(C, FF),
        })
        if i > 0:
            ws.update({
                p + "self_attn.v0": r(1, 1, C),
                p + "self_attn.v1": r(C, RV),
                p + "self_attn.v2": r(RV, C),
            })
    return ws


def _ref_forward_arwkv7(ws, tokens):
    F = torch.nn.functional
    # normalize to the rwkv7 names _time_mix_ref expects
    tw = {}
    for k, v in ws.items():
        k = k.replace("self_attn.", "attention.") \
             .replace("attention.g_norm", "attention.ln_x")
        tw[k] = torch.from_numpy(v).double()

    def rms(x, w, eps=1e-5):
        return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + eps) * w

    T = len(tokens)
    x = tw["model.embed_tokens.weight"][torch.tensor(tokens)]
    vf = None
    for i in range(L):
        p = f"model.layers.{i}."
        xa_n = rms(x, tw[p + "input_layernorm.weight"])
        x_prev = torch.cat([torch.zeros(1, C, dtype=torch.float64),
                            xa_n[:-1]], 0)
        S = torch.zeros(H, D, D, dtype=torch.float64)
        dx, S, vff = _time_mix_ref(tw, p, xa_n, x_prev, S, vf)
        if vf is None:
            vf = vff
        x = x + dx
        cur = rms(x, tw[p + "post_attention_layernorm.weight"])
        act = F.silu(cur @ tw[p + "mlp.gate_proj.weight"].T) \
            * (cur @ tw[p + "mlp.up_proj.weight"].T)
        x = x + act @ tw[p + "mlp.down_proj.weight"].T
    x = rms(x, tw["model.norm.weight"])
    return (x @ tw["lm_head.weight"].T).numpy()


def test_arwkv7_prefill_matches_torch_reference(tmp_path):
    rng = np.random.default_rng(229)
    ws = _arwkv7_ws(rng)
    cfg = {
        "architectures": ["RwkvHybridForCausalLM"],
        "hidden_size": C, "num_hidden_layers": L, "head_size": D,
        "intermediate_size": FF, "vocab_size": V,
        "rms_norm_eps": 1e-5, "wkv_has_gate": True, "wkv_version": 7,
        "bos_token_id": 0, "eos_token_id": 0,
    }
    d = _write_hf(tmp_path, ws, cfg)
    from llama_cpp_test_tpu.models.rwkv7 import Rwkv7Context, Rwkv7Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(d, out, dtype="F32")
    m = Rwkv7Model(out)
    assert m.hp.arch == "arwkv7" and m.hp.rms
    assert m.weights.layers[0].ffn_gate is not None
    assert m.weights.layers[0].cm_key_w is None
    tokens = [3, 17, 42, 9, 150, 7]
    with torch.no_grad():
        ref = _ref_forward_arwkv7(ws, tokens)
    ctx = Rwkv7Context(m)
    got = ctx.prefill(tokens, all_logits=True)
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 5e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_engine_model_refuses_rwkv7(tmp_path):
    rng = np.random.default_rng(233)
    ws = _rwkv7_ws(rng)
    cfg = {
        "architectures": ["Rwkv7ForCausalLM"],
        "hidden_size": C, "num_hidden_layers": L, "head_size": D,
        "intermediate_size": FF, "vocab_size": V,
        "layer_norm_epsilon": 1e-5,
        "bos_token_id": 0, "eos_token_id": 0,
    }
    d = _write_hf(tmp_path, ws, cfg)
    from llama_cpp_test_tpu.runtime.engine import Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(d, out, dtype="F32")
    with pytest.raises(ValueError, match="recurrent"):
        Model(out)
