"""Mamba (selective state-space) cross-validation vs transformers —
converter + recurrent-state prefill/decode (the llm_build_mamba +
recurrent-cache analogue, models/mamba.py)."""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
st = pytest.importorskip("safetensors.numpy")

V, C, L, N, K = 256, 64, 2, 16, 4
DI = 2 * C
DTR = -(C // -16)


def _mamba_ws(rng):
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    ws = {
        "backbone.embeddings.weight": r(V, C),
        "backbone.norm_f.weight": 1.0 + r(C),
        "lm_head.weight": r(V, C),
    }
    for i in range(L):
        p = f"backbone.layers.{i}."
        ws.update({
            p + "norm.weight": 1.0 + r(C),
            p + "mixer.in_proj.weight": r(2 * DI, C),
            p + "mixer.conv1d.weight": r(DI, 1, K),
            p + "mixer.conv1d.bias": r(DI),
            p + "mixer.x_proj.weight": r(DTR + 2 * N, DI),
            p + "mixer.dt_proj.weight": r(DI, DTR),
            p + "mixer.dt_proj.bias": r(DI),
            p + "mixer.A_log": np.log(
                np.tile(np.arange(1, N + 1, dtype=np.float32), (DI, 1))),
            p + "mixer.D": 1.0 + r(DI),
            p + "mixer.out_proj.weight": r(C, DI),
        })
    return ws


def _write_hf(tmp_path, ws):
    cfg = {
        "architectures": ["MambaForCausalLM"],
        "hidden_size": C, "num_hidden_layers": L, "state_size": N,
        "conv_kernel": K, "intermediate_size": DI, "time_step_rank": DTR,
        "vocab_size": V, "layer_norm_epsilon": 1e-5,
        "use_conv_bias": True, "use_bias": False,
        "bos_token_id": 1, "eos_token_id": 2,
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


def _hf_model(ws):
    from transformers import MambaConfig, MambaForCausalLM

    tcfg = MambaConfig(vocab_size=V, hidden_size=C, num_hidden_layers=L,
                       state_size=N, conv_kernel=K, intermediate_size=DI,
                       time_step_rank=DTR, layer_norm_epsilon=1e-5,
                       use_conv_bias=True, use_bias=False,
                       tie_word_embeddings=False)
    hf = MambaForCausalLM(tcfg)
    missing = hf.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in ws.items()}, strict=False)
    assert not missing.unexpected_keys, missing.unexpected_keys
    hf.eval()
    return hf


def test_mamba_prefill_matches_transformers(tmp_path):
    rng = np.random.default_rng(81)
    ws = _mamba_ws(rng)
    hf_dir = _write_hf(tmp_path, ws)

    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.models.mamba import MambaContext, MambaModel

    out = str(tmp_path / "m.gguf")
    convert(hf_dir, out, dtype="F32")
    m = MambaModel(out)
    assert m.hp.d_inner == DI and m.hp.d_state == N
    assert m.hp.d_conv == K and m.hp.dt_rank == DTR

    tokens = [3, 17, 42, 9, 150, 7]
    ctx = MambaContext(m)
    got = ctx.prefill(tokens, all_logits=True)

    hf = _hf_model(ws)
    with torch.no_grad():
        ref = hf(torch.tensor([tokens])).logits[0].numpy()
    err = np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-9)
    assert err < 2e-3, err
    assert np.argmax(got[-1]) == np.argmax(ref[-1])


def test_mamba_recurrent_decode_matches_prefill_and_hf(tmp_path):
    """Step-by-step decode through the recurrent state must equal both a
    fresh full prefill (state correctness) and HF greedy generation."""
    rng = np.random.default_rng(82)
    ws = _mamba_ws(rng)
    hf_dir = _write_hf(tmp_path, ws)

    from llama_cpp_test_tpu.tools.convert_hf import convert
    from llama_cpp_test_tpu.models.mamba import (MambaContext, MambaModel,
                                                 generate)

    out = str(tmp_path / "m.gguf")
    convert(hf_dir, out, dtype="F32")
    m = MambaModel(out)
    prompt = [3, 17, 42, 9]
    n_new = 6

    ctx = MambaContext(m)
    toks = list(generate(ctx, prompt, n_new))

    hf = _hf_model(ws)
    with torch.no_grad():
        ref = hf.generate(torch.tensor([prompt]), max_new_tokens=n_new,
                          do_sample=False, eos_token_id=None,
                          pad_token_id=0)[0].tolist()[len(prompt):]
    assert toks == ref, (toks, ref)

    # state equivalence: prefill(prompt + gen) == stepwise final logits
    ctx2 = MambaContext(m)
    full = ctx2.prefill(prompt + toks[:-1])
    ctx3 = MambaContext(m)
    step_logits = ctx3.prefill(prompt)
    for t in toks[:-1]:
        step_logits = ctx3.decode(t)
    np.testing.assert_allclose(step_logits, full, rtol=1e-4, atol=1e-4)


def test_engine_model_refuses_mamba(tmp_path):
    """The paged-KV engine refuses mamba with a pointer to the recurrent
    surface instead of silently running wrong math."""
    rng = np.random.default_rng(83)
    hf_dir = _write_hf(tmp_path, _mamba_ws(rng))

    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(hf_dir, out, dtype="F32")

    from llama_cpp_test_tpu.runtime.engine import Model

    with pytest.raises(ValueError, match="MambaModel"):
        Model(out)


def test_mamba_cli_main_generates(tmp_path, capsys):
    """llama-cli surface: main.py auto-dispatches mamba GGUFs to the
    recurrent context."""
    rng = np.random.default_rng(84)
    hf_dir = _write_hf(tmp_path, _mamba_ws(rng))
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp_path / "m.gguf")
    convert(hf_dir, out, dtype="F32")

    from llama_cpp_test_tpu.cli.main import main

    rc = main(["-m", out, "-p", "<t3><t17>", "-n", "4"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "<t3><t17>" in captured.out
