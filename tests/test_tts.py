"""WavTokenizer-dec vocoder (models/wavtokenizer.py) + TTS CLI: forward vs
an independent numpy reference, exact iSTFT round-trip, wav output."""
import numpy as np
import pytest

from llama_cpp_test_tpu.gguf.constants import GGMLType
from llama_cpp_test_tpu.gguf.writer import GGUFWriter

FEAT, PE, CE, FF, VOCAB, NFFT = 32, 64, 64, 96, 40, 64
PLAYERS, CLAYERS, GROUPS = 6, 2, 8


def make_vocoder(path, rng):
    w = GGUFWriter(path, arch="wavtokenizer-dec")
    a = "wavtokenizer-dec"
    md = {
        f"{a}.features_length": FEAT,
        f"{a}.embedding_length": CE,
        f"{a}.posnet.embedding_length": PE,
        f"{a}.posnet.block_count": PLAYERS,
        f"{a}.convnext.embedding_length": CE,
        f"{a}.convnext.block_count": CLAYERS,
        f"{a}.feed_forward_length": FF,
        f"{a}.attention.group_norm_epsilon": 1e-6,
        f"{a}.attention.group_norm_groups": GROUPS,
        f"{a}.attention.layer_norm_epsilon": 1e-6,
        f"{a}.vocab_size": VOCAB,
    }
    for k, v in md.items():
        w.add_kv(k, v)
    r = lambda *s: (rng.standard_normal(s) * 0.1).astype(np.float32)
    t = {
        "token_embd.weight": r(VOCAB, FEAT),
        "conv1d.weight": r(PE, FEAT, 7), "conv1d.bias": r(PE),
        "token_embd_norm.weight": 1 + r(PE), "token_embd_norm.bias": r(PE),
        "output_norm.weight": 1 + r(CE), "output_norm.bias": r(CE),
        "output.weight": r(NFFT + 2, CE), "output.bias": r(NFFT + 2),
    }
    for i in range(PLAYERS):
        p = f"posnet.{i}."
        if i == 2:
            t.update({p + "attn_norm.weight": 1 + r(PE),
                      p + "attn_norm.bias": r(PE),
                      p + "attn_q.weight": r(PE, PE, 1),
                      p + "attn_q.bias": r(PE),
                      p + "attn_k.weight": r(PE, PE, 1),
                      p + "attn_k.bias": r(PE),
                      p + "attn_v.weight": r(PE, PE, 1),
                      p + "attn_v.bias": r(PE),
                      p + "attn_output.weight": r(PE, PE, 1),
                      p + "attn_output.bias": r(PE)})
        elif i == PLAYERS - 1:
            t.update({p + "norm.weight": 1 + r(PE), p + "norm.bias": r(PE)})
        else:
            t.update({p + "norm1.weight": 1 + r(PE), p + "norm1.bias": r(PE),
                      p + "conv1.weight": r(PE, PE, 3), p + "conv1.bias": r(PE),
                      p + "norm2.weight": 1 + r(PE), p + "norm2.bias": r(PE),
                      p + "conv2.weight": r(PE, PE, 3),
                      p + "conv2.bias": r(PE)})
    for i in range(CLAYERS):
        p = f"convnext.{i}."
        t.update({p + "dw.weight": r(CE, 1, 7), p + "dw.bias": r(CE),
                  p + "norm.weight": 1 + r(CE), p + "norm.bias": r(CE),
                  p + "pw1.weight": r(FF, CE), p + "pw1.bias": r(FF),
                  p + "pw2.weight": r(CE, FF), p + "pw2.bias": r(CE),
                  p + "gamma": r(CE)})
    for name, arr in t.items():
        w.add_tensor(name, arr, ggml_type=GGMLType.F32)
    w.write()
    return t


def np_forward(t, codes):
    """Independent f64 reference of the decoder graph."""
    def conv(x, w, b):
        co, ci, k = w.shape
        pad = k // 2
        xp = np.pad(x, ((0, 0), (pad, pad)))
        T = x.shape[1]
        y = np.zeros((co, T))
        for j in range(k):
            y += np.einsum("oi,it->ot", w[:, :, j], xp[:, j:j + T])
        return y + b[:, None]

    def dwconv(x, w, b):
        c, _, k = w.shape
        pad = k // 2
        xp = np.pad(x, ((0, 0), (pad, pad)))
        T = x.shape[1]
        y = np.zeros((c, T))
        for j in range(k):
            y += w[:, 0, j][:, None] * xp[:, j:j + T]
        return y + b[:, None]

    def gn(x, w, b, eps=1e-6):
        c, T = x.shape
        xg = x.reshape(GROUPS, c // GROUPS, T)
        mu = xg.mean(axis=(1, 2), keepdims=True)
        var = ((xg - mu) ** 2).mean(axis=(1, 2), keepdims=True)
        y = ((xg - mu) / np.sqrt(var + eps)).reshape(c, T)
        return y * w[:, None] + b[:, None]

    def ln(x, w, b, eps=1e-6):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps) * w + b

    def gelu(x):
        return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) *
                                      (x + 0.044715 * x ** 3)))

    sw = lambda x: x / (1 + np.exp(-x))
    cur = t["token_embd.weight"][codes].astype(np.float64).T
    cur = conv(cur, t["conv1d.weight"], t["conv1d.bias"])
    for i in range(PLAYERS):
        p = f"posnet.{i}."
        inp = cur
        if i == 2:
            h = gn(cur, t[p + "attn_norm.weight"], t[p + "attn_norm.bias"])
            q = conv(h, t[p + "attn_q.weight"], t[p + "attn_q.bias"])
            k = conv(h, t[p + "attn_k.weight"], t[p + "attn_k.bias"])
            v = conv(h, t[p + "attn_v.weight"], t[p + "attn_v.bias"])
            a = q.T @ k / np.sqrt(PE)
            a = np.exp(a - a.max(-1, keepdims=True))
            a /= a.sum(-1, keepdims=True)
            h = v @ a.T
            h = conv(h, t[p + "attn_output.weight"],
                     t[p + "attn_output.bias"])
            cur = h + inp
        elif i == PLAYERS - 1:
            cur = gn(cur, t[p + "norm.weight"], t[p + "norm.bias"])
        else:
            h = sw(gn(cur, t[p + "norm1.weight"], t[p + "norm1.bias"]))
            h = conv(h, t[p + "conv1.weight"], t[p + "conv1.bias"])
            h = sw(gn(h, t[p + "norm2.weight"], t[p + "norm2.bias"]))
            h = conv(h, t[p + "conv2.weight"], t[p + "conv2.bias"])
            cur = h + inp
    cur = ln(cur.T, t["token_embd_norm.weight"],
             t["token_embd_norm.bias"]).T
    for i in range(CLAYERS):
        p = f"convnext.{i}."
        inp = cur
        h = dwconv(cur, t[p + "dw.weight"], t[p + "dw.bias"])
        h = ln(h.T, t[p + "norm.weight"], t[p + "norm.bias"])
        h = gelu(h @ t[p + "pw1.weight"].T + t[p + "pw1.bias"])
        h = h @ t[p + "pw2.weight"].T + t[p + "pw2.bias"]
        h = h * t[p + "gamma"]
        cur = h.T + inp
    out = ln(cur.T, t["output_norm.weight"], t["output_norm.bias"])
    return out @ t["output.weight"].T + t["output.bias"]


@pytest.fixture(scope="module")
def vocoder(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tts") / "voc.gguf")
    t = make_vocoder(path, np.random.default_rng(0))
    return path, t


def test_vocoder_forward_matches_numpy(vocoder):
    from llama_cpp_test_tpu.models.wavtokenizer import (decode_codes,
                                                        load_wavtokenizer)

    path, t = vocoder
    m = load_wavtokenizer(path)
    assert m.n_fft == NFFT
    codes = np.asarray([1, 5, 9, 3, 22, 17, 8, 30], np.int32)
    got = decode_codes(m, codes)
    ref = np_forward(t, codes)
    nmse = ((got - ref) ** 2).mean() / (ref ** 2).mean()
    assert nmse < 1e-6, nmse


def test_istft_round_trip():
    """A pure sine analyzed with the same STFT must reconstruct through
    embd_to_audio (hann OLA with envelope normalization is exact for
    interior frames)."""
    from llama_cpp_test_tpu.models.wavtokenizer import embd_to_audio

    n_fft, n_hop = 64, 16
    n_codes = 24
    tlen = (n_codes - 1) * n_hop + n_fft
    x = np.sin(2 * np.pi * 5 * np.arange(tlen) / n_fft)
    hann = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    frames = np.stack([x[i * n_hop: i * n_hop + n_fft]
                       for i in range(n_codes)])
    spec = np.fft.rfft(frames * hann, axis=1)  # hann-analyzed, as the model
    mag = np.maximum(np.abs(spec), 1e-9)
    emb = np.concatenate([np.log(mag), np.angle(spec)], axis=1)
    audio = embd_to_audio(emb, n_fft=n_fft, n_hop=n_hop)
    pad = (n_fft - n_hop) // 2
    ref = x[pad: tlen - pad]
    err = np.abs(audio[n_fft: -n_fft] - ref[n_fft: -n_fft]).max()
    assert err < 1e-6, err


def test_tts_cli_codes_mode(vocoder, tmp_path):
    import wave

    from llama_cpp_test_tpu.cli import tts as tts_cli

    path, _ = vocoder
    out = str(tmp_path / "o.wav")
    rc = tts_cli.main(["-mv", path, "--codes", "1,2,3,4,5,6,7,8",
                       "-o", out])
    assert rc == 0
    with wave.open(out, "rb") as f:
        assert f.getframerate() == 24000
        assert f.getnframes() > 0


def test_process_text():
    from llama_cpp_test_tpu.cli.tts import build_prompt, process_text

    assert process_text("Hello, World! 123") == "hello world"
    p = build_prompt("Good day")
    assert "<|text_start|>good<|text_sep|>day<|text_end|>" in p
