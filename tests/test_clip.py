"""CLIP vision encoder + LLaVA projector (models/clip.py): mmproj GGUF
round-trip, forward vs an independent numpy reference, preprocessing, and
the engine's embedding-prefill path."""
import numpy as np
import pytest

from llama_cpp_test_tpu.gguf.constants import GGMLType
from llama_cpp_test_tpu.gguf.writer import GGUFWriter

HID, HEADS, LAYERS, FF, PATCH, IMG, CLLM = 64, 4, 2, 128, 8, 32, 96


def make_mmproj(path, rng):
    w = GGUFWriter(path, arch="clip")
    md = {
        "general.architecture": "clip",
        "clip.has_vision_encoder": True,
        "clip.has_llava_projector": True,
        "clip.projector_type": "mlp",
        "clip.use_gelu": True,
        "clip.vision.image_size": IMG,
        "clip.vision.patch_size": PATCH,
        "clip.vision.embedding_length": HID,
        "clip.vision.feed_forward_length": FF,
        "clip.vision.block_count": LAYERS,
        "clip.vision.attention.head_count": HEADS,
        "clip.vision.attention.layer_norm_epsilon": 1e-5,
        "clip.vision.image_mean": [0.5, 0.5, 0.5],
        "clip.vision.image_std": [0.3, 0.3, 0.3],
    }
    for k, v in md.items():
        w.add_kv(k, v)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    n_pos = (IMG // PATCH) ** 2 + 1
    tensors = {
        "v.patch_embd.weight": r(HID, 3, PATCH, PATCH),
        "v.patch_embd.bias": r(HID),
        "v.class_embd": r(HID),
        "v.position_embd.weight": r(n_pos, HID),
        "v.pre_ln.weight": 1.0 + r(HID), "v.pre_ln.bias": r(HID),
        "mm.0.weight": r(CLLM, HID), "mm.0.bias": r(CLLM),
        "mm.2.weight": r(CLLM, CLLM), "mm.2.bias": r(CLLM),
    }
    for i in range(LAYERS):
        p = f"v.blk.{i}."
        tensors.update({
            p + "ln1.weight": 1.0 + r(HID), p + "ln1.bias": r(HID),
            p + "attn_q.weight": r(HID, HID), p + "attn_q.bias": r(HID),
            p + "attn_k.weight": r(HID, HID), p + "attn_k.bias": r(HID),
            p + "attn_v.weight": r(HID, HID), p + "attn_v.bias": r(HID),
            p + "attn_out.weight": r(HID, HID), p + "attn_out.bias": r(HID),
            p + "ln2.weight": 1.0 + r(HID), p + "ln2.bias": r(HID),
            p + "ffn_up.weight": r(FF, HID), p + "ffn_up.bias": r(FF),
            p + "ffn_down.weight": r(HID, FF), p + "ffn_down.bias": r(HID),
        })
    for name, arr in tensors.items():
        w.add_tensor(name, arr, ggml_type=GGMLType.F32)
    w.write()
    return tensors


def np_reference(t, px):
    """Independent numpy CLIP forward (f64) on [3, S, S] pixels."""
    def ln(x, w, b, eps=1e-5):
        mu = x.mean(-1, keepdims=True)
        v = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(v + eps) * w + b

    def gelu(x):
        return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) *
                                      (x + 0.044715 * x ** 3)))

    s = IMG // PATCH
    x = px.reshape(3, s, PATCH, s, PATCH).transpose(1, 3, 0, 2, 4) \
        .reshape(s * s, 3 * PATCH * PATCH)
    x = x @ t["v.patch_embd.weight"].reshape(HID, -1).T + \
        t["v.patch_embd.bias"]
    x = np.concatenate([t["v.class_embd"][None], x], axis=0)
    x = x + t["v.position_embd.weight"][: x.shape[0]]
    x = ln(x, t["v.pre_ln.weight"], t["v.pre_ln.bias"])
    d = HID // HEADS
    for i in range(LAYERS):
        p = f"v.blk.{i}."
        cur = ln(x, t[p + "ln1.weight"], t[p + "ln1.bias"])
        q = (cur @ t[p + "attn_q.weight"].T + t[p + "attn_q.bias"]) / \
            np.sqrt(d)
        k = cur @ t[p + "attn_k.weight"].T + t[p + "attn_k.bias"]
        v = cur @ t[p + "attn_v.weight"].T + t[p + "attn_v.bias"]
        n = x.shape[0]
        q = q.reshape(n, HEADS, d).transpose(1, 0, 2)
        k = k.reshape(n, HEADS, d).transpose(1, 0, 2)
        v = v.reshape(n, HEADS, d).transpose(1, 0, 2)
        a = q @ k.transpose(0, 2, 1)
        a = np.exp(a - a.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        o = (a @ v).transpose(1, 0, 2).reshape(n, HID)
        x = x + o @ t[p + "attn_out.weight"].T + t[p + "attn_out.bias"]
        cur = ln(x, t[p + "ln2.weight"], t[p + "ln2.bias"])
        cur = gelu(cur @ t[p + "ffn_up.weight"].T + t[p + "ffn_up.bias"])
        x = x + cur @ t[p + "ffn_down.weight"].T + t[p + "ffn_down.bias"]
    x = x[1:]  # drop CLS
    x = gelu(x @ t["mm.0.weight"].T + t["mm.0.bias"])
    return x @ t["mm.2.weight"].T + t["mm.2.bias"]


@pytest.fixture(scope="module")
def mmproj(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("clip") / "mmproj.gguf")
    rng = np.random.default_rng(0)
    tensors = make_mmproj(path, rng)
    return path, tensors


def test_clip_forward_matches_numpy(mmproj):
    from llama_cpp_test_tpu.models.clip import encode_image, load_clip

    path, tensors = mmproj
    m = load_clip(path)
    assert m.n_patches == (IMG // PATCH) ** 2
    rng = np.random.default_rng(1)
    px = rng.standard_normal((3, IMG, IMG)).astype(np.float32)
    got = encode_image(m, px)
    ref = np_reference(tensors, px.astype(np.float64))
    assert got.shape == (m.n_patches, CLLM)
    nmse = ((got - ref) ** 2).mean() / (ref ** 2).mean()
    assert nmse < 1e-6, nmse


def test_preprocess_image(mmproj):
    from llama_cpp_test_tpu.models.clip import load_clip, preprocess_image

    path, _ = mmproj
    m = load_clip(path)
    img = np.random.default_rng(2).integers(
        0, 255, (50, 30, 3), dtype=np.uint8)
    px = preprocess_image(m, img)
    assert px.shape == (3, IMG, IMG)
    assert np.isfinite(px).all()
    # normalization: a mean-colored pixel maps to ~0
    flat = np.full((10, 10, 3), 127, np.uint8)
    pz = preprocess_image(m, flat)
    assert abs(pz).max() < 0.1


def test_prefill_embeds_matches_token_prefill(tmp_path):
    """Feeding the model's OWN token embeddings through prefill_embeds must
    reproduce token-prefill logits (the multimodal injection path is
    numerically identical to normal prefill)."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine import make_tiny_gguf, nmse

    from llama_cpp_test_tpu.models.llama import embed
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    path = str(tmp_path / "tiny.gguf")
    make_tiny_gguf(path)
    m = Model(path)
    toks = [3, 17, 42, 9]
    ctx1 = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s1 = ctx1.new_seq()
    ref = ctx1.prefill(s1, toks)

    import jax.numpy as jnp
    embs = np.asarray(
        embed(m.weights, jnp.asarray(toks), m.hp.embd_scale),
        np.float32)
    ctx2 = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    s2 = ctx2.new_seq()
    got = ctx2.prefill_embeds(s2, embs)
    assert s2.tokens == [-1] * 4 and s2.n_cached == 4
    assert nmse(ref, got) < 1e-5
    # decoding continues identically from either cache
    d1 = ctx1.decode([s1], [int(np.argmax(ref))])[0]
    d2 = ctx2.decode([s2], [int(np.argmax(got))])[0]
    assert nmse(d1, d2) < 1e-5


def test_llava_cli_smoke(tmp_path, mmproj, capsys):
    """End-to-end llava-cli: tiny LLM + tiny mmproj + a real PNG. The
    projector dim must match the LLM embedding width for injection."""
    import sys
    sys.path.insert(0, "tests")
    import test_engine

    from llama_cpp_test_tpu.cli import llava as llava_cli

    mp_path = str(tmp_path / "mmproj96.gguf")
    rng = np.random.default_rng(3)
    # CLLM must equal the LLM n_embd: build a 96-wide tiny llama... the
    # shared fixture uses 96? build our own with n_embd == CLLM
    old = dict(test_engine.HP)
    test_engine.HP = dict(old, n_embd=CLLM, n_head=4, n_head_kv=2,
                          head_dim=24, n_ff=128)
    llm_path = str(tmp_path / "llm.gguf")
    try:
        test_engine.make_tiny_gguf(llm_path)
    finally:
        test_engine.HP = old
    make_mmproj(mp_path, rng)
    from PIL import Image

    img_path = str(tmp_path / "img.png")
    Image.fromarray(np.random.default_rng(4).integers(
        0, 255, (40, 40, 3), dtype=np.uint8)).save(img_path)
    rc = llava_cli.main([
        "-m", llm_path, "--mmproj", mp_path, "--image", img_path,
        "-p", "a<image>b", "-n", "4", "--temp", "0.0"])
    assert rc == 0


def test_gemma3_projector(tmp_path):
    """gemma3 vision projector (clip.cpp PROJECTOR_TYPE_GEMMA3): SigLIP-style
    encoder (no CLS) -> 4x4 avg-pool of the patch grid -> RMSNorm ->
    input projection, checked against an independent numpy reference."""
    import numpy as np
    rng = np.random.default_rng(11)
    path = str(tmp_path / "mmproj_g3.gguf")
    w = GGUFWriter(path, arch="clip")
    md = {
        "general.architecture": "clip",
        "clip.has_vision_encoder": True,
        "clip.projector_type": "gemma3",
        "clip.use_gelu": True,
        "clip.vision.image_size": IMG,
        "clip.vision.patch_size": PATCH,
        "clip.vision.embedding_length": HID,
        "clip.vision.feed_forward_length": FF,
        "clip.vision.block_count": 1,
        "clip.vision.attention.head_count": HEADS,
        "clip.vision.attention.layer_norm_epsilon": 1e-5,
        "clip.vision.projector.scale_factor": 2,
        "clip.vision.image_mean": [0.5, 0.5, 0.5],
        "clip.vision.image_std": [0.3, 0.3, 0.3],
    }
    for k, v in md.items():
        w.add_kv(k, v)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    n_pos = (IMG // PATCH) ** 2  # no CLS token (SigLIP)
    tensors = {
        "v.patch_embd.weight": r(HID, 3, PATCH, PATCH),
        "v.patch_embd.bias": r(HID),
        "v.position_embd.weight": r(n_pos, HID),
        "mm.input_projection.weight": r(CLLM, HID),
        "mm.soft_emb_norm.weight": 1.0 + r(HID),
    }
    p0 = "v.blk.0."
    tensors.update({
        p0 + "ln1.weight": 1.0 + r(HID), p0 + "ln1.bias": r(HID),
        p0 + "attn_q.weight": r(HID, HID), p0 + "attn_q.bias": r(HID),
        p0 + "attn_k.weight": r(HID, HID), p0 + "attn_k.bias": r(HID),
        p0 + "attn_v.weight": r(HID, HID), p0 + "attn_v.bias": r(HID),
        p0 + "attn_out.weight": r(HID, HID), p0 + "attn_out.bias": r(HID),
        p0 + "ln2.weight": 1.0 + r(HID), p0 + "ln2.bias": r(HID),
        p0 + "ffn_up.weight": r(FF, HID), p0 + "ffn_up.bias": r(FF),
        p0 + "ffn_down.weight": r(HID, FF), p0 + "ffn_down.bias": r(HID),
    })
    for name, arr in tensors.items():
        w.add_tensor(name, arr, ggml_type=GGMLType.F32)
    w.write()

    from llama_cpp_test_tpu.models import clip as clip_mod

    m = clip_mod.load_clip(path)
    assert m.proj_type == "gemma3" and m.mm_input_proj is not None
    pix = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    out = clip_mod.encode_image(m, pix)
    side = IMG // PATCH
    n_tok = (side // 2) ** 2
    assert out.shape == (n_tok, CLLM)

    # numpy reference for the projector on top of the encoder output
    import jax.numpy as jnp
    enc = np.asarray(clip_mod.clip_forward(m, jnp.asarray(pix)))
    g = enc.reshape(1, side // 2, 2, side // 2, 2, HID).mean(axis=(2, 4))
    g = g.reshape(1, -1, HID)
    rms = 1.0 / np.sqrt((g * g).mean(-1, keepdims=True) + m.eps)
    soft = g * rms * tensors["mm.soft_emb_norm.weight"]
    ref = soft @ tensors["mm.input_projection.weight"].T
    err = np.mean((out - ref[0]) ** 2) / (np.mean(ref ** 2) + 1e-12)
    assert err < 1e-9, err


def test_minicpmv_resampler(tmp_path):
    """minicpmv resampler projector (clip.cpp PROJECTOR_TYPE_RESAMPLER):
    learned queries cross-attend kv-projected vision features with 2D
    sincos key positions, vs an independent numpy reference."""
    import numpy as np
    rng = np.random.default_rng(13)
    HR, NQ = 256, 8  # resampler hidden (2 heads x 128), query count
    path = str(tmp_path / "mmproj_mcpm.gguf")
    w = GGUFWriter(path, arch="clip")
    md = {
        "general.architecture": "clip",
        "clip.has_vision_encoder": True,
        "clip.has_minicpmv_projector": True,
        "clip.projector_type": "resampler",
        "clip.use_gelu": True,
        "clip.vision.image_size": IMG,
        "clip.vision.patch_size": PATCH,
        "clip.vision.embedding_length": HID,
        "clip.vision.feed_forward_length": FF,
        "clip.vision.block_count": 1,
        "clip.vision.attention.head_count": HEADS,
        "clip.vision.attention.layer_norm_epsilon": 1e-5,
        "clip.vision.image_mean": [0.5, 0.5, 0.5],
        "clip.vision.image_std": [0.3, 0.3, 0.3],
    }
    for k, v in md.items():
        w.add_kv(k, v)
    r = lambda *s: (rng.standard_normal(s) * 0.08).astype(np.float32)
    n_pos = (IMG // PATCH) ** 2
    tensors = {
        "v.patch_embd.weight": r(HID, 3, PATCH, PATCH),
        "v.patch_embd.bias": r(HID),
        "v.position_embd.weight": r(n_pos, HID),
        "resampler.query": r(NQ, HR),
        "resampler.proj.weight": r(CLLM, HR),
        "resampler.kv.weight": r(HR, HID),
        "resampler.attn.q.weight": r(HR, HR),
        "resampler.attn.k.weight": r(HR, HR),
        "resampler.attn.v.weight": r(HR, HR),
        "resampler.attn.q.bias": r(HR),
        "resampler.attn.k.bias": r(HR),
        "resampler.attn.v.bias": r(HR),
        "resampler.attn.out.weight": r(HR, HR),
        "resampler.attn.out.bias": r(HR),
        "resampler.ln_q.weight": 1.0 + r(HR),
        "resampler.ln_q.bias": r(HR),
        "resampler.ln_kv.weight": 1.0 + r(HR),
        "resampler.ln_kv.bias": r(HR),
        "resampler.ln_post.weight": 1.0 + r(HR),
        "resampler.ln_post.bias": r(HR),
    }
    p0 = "v.blk.0."
    tensors.update({
        p0 + "ln1.weight": 1.0 + r(HID), p0 + "ln1.bias": r(HID),
        p0 + "attn_q.weight": r(HID, HID), p0 + "attn_q.bias": r(HID),
        p0 + "attn_k.weight": r(HID, HID), p0 + "attn_k.bias": r(HID),
        p0 + "attn_v.weight": r(HID, HID), p0 + "attn_v.bias": r(HID),
        p0 + "attn_out.weight": r(HID, HID), p0 + "attn_out.bias": r(HID),
        p0 + "ln2.weight": 1.0 + r(HID), p0 + "ln2.bias": r(HID),
        p0 + "ffn_up.weight": r(FF, HID), p0 + "ffn_up.bias": r(FF),
        p0 + "ffn_down.weight": r(HID, FF), p0 + "ffn_down.bias": r(HID),
    })
    for name, arr in tensors.items():
        w.add_tensor(name, arr, ggml_type=GGMLType.F32)
    w.write()

    from llama_cpp_test_tpu.models import clip as clip_mod

    m = clip_mod.load_clip(path)
    assert m.resampler is not None
    pix = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    out = clip_mod.encode_image(m, pix)
    assert out.shape == (NQ, CLLM)

    # independent numpy reference
    import jax.numpy as jnp
    enc = np.asarray(clip_mod.clip_forward(m, jnp.asarray(pix)))[0]
    t = tensors

    def ln(x, wgt, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-5) * wgt + b

    side = IMG // PATCH
    pe = clip_mod.sincos_pos_embed_2d(HR, side)
    q = ln(t["resampler.query"], t["resampler.ln_q.weight"],
           t["resampler.ln_q.bias"])
    v = ln(enc @ t["resampler.kv.weight"].T, t["resampler.ln_kv.weight"],
           t["resampler.ln_kv.bias"])
    k = v + pe
    Q = (q @ t["resampler.attn.q.weight"].T + t["resampler.attn.q.bias"]) \
        / np.sqrt(128)
    K = k @ t["resampler.attn.k.weight"].T + t["resampler.attn.k.bias"]
    V = v @ t["resampler.attn.v.weight"].T + t["resampler.attn.v.bias"]
    nh = HR // 128
    Qh = Q.reshape(NQ, nh, 128).transpose(1, 0, 2)
    Kh = K.reshape(-1, nh, 128).transpose(1, 0, 2)
    Vh = V.reshape(-1, nh, 128).transpose(1, 0, 2)
    att = Qh @ Kh.transpose(0, 2, 1)
    att = np.exp(att - att.max(-1, keepdims=True))
    att /= att.sum(-1, keepdims=True)
    o = (att @ Vh).transpose(1, 0, 2).reshape(NQ, HR)
    o = o @ t["resampler.attn.out.weight"].T + t["resampler.attn.out.bias"]
    o = ln(o, t["resampler.ln_post.weight"], t["resampler.ln_post.bias"])
    ref = o @ t["resampler.proj.weight"].T
    err = np.mean((out - ref) ** 2) / (np.mean(ref ** 2) + 1e-12)
    assert err < 1e-8, err
