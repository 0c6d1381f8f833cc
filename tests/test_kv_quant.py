"""Quantized KV cache (q8_0 type_k/type_v analogue, llama.h:338-339)."""
import numpy as np
import pytest

from test_engine import make_tiny_gguf, nmse


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path)
    return path


def test_q8_roundtrip():
    import jax.numpy as jnp
    from llama_cpp_test_tpu.runtime.kv_cache import quantize_q8

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 7, 16)),
                    jnp.float32)
    q, s = quantize_q8(x)
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    assert nmse(np.asarray(x), deq) < 1e-4


def test_q8_kv_close_to_bf16(model_path):
    """q8_0 KV decode logits track the bf16-KV engine closely."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path)
    prompt = [3, 17, 42, 9, 105]
    ctx_a = Context(m, n_ctx=64, n_seq_max=2, block_size=8)
    sa = ctx_a.new_seq()
    ref_pf = ctx_a.prefill(sa, prompt)
    ctx_b = Context(m, n_ctx=64, n_seq_max=2, block_size=8, kv_type="q8_0")
    sb = ctx_b.new_seq()
    q_pf = ctx_b.prefill(sb, prompt)
    assert nmse(ref_pf, q_pf) < 1e-3, nmse(ref_pf, q_pf)
    tok = int(np.argmax(ref_pf))
    for _ in range(4):
        ref = ctx_a.decode([sa], [tok])[0]
        got = ctx_b.decode([sb], [tok])[0]
        assert nmse(ref, got) < 1e-3, nmse(ref, got)
        tok = int(np.argmax(ref))


def test_q8_kv_shift_and_fork(model_path):
    """COW fork + context shift work on quantized pools too."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    m = Model(model_path)
    ctx = Context(m, n_ctx=64, n_seq_max=4, block_size=8, kv_type="q8_0")
    s = ctx.new_seq()
    ctx.prefill(s, [3, 17, 42, 9, 105, 77, 12, 54])
    child = ctx.fork_seq(s)
    out = ctx.decode([s, child], [7, 8])
    assert np.isfinite(out).all()
    ctx.shift_context(s, 2, 3)
    assert s.n_cached == 6  # 8 - 3 + 1 decoded
    out2 = ctx.decode([s], [9])[0]
    assert np.isfinite(out2).all()


def test_paged_attention_q8_kernel_matches_gather():
    """The quantized-KV Pallas flash-decoding path (in-VMEM int8 dequant)
    vs the dequantizing-gather reference."""
    import numpy as np
    import jax.numpy as jnp
    from llama_cpp_test_tpu.ops import paged_attention as pa
    from llama_cpp_test_tpu.runtime import kv_cache

    rng = np.random.default_rng(0)
    b, kv, g, d, nb, bs, nbmax = 3, 2, 4, 64, 16, 16, 4
    h = kv * g
    kf = rng.standard_normal((kv, nb, bs, d)).astype(np.float32) * 0.3
    vf = rng.standard_normal((kv, nb, bs, d)).astype(np.float32) * 0.3
    kq, ks = kv_cache.quantize_q8(jnp.asarray(kf))
    vq, vs = kv_cache.quantize_q8(jnp.asarray(vf))
    q = jnp.asarray(rng.standard_normal((b, h, d)) * 0.3, jnp.bfloat16)
    pages = jnp.asarray(
        np.stack([rng.permutation(nb)[:nbmax] for _ in range(b)]), jnp.int32)
    lengths = jnp.asarray([64, 17, 33], jnp.int32)

    out = pa.paged_attention_decode(q, kq, vq, lengths, pages,
                                    interpret=True, pages_per_step=2,
                                    k_scale=ks, v_scale=vs)
    # reference: dequantize pools densely, run the XLA gather path
    kd = (kq.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
    vd = (vq.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    ref = pa.paged_attention_decode_xla(q, kd, vd, lengths, pages)
    a, r = np.asarray(out, np.float64), np.asarray(ref, np.float64)
    nmse = ((a - r) ** 2).mean() / ((r * r).mean() + 1e-12)
    assert nmse < 2e-4, nmse
