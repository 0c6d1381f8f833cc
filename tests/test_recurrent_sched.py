"""Recurrent-state scheduler/server integration (runtime/recurrent.py):
mamba behind the SAME continuous-batching scheduler and llama-server
endpoints as attention models — the reference's recurrent-cache mode
(llama-kv-cache.h:146, split_equal batching llama-batch.h:68)."""
import numpy as np
import pytest

from test_mamba import _mamba_ws, _write_hf

torch = pytest.importorskip("torch")
pytest.importorskip("safetensors.numpy")


@pytest.fixture(scope="module")
def mamba_gguf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rec")
    ws = _mamba_ws(np.random.default_rng(81))
    hf_dir = _write_hf(tmp, ws)
    from llama_cpp_test_tpu.tools.convert_hf import convert

    out = str(tmp / "m.gguf")
    convert(hf_dir, out, dtype="F32")
    return out


@pytest.fixture(scope="module")
def mamba_model(mamba_gguf):
    from llama_cpp_test_tpu.models.mamba import MambaModel

    return MambaModel(mamba_gguf)


def greedy(seed=0):
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams

    return SamplerParams(temp=0.0, seed=seed)


def make_sched(model, n_slots=4, n_ctx=256, chunk=16):
    from llama_cpp_test_tpu.runtime.recurrent import RecurrentContext
    from llama_cpp_test_tpu.runtime.scheduler import Scheduler

    ctx = RecurrentContext(model, n_ctx=n_ctx, n_seq_max=n_slots)
    return Scheduler(ctx, n_slots=n_slots, chunk_size=chunk)


def ref_generate(model, prompt, n):
    from llama_cpp_test_tpu.models.mamba import MambaContext, generate

    ctx = MambaContext(model)
    return list(generate(ctx, prompt, n))


def test_sched_matches_single_seq(mamba_model):
    """Scheduler greedy over the state pool == MambaContext generate."""
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    prompt = [3, 17, 42, 9, 150, 7]
    ref = ref_generate(mamba_model, prompt, 8)
    sched = make_sched(mamba_model)
    req = sched.submit(GenRequest(prompt, max_tokens=8, sampling=greedy(),
                                  ignore_eos=True))
    sched.run()
    n = len(req.output_tokens)
    assert n >= 4
    assert req.output_tokens == ref[:n]


def test_sched_chunked_prefill_matches(mamba_model):
    """Prompt longer than chunk_size: chunked masked-scan prefill across
    token buckets must hit the same state as one whole-prompt pass."""
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    rng = np.random.default_rng(5)
    prompt = [int(t) for t in rng.integers(3, 250, 23)]
    ref = ref_generate(mamba_model, prompt, 6)
    sched = make_sched(mamba_model, chunk=8)
    req = sched.submit(GenRequest(prompt, max_tokens=6, sampling=greedy(),
                                  ignore_eos=True))
    sched.run()
    n = len(req.output_tokens)
    assert n >= 3
    assert req.output_tokens == ref[:n]


def test_sched_concurrent_equals_solo(mamba_model):
    """Batched pool decode (gather/vmap/scatter) must not cross-talk:
    co-scheduled requests reproduce their solo outputs."""
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    prompts = [[3, 17, 42], [9, 150, 7, 22], [100, 5]]
    solos = [ref_generate(mamba_model, p, 6) for p in prompts]
    sched = make_sched(mamba_model, n_slots=3)
    reqs = [sched.submit(GenRequest(p, max_tokens=6, sampling=greedy(),
                                    ignore_eos=True))
            for p in prompts]
    sched.run()
    for req, solo in zip(reqs, solos):
        n = len(req.output_tokens)
        assert n >= 3
        assert req.output_tokens == solo[:n]


def test_context_shift_past_n_ctx(mamba_model):
    """Recurrent context shift is free (state summarizes history):
    generation keeps going past n_ctx with no error and no state reset."""
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    sched = make_sched(mamba_model, n_slots=1, n_ctx=16)
    req = sched.submit(GenRequest([3, 17, 42], max_tokens=24,
                                  sampling=greedy(), ignore_eos=True))
    sched.run()
    assert req.finish_reason == "length"
    assert len(req.output_tokens) == 24
    # and it still matches the unshifted single-seq run: shifting touched
    # only bookkeeping, never the state
    ref = ref_generate(mamba_model, [3, 17, 42], 24)
    assert req.output_tokens == ref


def test_server_serves_mamba(mamba_gguf):
    """The llama-server endpoints run over the recurrent context; paged-
    only features answer 400 instead of crashing."""
    import asyncio

    pytest.importorskip("aiohttp")
    from llama_cpp_test_tpu.server.app import LlamaServer

    srv = LlamaServer(mamba_gguf, n_ctx=128, n_slots=2)
    assert srv.recurrent
    loop = asyncio.new_event_loop()

    async def go():
        from aiohttp.test_utils import TestClient, TestServer
        c = TestClient(TestServer(srv.make_app()))
        await c.start_server()
        try:
            r = await c.get("/props")
            assert (await r.json())["arch"] == "mamba"
            r = await c.post("/completion",
                             json={"prompt": [3, 17, 42], "n_predict": 6,
                                   "temperature": 0.0, "ignore_eos": True})
            assert r.status == 200
            body = await r.json()
            assert len(body["choices"][0]["text"]) > 0
            assert body["choices"][0]["finish_reason"] == "length"
            r = await c.post("/embeddings", json={"content": "hi"})
            assert r.status == 400
            r = await c.post("/slots/0?action=save", json={})
            assert r.status == 400
        finally:
            await c.close()

    srv.engine.start()
    try:
        loop.run_until_complete(go())
    finally:
        srv.engine.stop()
        loop.close()


# -- rwkv behind the same scheduler -----------------------------------------


@pytest.fixture(scope="module")
def rwkv6_model(tmp_path_factory):
    from test_rwkv6 import _rwkv6_ws, _write_hf as _write_rwkv
    from llama_cpp_test_tpu.models.rwkv6 import Rwkv6Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    tmp = tmp_path_factory.mktemp("rec6")
    d = _write_rwkv(tmp, _rwkv6_ws(np.random.default_rng(83)))
    out = str(tmp / "m.gguf")
    convert(d, out, dtype="F32")
    return Rwkv6Model(out)


@pytest.fixture(scope="module")
def rwkv7_model(tmp_path_factory):
    from test_rwkv7 import _rwkv7_ws, _write_hf as _write_rwkv
    from llama_cpp_test_tpu.models.rwkv7 import Rwkv7Model
    from llama_cpp_test_tpu.tools.convert_hf import convert

    tmp = tmp_path_factory.mktemp("rec7")
    cfg = {
        "architectures": ["Rwkv7ForCausalLM"],
        "hidden_size": 64, "num_hidden_layers": 3, "head_size": 16,
        "intermediate_size": 96, "vocab_size": 256,
        "layer_norm_epsilon": 1e-5, "bos_token_id": 0, "eos_token_id": 0,
    }
    d = _write_rwkv(tmp, _rwkv7_ws(np.random.default_rng(85)), cfg)
    out = str(tmp / "m.gguf")
    convert(d, out, dtype="F32")
    return Rwkv7Model(out)


def test_rwkv6_sched_matches_single_seq(rwkv6_model):
    """The SAME pooled scheduler serves rwkv6 (runtime/recurrent.py
    RecurrentArch adapter): greedy == Rwkv6Context generate."""
    from llama_cpp_test_tpu.models.rwkv6 import Rwkv6Context, generate
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    prompt = [3, 17, 42, 9, 150, 7]
    ref = list(generate(Rwkv6Context(rwkv6_model), prompt, 8))
    sched = make_sched(rwkv6_model)
    req = sched.submit(GenRequest(prompt, max_tokens=8, sampling=greedy(),
                                  ignore_eos=True))
    sched.run()
    n = len(req.output_tokens)
    assert n >= 4
    assert req.output_tokens == ref[:n]


def test_rwkv6_sched_concurrent_equals_solo(rwkv6_model):
    """Two interleaved rwkv6 sequences produce the same tokens as each
    alone (state-pool row isolation under batched decode)."""
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    p1, p2 = [3, 17, 42], [200, 9, 88, 41]
    solo = []
    for p in (p1, p2):
        sched = make_sched(rwkv6_model)
        r = sched.submit(GenRequest(p, max_tokens=6, sampling=greedy(),
                                    ignore_eos=True))
        sched.run()
        solo.append(r.output_tokens)
    sched = make_sched(rwkv6_model)
    r1 = sched.submit(GenRequest(p1, max_tokens=6, sampling=greedy(),
                                 ignore_eos=True))
    r2 = sched.submit(GenRequest(p2, max_tokens=6, sampling=greedy(),
                                 ignore_eos=True))
    sched.run()
    assert r1.output_tokens == solo[0]
    assert r2.output_tokens == solo[1]


def test_rwkv7_sched_matches_single_seq(rwkv7_model):
    """rwkv7 (per-token v_first threading) behind the pooled scheduler."""
    from llama_cpp_test_tpu.models.rwkv7 import Rwkv7Context, generate
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    prompt = [3, 17, 42, 9, 150, 7]
    ref = list(generate(Rwkv7Context(rwkv7_model), prompt, 8))
    sched = make_sched(rwkv7_model)
    req = sched.submit(GenRequest(prompt, max_tokens=8, sampling=greedy(),
                                  ignore_eos=True))
    sched.run()
    n = len(req.output_tokens)
    assert n >= 4
    assert req.output_tokens == ref[:n]
