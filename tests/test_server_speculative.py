"""Server-side speculative decoding (reference server.cpp:1861-1937,3250):
per-slot draft sequences inside the continuous-batching loop. Output must be
identical to non-speculative serving (sample-and-accept-n semantics) and the
accept rate must be positive."""
import asyncio

import numpy as np
import pytest

from test_engine import make_tiny_gguf
from llama_cpp_test_tpu.runtime.engine import Context, Model
from llama_cpp_test_tpu.runtime.sampling import SamplerParams
from llama_cpp_test_tpu.runtime.scheduler import GenRequest, Scheduler


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path)
    return Model(path)


def run_sched(model, prompts, draft=False, max_tokens=20, temp=0.0,
              grammar=""):
    ctx = Context(model, n_ctx=128, n_seq_max=4, block_size=8)
    draft_ctx = Context(model, n_ctx=128, n_seq_max=4, block_size=8) \
        if draft else None
    sched = Scheduler(ctx, n_slots=2, draft_ctx=draft_ctx, n_draft=4,
                      p_draft_min=0.0)
    reqs = [sched.submit(GenRequest(
        prompt_tokens=p, max_tokens=max_tokens,
        sampling=SamplerParams(temp=temp, grammar=grammar)))
        for p in prompts]
    sched.run()
    return sched, [r.output_tokens for r in reqs], \
        [r.finish_reason for r in reqs]


def test_speculative_matches_plain_greedy(tiny_model):
    prompts = [[3, 17, 42, 5], [9, 1, 2, 7, 8]]
    _, plain, fin_p = run_sched(tiny_model, prompts, draft=False)
    sched, spec, fin_s = run_sched(tiny_model, prompts, draft=True)
    assert plain == spec
    assert fin_p == fin_s
    drafted = sum(s.n_drafted for s in sched.slots)
    accepted = sum(s.n_draft_accepted for s in sched.slots)
    assert drafted > 0
    # same model drafts for itself -> greedy proposals always accepted
    assert accepted / drafted > 0.9


def test_speculative_frees_draft_blocks(tiny_model):
    sched, _, _ = run_sched(tiny_model, [[3, 17, 42]], draft=True,
                            max_tokens=8)
    # all draft sequences released at request completion
    assert all(s.draft_seq is None for s in sched.slots)
    assert sched.draft_ctx.mgr.num_free() == sched.draft_ctx.num_blocks


def test_speculative_with_sampled_chain(tiny_model):
    """Stochastic chains run through sample-and-accept (every emitted token
    is sampled from TARGET logits, so the output distribution matches
    non-speculative serving; bit-identity is only guaranteed for greedy,
    same as the reference)."""
    prompts = [[3, 17, 42, 5]]
    sched, spec, fins = run_sched(tiny_model, prompts, draft=True, temp=0.8)
    assert len(spec[0]) > 0
    assert fins[0] in ("stop", "length")
    # greedy drafts against a sampled target still get accepted sometimes
    assert sum(s.n_drafted for s in sched.slots) > 0


def test_server_boot_with_draft(tmp_path):
    """LlamaServer boots with -md and serves a completion."""
    path = str(tmp_path / "tiny.gguf")
    make_tiny_gguf(path)
    from llama_cpp_test_tpu.server.app import LlamaServer
    aiohttp = pytest.importorskip("aiohttp")
    from aiohttp.test_utils import TestClient, TestServer

    srv = LlamaServer(path, n_ctx=64, n_slots=2, draft_model_path=path,
                      n_draft=4)
    srv.engine.start()
    try:
        loop = asyncio.new_event_loop()

        async def go():
            c = TestClient(TestServer(srv.make_app()))
            await c.start_server()
            r = await c.post("/completion", json={
                "prompt": [3, 17, 42], "n_predict": 8, "temperature": 0.0})
            body = await r.json()
            await c.close()
            return r.status, body

        status, body = loop.run_until_complete(go())
        loop.close()
        assert status == 200
        assert body["usage"]["completion_tokens"] > 0
    finally:
        srv.engine.stop()
