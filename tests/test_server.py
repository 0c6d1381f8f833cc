"""HTTP server integration tests (the examples/server/tests analogue),
driving the real aiohttp app over HTTP with the tiny model."""
import asyncio
import json

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from test_engine import make_tiny_gguf  # noqa: E402


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path)
    from llama_cpp_test_tpu.server.app import LlamaServer

    srv = LlamaServer(path, n_ctx=64, n_slots=2)
    srv.engine.start()
    yield srv
    srv.engine.stop()


@pytest.fixture()
def client(server, event_loop=None):
    loop = asyncio.new_event_loop()

    async def make():
        c = TestClient(TestServer(server.make_app()))
        await c.start_server()
        return c

    c = loop.run_until_complete(make())
    yield c, loop
    loop.run_until_complete(c.close())
    loop.close()


def test_health_props_models(client):
    c, loop = client

    async def go():
        r = await c.get("/health")
        assert r.status == 200
        assert (await r.json())["status"] == "ok"
        r = await c.get("/props")
        body = await r.json()
        assert body["n_ctx"] == 64
        assert body["total_slots"] == 2
        r = await c.get("/v1/models")
        body = await r.json()
        assert body["data"][0]["object"] == "model"

    loop.run_until_complete(go())


def test_completion_with_token_prompt(client):
    c, loop = client

    async def go():
        r = await c.post("/v1/completions", json={
            "prompt": [3, 17, 42], "max_tokens": 6, "temperature": 0.0,
            "ignore_eos": True,
        })
        assert r.status == 200
        body = await r.json()
        assert body["choices"][0]["finish_reason"] in ("stop", "length")
        assert body["usage"]["prompt_tokens"] == 3
        assert 1 <= body["usage"]["completion_tokens"] <= 6
        return body

    b1 = loop.run_until_complete(go())
    b2 = loop.run_until_complete(go())
    assert b1["usage"] == b2["usage"]  # deterministic greedy


def test_streaming(client):
    c, loop = client

    async def go():
        r = await c.post("/completion", json={
            "prompt": [3, 17, 42], "max_tokens": 4, "temperature": 0.0,
            "stream": True, "ignore_eos": True,
        })
        assert r.status == 200
        chunks = []
        async for line in r.content:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                chunks.append(json.loads(line[6:]))
        assert chunks, "no SSE chunks"
        assert chunks[-1]["choices"][0]["finish_reason"] is not None

    loop.run_until_complete(go())


def test_metrics_and_slots(client):
    c, loop = client

    async def go():
        r = await c.get("/metrics")
        text = await r.text()
        assert "llamacpp_tpu:gen_tokens_processed" in text
        r = await c.get("/slots")
        slots = await r.json()
        assert len(slots) == 2

    loop.run_until_complete(go())


def test_concurrent_completions(client):
    c, loop = client

    async def one(i):
        r = await c.post("/v1/completions", json={
            "prompt": [3, 17, 40 + i], "max_tokens": 4, "temperature": 0.0,
            "ignore_eos": True})
        return await r.json()

    async def go():
        return await asyncio.gather(*(one(i) for i in range(4)))

    results = loop.run_until_complete(go())
    assert len(results) == 4
    for b in results:
        assert b["choices"][0]["finish_reason"] is not None


def test_embeddings_and_rerank(client):
    c, loop = client

    async def go():
        r = await c.post("/v1/embeddings", json={"input": [3, 17, 42]})
        body = await r.json()
        emb = np.asarray(body["data"][0]["embedding"])
        assert abs(float(np.linalg.norm(emb)) - 1.0) < 1e-3
        # same input -> same embedding
        r2 = await c.post("/v1/embeddings", json={"input": [3, 17, 42]})
        emb2 = np.asarray((await r2.json())["data"][0]["embedding"])
        assert np.allclose(emb, emb2, atol=1e-5)
        r = await c.post("/rerank", json={
            "query": "hello", "documents": ["hello", "zzz qqq"]})
        res = (await r.json())["results"]
        assert len(res) == 2
        assert res[0]["relevance_score"] >= res[1]["relevance_score"]

    loop.run_until_complete(go())


def test_infill_endpoint(client, server):
    """/infill builds the PSM FIM prompt and completes (server.cpp /infill)."""
    c, loop = client
    v = server.model.tokenizer.vocab
    # the tiny vocab has no FIM tokens: borrow control ids for the test
    old = (v.fim_pre_id, v.fim_suf_id, v.fim_mid_id)
    v.fim_pre_id, v.fim_suf_id, v.fim_mid_id = 1, 2, 0

    async def go():
        r = await c.post("/infill", json={
            "input_prefix": "def add(a, b):\n", "input_suffix": "\n",
            "n_predict": 4, "temperature": 0.0})
        assert r.status == 200
        body = await r.json()
        assert "content" in body
        assert body["usage"]["completion_tokens"] > 0

    try:
        loop.run_until_complete(go())
    finally:
        v.fim_pre_id, v.fim_suf_id, v.fim_mid_id = old


def test_infill_missing_fim_tokens(client, server):
    c, loop = client

    async def go():
        r = await c.post("/infill", json={"input_prefix": "x",
                                          "input_suffix": "y"})
        assert r.status == 400

    loop.run_until_complete(go())
