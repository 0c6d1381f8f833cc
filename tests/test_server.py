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
        # built-in webui (reference examples/server/webui/): one
        # self-contained HTML document at / and /index.html
        for path in ("/", "/index.html"):
            r = await c.get(path)
            assert r.status == 200
            assert "text/html" in r.headers["Content-Type"]
            text = await r.text()
            assert "/v1/chat/completions" in text

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


def test_slot_save_restore_erase(client, server, tmp_path):
    """/slots/{id}?action=save|restore|erase round-trip (server.cpp:4438)."""
    c, loop = client
    server.slot_save_path = str(tmp_path)

    async def go():
        # populate slot 0's cache with a completion
        r = await c.post("/completion", json={
            "prompt": [3, 5, 7, 9], "n_predict": 3, "temperature": 0.0})
        assert r.status == 200
        r = await c.post("/slots/0?action=save", json={"filename": "s0.npz"})
        assert r.status == 200
        body = await r.json()
        assert body["filename"] == "s0.npz"
        n_saved = body["n_saved"]
        assert n_saved >= 4 and body["n_written"] > 0

        r = await c.post("/slots/0?action=erase")
        assert r.status == 200
        assert (await r.json())["n_erased"] == n_saved

        r = await c.post("/slots/0?action=restore", json={"filename": "s0.npz"})
        assert r.status == 200
        assert (await r.json())["n_restored"] == n_saved

        # bad cases
        r = await c.post("/slots/0?action=restore",
                         json={"filename": "missing.npz"})
        assert r.status == 404
        r = await c.post("/slots/0?action=save",
                         json={"filename": "../evil.npz"})
        assert r.status == 400
        r = await c.post("/slots/99?action=erase")
        assert r.status == 404
        r = await c.post("/slots/0?action=bogus")
        assert r.status == 400

    try:
        loop.run_until_complete(go())
    finally:
        server.slot_save_path = None


def test_slot_save_requires_path(client, server):
    c, loop = client
    assert server.slot_save_path is None

    async def go():
        r = await c.post("/slots/0?action=save", json={"filename": "x.npz"})
        assert r.status == 400

    loop.run_until_complete(go())


def test_lora_adapters_endpoint(tmp_path):
    """GET/POST /lora-adapters: list adapters, hot-swap scales."""
    import numpy as np
    from test_lora import make_lora_gguf
    from llama_cpp_test_tpu.server.app import LlamaServer

    mpath = str(tmp_path / "m.gguf")
    make_tiny_gguf(mpath)
    lpath = str(tmp_path / "l.gguf")
    make_lora_gguf(lpath, np.random.default_rng(3))
    srv = LlamaServer(mpath, n_ctx=64, n_slots=1, lora=[(lpath, 1.0)])
    assert srv.model.weights.layers[0].lora  # attached at init

    loop = asyncio.new_event_loop()

    async def go():
        from aiohttp.test_utils import TestClient, TestServer
        c = TestClient(TestServer(srv.make_app()))
        await c.start_server()
        try:
            r = await c.get("/lora-adapters")
            body = await r.json()
            assert body == [{"id": 0, "path": lpath, "scale": 1.0}]
            r = await c.post("/lora-adapters", json=[{"id": 0, "scale": 0.0}])
            assert r.status == 200
            assert (await r.json())[0]["scale"] == 0.0
            assert not srv.model.weights.layers[0].lora  # detached
            r = await c.post("/lora-adapters", json=[{"id": 5, "scale": 1.0}])
            assert r.status == 400
        finally:
            await c.close()

    srv.engine.start()
    try:
        loop.run_until_complete(go())
    finally:
        srv.engine.stop()
        loop.close()


def test_api_key_auth(tmp_path):
    """--api-key: 401 without Bearer key; /health stays public."""
    from llama_cpp_test_tpu.server.app import LlamaServer

    mpath = str(tmp_path / "m.gguf")
    make_tiny_gguf(mpath)
    srv = LlamaServer(mpath, n_ctx=64, n_slots=1, api_key="sk-test")
    loop = asyncio.new_event_loop()

    async def go():
        from aiohttp.test_utils import TestClient, TestServer
        c = TestClient(TestServer(srv.make_app()))
        await c.start_server()
        try:
            assert (await c.get("/health")).status == 200
            # the webui loads without a key (key entered in-page)
            r = await c.get("/")
            assert r.status == 200
            assert "text/html" in r.headers["Content-Type"]
            assert (await c.get("/props")).status == 401
            r = await c.post("/tokenize", json={"content": "hi"},
                             headers={"Authorization": "Bearer wrong"})
            assert r.status == 401
            r = await c.get("/props",
                            headers={"Authorization": "Bearer sk-test"})
            assert r.status == 200
        finally:
            await c.close()

    srv.engine.start()
    try:
        loop.run_until_complete(go())
    finally:
        srv.engine.stop()
        loop.close()


def test_sampling_body_lazy_grammar_triggers():
    """server request fields grammar_lazy + grammar_triggers parse into
    SamplerParams (server.cpp grammar_triggers analogue)."""
    from llama_cpp_test_tpu.server.app import _sampling_from_body

    p = _sampling_from_body({
        "grammar": 'root ::= "x"',
        "grammar_lazy": True,
        "grammar_triggers": [
            {"type": "word", "value": "<tool_call>"},
            {"type": "token", "value": 42},
            {"type": "pattern", "value": ".*?(\\{)"},
        ],
    })
    assert p.grammar_lazy
    assert p.grammar_trigger_words == ("<tool_call>",)
    assert p.grammar_trigger_tokens == (42,)
    assert p.grammar_trigger_patterns == (".*?(\\{)",)
    q = _sampling_from_body({"grammar": 'root ::= "x"'})
    assert not q.grammar_lazy and q.grammar_trigger_words == ()


def test_chat_streaming_delta_shape(client):
    """Chat SSE path rides the StreamParser: content deltas only, final
    chunk carries the finish_reason (tool format is content_only for a
    tools-less request, so text streams verbatim)."""
    c, loop = client

    async def go():
        r = await c.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0.0,
            "stream": True, "ignore_eos": True,
        })
        assert r.status == 200
        chunks = []
        async for line in r.content:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                chunks.append(json.loads(line[6:]))
        assert chunks
        assert all(ch["object"] == "chat.completion.chunk" for ch in chunks)
        assert chunks[-1]["choices"][0]["finish_reason"] is not None
        assert chunks[-1]["choices"][0]["delta"] == {}
        streamed = "".join(
            ch["choices"][0]["delta"].get("content", "") for ch in chunks)
        # compare with the non-streaming answer for the same request
        r2 = await c.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0.0, "ignore_eos": True,
        })
        body = await r2.json()
        assert streamed == body["choices"][0]["message"]["content"]

    loop.run_until_complete(go())
