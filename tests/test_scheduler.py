"""Continuous-batching scheduler tests (the parallel/batched examples +
server update_slots behaviors)."""
import numpy as np
import pytest

from test_engine import make_tiny_gguf


@pytest.fixture(scope="module")
def sched_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path)
    from llama_cpp_test_tpu.runtime.engine import Model

    return Model(path)


def make_sched(model, n_slots=4, n_ctx=64):
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.scheduler import Scheduler

    ctx = Context(model, n_ctx=n_ctx, n_seq_max=n_slots, block_size=8)
    return Scheduler(ctx, n_slots=n_slots, chunk_size=16)


def greedy(seed=0):
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams

    return SamplerParams(temp=0.0, seed=seed)


def test_single_request(sched_model):
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    sched = make_sched(sched_model)
    req = sched.submit(GenRequest([3, 17, 42], max_tokens=8,
                                  sampling=greedy(), ignore_eos=True))
    sched.run()
    assert req.finish_reason in ("stop", "length")
    assert 1 <= len(req.output_tokens) <= 8


def test_matches_generate(sched_model):
    """Scheduler greedy output == plain generate() output."""
    from llama_cpp_test_tpu.runtime.engine import Context, generate
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    ctx = Context(sched_model, n_ctx=64, n_seq_max=2, block_size=8)
    ref = list(generate(ctx, [3, 17, 42], 8))

    sched = make_sched(sched_model)
    req = sched.submit(GenRequest([3, 17, 42], max_tokens=8, sampling=greedy(),
                                  stop_tokens=set(), ignore_eos=True))
    sched.run()
    # generate() has no EOG handling for the random vocab; compare prefix
    n = len(req.output_tokens)
    assert n >= 1
    assert req.output_tokens == ref[:n]


def test_concurrent_requests(sched_model):
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    sched = make_sched(sched_model, n_slots=4)
    reqs = [sched.submit(GenRequest([3, 17, 42 + i], max_tokens=6,
                                    sampling=greedy(), ignore_eos=True))
            for i in range(6)]  # more requests than slots
    sched.run()
    for r in reqs:
        assert r.finish_reason is not None
        assert len(r.output_tokens) >= 1
    # each request's output must equal its solo run
    solo = make_sched(sched_model, n_slots=1)
    r0 = solo.submit(GenRequest([3, 17, 42], max_tokens=6, sampling=greedy(),
                     ignore_eos=True))
    solo.run()
    assert reqs[0].output_tokens == r0.output_tokens


def test_prefix_reuse(sched_model):
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    sched = make_sched(sched_model, n_slots=1)
    r1 = sched.submit(GenRequest([3, 17, 42, 9, 5], max_tokens=4,
                                 sampling=greedy(), ignore_eos=True))
    sched.run()
    before = sched.n_prompt_tokens
    # same prefix -> slot should reuse cached KV
    r2 = sched.submit(GenRequest([3, 17, 42, 9, 5], max_tokens=4,
                                 sampling=greedy(), ignore_eos=True))
    sched.run()
    reused_prompt_tokens = sched.n_prompt_tokens - before
    assert reused_prompt_tokens < 5  # only the tail was recomputed
    assert r2.output_tokens == r1.output_tokens


def test_stop_string(sched_model):
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    # find what greedy emits, then stop on its text
    tok = sched_model.tokenizer
    sched = make_sched(sched_model)
    probe = sched.submit(GenRequest([3, 17, 42], max_tokens=4,
                                    sampling=greedy(), ignore_eos=True))
    sched.run()
    piece = tok.token_to_piece(probe.output_tokens[0])
    if not piece:
        pytest.skip("first token has empty piece")
    r = sched.submit(GenRequest([3, 17, 42], max_tokens=8, sampling=greedy(),
                                stop_strings=[piece], ignore_eos=True))
    sched.run()
    assert r.finish_reason == "stop"
    assert len(r.output_tokens) <= len(probe.output_tokens) + 1


def test_metrics(sched_model):
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest

    sched = make_sched(sched_model)
    sched.submit(GenRequest([3, 17, 42], max_tokens=4, sampling=greedy(),
                     ignore_eos=True))
    sched.run()
    m = sched.metrics()
    assert m["prompt_tokens_processed"] >= 3
    assert m["gen_tokens_processed"] >= 1
    assert m["slots_idle"] == m["slots_total"]


def test_prefill_chunk_capped_while_generating(sched_model):
    """split_equal fairness analogue: once a slot is generating, other
    prompts prefill in capped chunks so decode stalls stay bounded."""
    from llama_cpp_test_tpu.runtime.engine import Context, Model
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams
    from llama_cpp_test_tpu.runtime.scheduler import (GenRequest, Scheduler,
                                                      SlotState)

    ctx = Context(sched_model, n_ctx=1024, n_seq_max=2, block_size=8,
                  num_blocks=256)
    sch = Scheduler(ctx, n_slots=2, chunk_size=512, decode_window=1)
    r1 = sch.submit(GenRequest([3, 17, 42], max_tokens=8,
                               sampling=SamplerParams(temp=0.0),
                               ignore_eos=True))
    # short prompt finishes prefill on step 1 and starts generating
    sch.step()
    assert sch.slots[0].state == SlotState.GENERATING
    long_prompt = list(range(3, 3 + 300))
    r2 = sch.submit(GenRequest(long_prompt, max_tokens=4,
                               sampling=SamplerParams(temp=0.0),
                               ignore_eos=True))
    gen_before = len(r1.output_tokens)
    steps = 0
    while sch.slots[1].state != SlotState.GENERATING and steps < 10:
        sch.step()
        steps += 1
    # 300 tokens at a 128 cap -> 3 prefill steps, not 1
    assert steps >= 3, steps
    # the generating slot kept decoding between the chunks
    assert len(r1.output_tokens) >= gen_before + 3
    sch.run()
    assert r1.finish_reason and r2.finish_reason


def test_chunked_cache_reuse(sched_model):
    """cache_reuse > 0: a re-request whose prompt drops interior tokens
    keeps the shifted tail chunk — fewer prompt tokens recomputed than the
    plain-LCP scheduler (reference --cache-reuse, server.cpp:3010-3050)."""
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest, Scheduler

    first = [3, 17, 42, 9, 105, 77, 12, 54, 33, 21, 44, 61]
    # drops [105, 77]; the 6-token tail chunk shifts down two positions
    second = first[:4] + first[6:]

    def run(cache_reuse):
        ctx = Context(sched_model, n_ctx=64, n_seq_max=2, block_size=8)
        sch = Scheduler(ctx, n_slots=1, chunk_size=16,
                        cache_reuse=cache_reuse)
        sch.submit(GenRequest(list(first), max_tokens=3, sampling=greedy(),
                              ignore_eos=True))
        sch.run()
        before = sch.n_prompt_tokens
        r = sch.submit(GenRequest(list(second), max_tokens=3,
                                  sampling=greedy(), ignore_eos=True))
        sch.run()
        return sch.n_prompt_tokens - before, r.output_tokens

    lcp_tokens, _ = run(cache_reuse=0)
    reuse_tokens, toks = run(cache_reuse=2)
    assert reuse_tokens < lcp_tokens  # interior chunk was kept, not rerun
    assert reuse_tokens == 1          # only the last token is re-decoded
    assert len(toks) == 3
    # (exact logits parity of the shifted chunk vs a fresh prefill is
    # asserted at engine level on a 1-layer model in test_ctx_shift.py —
    # deeper models keep old-context values in shifted KV, the same
    # approximation the reference makes)


def test_mixed_eligibility_batch_split(sched_model):
    """A grammar/exotic-sampler request must not drop the whole batch to
    per-token host decode: eligible rows keep the windowed device path
    while the ineligible row advances one host-sampled token per round."""
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest, Scheduler
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams

    ctx = Context(sched_model, n_ctx=128, n_seq_max=4, block_size=8)
    sch = Scheduler(ctx, n_slots=3, chunk_size=16, decode_window=8)
    fast1 = sch.submit(GenRequest([3, 17, 42], max_tokens=24,
                                  sampling=greedy(), ignore_eos=True))
    fast2 = sch.submit(GenRequest([9, 4], max_tokens=24,
                                  sampling=greedy(), ignore_eos=True))
    # mirostat forces the host chain
    slow = sch.submit(GenRequest([7, 1, 2], max_tokens=6,
                                 sampling=SamplerParams(temp=0.7, mirostat=2,
                                                        seed=3),
                                 ignore_eos=True))
    sch.run()
    assert len(fast1.output_tokens) == 24
    assert len(fast2.output_tokens) == 24
    assert len(slow.output_tokens) == 6
    m = sch.metrics()
    assert m["gen_tokens_fast_path"] >= 40  # windows kept running
    assert m["gen_tokens_slow_path"] >= 6

    # fast rows' output matches an all-greedy scheduler (device path parity)
    ctx2 = Context(sched_model, n_ctx=128, n_seq_max=4, block_size=8)
    sch2 = Scheduler(ctx2, n_slots=2, chunk_size=16, decode_window=8)
    r1 = sch2.submit(GenRequest([3, 17, 42], max_tokens=24,
                                sampling=greedy(), ignore_eos=True))
    sch2.run()
    assert fast1.output_tokens == r1.output_tokens


def test_grammar_candidate_download_path(sched_model):
    """Grammar rows ride the top-K candidate download (no [B, V] logits
    transfer) with token parity vs the full-logits host path."""
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest, Scheduler
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams

    def run(monkey_off=False):
        import llama_cpp_test_tpu.runtime.device_sampling as ds

        orig = ds.host_candidates_eligible
        if monkey_off:
            ds.host_candidates_eligible = lambda p: False
        try:
            ctx = Context(sched_model, n_ctx=64, n_seq_max=2, block_size=8)
            sch = Scheduler(ctx, n_slots=1, chunk_size=16)
            r = sch.submit(GenRequest(
                [3, 17], max_tokens=6,
                sampling=SamplerParams(temp=0.7, top_k=20, seed=5,
                                       grammar="root ::= [0-9]+"),
                ignore_eos=True))
            sch.run()
            return r, sch.metrics()
        finally:
            ds.host_candidates_eligible = orig

    r, m = run()
    assert len(r.output_tokens) >= 1
    # first token is sampled from prefill logits; every decode step after
    # rides the candidate download
    assert m["gen_tokens_candidate_path"] >= len(r.output_tokens) - 1
    tok = sched_model.tokenizer
    text = "".join(tok.token_to_piece(t) for t in r.output_tokens)
    assert text and all(c in "0123456789" for c in text), text

    # token parity with the full-logits host path (same chain, same seed)
    r2, m2 = run(monkey_off=True)
    assert m2["gen_tokens_candidate_path"] == 0
    assert r2.output_tokens == r.output_tokens


def test_grammar_candidate_fallback_full_logits(sched_model, monkeypatch):
    """When the grammar rejects every downloaded candidate the step rolls
    back and re-runs with full logits — output stays grammar-legal."""
    import llama_cpp_test_tpu.runtime.device_sampling as ds
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest, Scheduler
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams

    # K=4 candidates: the random model's top-4 are almost surely not
    # digits, forcing the all-rejected fallback
    monkeypatch.setattr(ds, "HOST_CANDIDATES_K", 4)
    ctx = Context(sched_model, n_ctx=64, n_seq_max=2, block_size=8)
    sch = Scheduler(ctx, n_slots=1, chunk_size=16)
    r = sch.submit(GenRequest(
        [3, 17], max_tokens=4,
        sampling=SamplerParams(temp=0.7, top_k=2, seed=5,
                               grammar="root ::= [0-9]+"),
        ignore_eos=True))
    sch.run()
    m = sch.metrics()
    assert m["gen_tokens_candidate_path"] >= 1
    assert m["candidate_path_fallbacks"] >= 1
    tok = sched_model.tokenizer
    text = "".join(tok.token_to_piece(t) for t in r.output_tokens)
    assert text and all(c in "0123456789" for c in text), text


def test_prefill_first_token_candidate_parity(sched_model):
    """The final prefill chunk's first token samples from the device
    top-K download (TTFT fast path) with token parity vs the full-logits
    path."""
    from llama_cpp_test_tpu.runtime.engine import Context
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest, Scheduler
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams

    def run(monkey_off=False):
        import llama_cpp_test_tpu.runtime.device_sampling as ds

        orig = ds.host_candidates_eligible
        if monkey_off:
            ds.host_candidates_eligible = lambda p: False
        try:
            ctx = Context(sched_model, n_ctx=64, n_seq_max=2, block_size=8)
            sch = Scheduler(ctx, n_slots=1, chunk_size=16)
            r = sch.submit(GenRequest(
                [3, 17, 42, 9], max_tokens=6,
                sampling=SamplerParams(temp=0.7, top_k=20, seed=9),
                ignore_eos=True))
            sch.run()
            return r, sch
        finally:
            ds.host_candidates_eligible = orig

    r1, s1 = run()
    r2, s2 = run(monkey_off=True)
    assert r1.output_tokens == r2.output_tokens
    assert s1.n_decode_cand >= 1      # the prefill candidate path engaged
