"""Multi-client continuous-batching simulation — the examples/parallel
analogue (reference examples/parallel/parallel.cpp).

Feeds N synthetic client requests through the continuous-batching Scheduler
with S server slots and reports per-request and aggregate throughput — the
same experiment parallel.cpp runs with its question bank.
"""
from __future__ import annotations

import argparse
import sys
import time

# the reference's built-in question bank (shortened)
_QUESTIONS = [
    "What is the meaning of life?",
    "Tell me an interesting fact about llamas.",
    "What is the best way to cook a steak?",
    "Are you familiar with the Special Theory of Relativity?",
    "Recommend some interesting books to read.",
    "What is the best way to learn a new language?",
    "How to get a job at Google?",
    "If you could have any superpower, what would it be?",
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("llama-parallel (tpu)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-ns", "--n-sequences", type=int, default=8,
                    help="total requests to run")
    ap.add_argument("-np", "--n-parallel", type=int, default=4,
                    help="server slots")
    ap.add_argument("-n", "--n-predict", type=int, default=32)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    args = ap.parse_args(argv)

    from ..runtime.engine import Context, Model
    from ..runtime.sampling import SamplerParams
    from ..runtime.scheduler import GenRequest, Scheduler

    model = Model(args.model)
    tok = model.tokenizer
    ctx = Context(model, n_ctx=args.ctx_size, n_seq_max=args.n_parallel)
    sched = Scheduler(ctx, n_slots=args.n_parallel)

    reqs = []
    for i in range(args.n_sequences):
        q = _QUESTIONS[i % len(_QUESTIONS)]
        toks = tok.encode(q, add_special=True) if tok else [1 + i]
        reqs.append(sched.submit(GenRequest(
            prompt_tokens=toks, max_tokens=args.n_predict,
            sampling=SamplerParams(temp=0.0))))

    t0 = time.time()
    sched.run()
    dt = time.time() - t0

    n_gen = sum(len(r.output_tokens) for r in reqs)
    n_prompt = sum(r.n_prompt for r in reqs)
    for i, r in enumerate(reqs):
        text = tok.decode(r.output_tokens) if tok else str(r.output_tokens)
        print(f"=== request {i} ({r.finish_reason}, "
              f"{len(r.output_tokens)} tokens) ===\n{text}\n")
    print(f"total: {args.n_sequences} requests, {n_prompt} prompt + "
          f"{n_gen} generated tokens in {dt:.2f}s "
          f"({(n_prompt + n_gen) / dt:.2f} t/s aggregate)", file=sys.stderr)
    m = sched.metrics()
    print(f"prompt t/s: {m['prompt_tok_per_s']}, "
          f"gen t/s: {m['gen_tok_per_s']}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
