"""N-way parallel generation from one prompt — the examples/batched analogue.

Prefills the prompt once, COW-forks the sequence N ways (the seq_cp fan-out
of examples/batched/batched.cpp) and samples N continuations in one batched
decode loop.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("llama-batched (tpu)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="Hello my name is")
    ap.add_argument("-np", "--n-parallel", type=int, default=4)
    ap.add_argument("-n", "--n-predict", type=int, default=32)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    import numpy as np

    from ..runtime.engine import Context, Model
    from ..runtime.sampling import SamplerChain, SamplerParams

    model = Model(args.model)
    tok = model.tokenizer
    if tok is None:
        print("model has no tokenizer", file=sys.stderr)
        return 1
    prompt = tok.encode(args.prompt, add_special=True)
    n = args.n_parallel
    ctx = Context(model, n_ctx=len(prompt) + args.n_predict + 8, n_seq_max=n)

    s0 = ctx.new_seq()
    logits = ctx.prefill(s0, prompt)
    seqs = [s0] + [ctx.fork_seq(s0) for _ in range(n - 1)]
    samplers = [SamplerChain.from_params(
        SamplerParams(temp=args.temp, top_k=args.top_k, seed=args.seed + i),
        n_vocab=model.hp.n_vocab) for i in range(n)]

    texts = [[] for _ in range(n)]
    toks = []
    for i, smpl in enumerate(samplers):
        t = smpl.sample(np.asarray(logits))
        smpl.accept(t)
        toks.append(t)
        texts[i].append(t)
    alive = list(range(n))
    eos = tok.vocab.eos_id
    for _ in range(args.n_predict - 1):
        if not alive:
            break
        lg = ctx.decode([seqs[i] for i in alive], [toks[i] for i in alive])
        next_alive = []
        for row, i in zip(lg, alive):
            t = samplers[i].sample(np.asarray(row))
            samplers[i].accept(t)
            toks[i] = t
            if t == eos:
                continue
            texts[i].append(t)
            next_alive.append(i)
        alive = next_alive

    for i, ids in enumerate(texts):
        print(f"sequence {i}: {args.prompt}{tok.decode(ids)}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
