"""Batched throughput benchmark (the examples/batched-bench analogue).

Measures prompt-processing and text-generation speed over a B x PP x TG grid
with the same output table as the reference (batched-bench/README.md:28-49):

  PP  TG  B  N_KV  T_PP  S_PP  T_TG  S_TG  T  S

Shared-prompt mode (-pps) prefills once and COW-forks the sequence B ways
(the seq_cp fan-out of examples/batched.cpp); otherwise each stream prefills
its own prompt.
"""
from __future__ import annotations

import argparse
import itertools
import json
import sys
import time

import numpy as np


def run_cell(ctx, pp: int, tg: int, b: int, shared: bool, rng) -> dict:
    from ..runtime.engine import SeqState

    prompt = list(rng.integers(1, ctx.model.hp.n_vocab - 1, pp))
    t0 = time.time()
    if shared:
        s0 = ctx.new_seq()
        ctx.prefill(s0, prompt)
        seqs = [s0] + [ctx.fork_seq(s0) for _ in range(b - 1)]
    else:
        seqs = []
        for _ in range(b):
            s = ctx.new_seq()
            ctx.prefill(s, prompt)
            seqs.append(s)
    t_pp = time.time() - t0
    toks = [int(rng.integers(1, ctx.model.hp.n_vocab - 1)) for _ in seqs]
    # warmup decode (compile)
    logits = ctx.decode(seqs, toks)
    toks = [int(np.argmax(lg)) for lg in logits]
    t0 = time.time()
    for _ in range(tg - 1):
        logits = ctx.decode(seqs, toks)
        toks = [int(np.argmax(lg)) for lg in logits]
    t_tg = time.time() - t0
    n_tg = (tg - 1) * b
    for s in seqs:
        ctx.free_seq(s)
    pp_total = pp if shared else pp * b
    return {
        "PP": pp, "TG": tg, "B": b,
        "N_KV": pp_total + tg * b,
        "T_PP": round(t_pp, 3),
        "S_PP": round(pp_total / t_pp, 2),
        "T_TG": round(t_tg, 3),
        "S_TG": round(n_tg / max(t_tg, 1e-9), 2),
        "T": round(t_pp + t_tg, 3),
        "S": round((pp_total + n_tg) / (t_pp + t_tg), 2),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("llama-batched-bench (tpu)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-npp", default="128,256", help="prompt sizes")
    ap.add_argument("-ntg", default="32", help="gen sizes")
    ap.add_argument("-npl", default="1,2,4,8", help="batch sizes")
    ap.add_argument("-pps", action="store_true", help="shared prompt")
    ap.add_argument("--output", choices=["md", "jsonl"], default="md")
    args = ap.parse_args(argv)

    from ..runtime.engine import Context, Model

    model = Model(args.model)
    pps = [int(x) for x in args.npp.split(",")]
    tgs = [int(x) for x in args.ntg.split(",")]
    bs = [int(x) for x in args.npl.split(",")]
    rng = np.random.default_rng(0)

    cols = ["PP", "TG", "B", "N_KV", "T_PP", "S_PP", "T_TG", "S_TG", "T", "S"]
    if args.output == "md":
        print("| " + " | ".join(cols) + " |")
        print("|" + "|".join(["---"] * len(cols)) + "|")
    for pp, tg, b in itertools.product(pps, tgs, bs):
        need = (pp + tg + 16) * b
        if need > args.ctx_size * b:
            continue
        ctx = Context(model, n_ctx=pp + tg + 16, n_seq_max=b)
        row = run_cell(ctx, pp, tg, b, args.pps, rng)
        if args.output == "md":
            print("| " + " | ".join(str(row[c]) for c in cols) + " |",
                  flush=True)
        else:
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
