"""State save/load round-trip demo — the examples/save-load-state analogue.

Generates n tokens, saves the sequence state, restores it into a fresh
context and continues generation; verifies both continuations match.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("llama-save-load-state (tpu)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="The quick brown fox")
    ap.add_argument("-n", "--n-predict", type=int, default=16)
    ap.add_argument("--state-file", default="/tmp/state.npz")
    args = ap.parse_args(argv)

    from ..runtime.engine import Context, Model, generate
    from ..runtime.state import load_seq_state, save_seq_state

    model = Model(args.model)
    if model.tokenizer is not None:
        prompt = model.tokenizer.encode(args.prompt, add_special=True)
    else:
        prompt = [1, 2, 3]
    n1 = args.n_predict // 2

    ctx = Context(model, n_ctx=len(prompt) + args.n_predict + 8, n_seq_max=2)
    s = ctx.new_seq()
    import numpy as np

    logits = ctx.prefill(s, prompt)
    first = []
    tok = int(np.argmax(logits))
    for _ in range(n1):
        first.append(tok)
        logits = ctx.decode([s], [tok])[0]
        tok = int(np.argmax(logits))
    print("first run :", prompt, "->", first)

    n_written = save_seq_state(ctx, s, args.state_file)
    print(f"saved {n_written} bytes to {args.state_file}")

    # continue in-place
    cont_a = []
    ta = tok
    for _ in range(args.n_predict - n1):
        cont_a.append(ta)
        ta = int(np.argmax(ctx.decode([s], [ta])[0]))

    # restore into a fresh context and continue from the same point
    ctx2 = Context(model, n_ctx=len(prompt) + args.n_predict + 8, n_seq_max=2)
    s2 = load_seq_state(ctx2, args.state_file)
    cont_b = []
    tb = tok
    for _ in range(args.n_predict - n1):
        cont_b.append(tb)
        tb = int(np.argmax(ctx2.decode([s2], [tb])[0]))

    print("continue A:", cont_a)
    print("continue B:", cont_b)
    if cont_a != cont_b:
        print("FAIL: continuations diverge after state restore")
        return 1
    print("OK: restored continuation matches")
    return 0


if __name__ == "__main__":
    sys.exit(main())
