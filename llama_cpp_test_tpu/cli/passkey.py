"""Passkey retrieval test (reference examples/passkey/passkey.cpp): hide a
number in a long junk context and check the model retrieves it, optionally
compressing positions with Self-Extend grouped attention
(passkey.cpp:131-137 — llama_kv_self_seq_add + seq_div, here the paged
K-shift in Context.self_extend).

  python -m ...cli.passkey -m model.gguf --junk 250 --grp-attn-n 4
"""
from __future__ import annotations

import argparse
import random
import sys


def build_prompt(n_junk: int, passkey: int, seed: int = 42):
    rng = random.Random(seed)
    junk = ("The grass is green. The sky is blue. The sun is yellow. "
            "Here we go. There and back again.")
    pos = rng.randint(0, n_junk - 1)
    parts = ["There is an important info hidden inside a lot of irrelevant "
             "text. Find it and memorize them. I will quiz you about the "
             "important information there."]
    for i in range(n_junk):
        if i == pos:
            parts.append(f" The pass key is {passkey}. Remember it. "
                         f"{passkey} is the pass key.")
        parts.append(" " + junk)
    parts.append(" What is the pass key? The pass key is")
    return "".join(parts)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("llama-passkey (tpu)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--junk", type=int, default=250,
                    help="junk paragraphs (reference n_junk)")
    ap.add_argument("--passkey", type=int, default=None)
    ap.add_argument("-c", "--ctx-size", type=int, default=4096)
    ap.add_argument("--grp-attn-n", type=int, default=1,
                    help="self-extend group size (1 = off)")
    ap.add_argument("--grp-attn-w", type=int, default=512,
                    help="self-extend window: tokens kept ungrouped")
    ap.add_argument("-n", "--n-predict", type=int, default=32)
    args = ap.parse_args(argv)

    from ..runtime.engine import Context, Model

    model = Model(args.model)
    tok = model.tokenizer
    passkey = args.passkey if args.passkey is not None else \
        random.randint(1, 50000)
    prompt = build_prompt(args.junk, passkey)
    ids = tok.encode(prompt)
    print(f"# prompt tokens: {len(ids)}, passkey: {passkey}",
          file=sys.stderr)
    ctx = Context(model, n_ctx=args.ctx_size, n_seq_max=1)
    s = ctx.new_seq()
    # chunked prefill with per-chunk self-extend compression: each call
    # groups only the freshly appended (contiguous-position) chunk, the
    # analogue of the reference's repeated seq_add+seq_div per batch
    chunk = 512
    logits = None
    se_end = 0
    for i in range(0, len(ids), chunk):
        logits = ctx.prefill(s, ids[i: i + chunk])
        if args.grp_attn_n > 1 and s.n_cached - se_end >= args.grp_attn_w:
            ctx.self_extend(s, n_keep=se_end, group=args.grp_attn_n)
            se_end = s.n_cached
    import numpy as np

    out = []
    tokv = int(np.argmax(logits))
    for _ in range(args.n_predict):
        out.append(tokv)
        logits = ctx.decode([s], [tokv])[0]
        tokv = int(np.argmax(logits))
    text = tok.decode(out)
    print(text)
    ok = str(passkey) in text
    print(f"# passkey {'FOUND' if ok else 'NOT FOUND'}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
