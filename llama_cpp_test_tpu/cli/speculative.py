"""Speculative decoding CLI — the examples/speculative +
examples/speculative-simple analogue.

Linear mode (default) mirrors speculative-simple's
common_speculative_gen_draft loop; --n-seq-dft > 1 switches to tree mode
(speculative.cpp's parallel draft branches with p_split forking).
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("llama-speculative (tpu)")
    ap.add_argument("-m", "--model", required=True, help="target model")
    ap.add_argument("-md", "--model-draft", required=True)
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--n-draft", type=int, default=8)
    ap.add_argument("-ns", "--n-seq-dft", type=int, default=1,
                    help=">1 enables tree-based drafting")
    ap.add_argument("--p-split", type=float, default=0.1)
    ap.add_argument("--p-min", type=float, default=0.75,
                    help="draft confidence floor (linear mode)")
    args = ap.parse_args(argv)

    from ..runtime.engine import Context, Model

    target_model = Model(args.model)
    draft_model = Model(args.model_draft)
    tok = target_model.tokenizer
    if tok is None:
        print("target model has no tokenizer", file=sys.stderr)
        return 1
    prompt = tok.encode(args.prompt, add_special=True)
    tgt = Context(target_model, n_ctx=args.ctx_size, n_seq_max=1)
    eos = {tok.vocab.eos_id} if tok.vocab.eos_id >= 0 else None

    t0 = time.time()
    if args.n_seq_dft > 1:
        from ..runtime.speculative import (TreeSpecParams,
                                           TreeSpeculativeDecoder)

        drf = Context(draft_model, n_ctx=args.ctx_size,
                      n_seq_max=args.n_seq_dft * 2 + 2)
        dec = TreeSpeculativeDecoder(tgt, drf, TreeSpecParams(
            n_draft=args.n_draft, n_seq_dft=args.n_seq_dft,
            p_split=args.p_split))
        out = dec.generate(prompt, args.n_predict, eos_ids=eos)
        extra = f", splits = {dec.n_splits}"
    else:
        from ..runtime.speculative import SpecParams, SpeculativeDecoder

        drf = Context(draft_model, n_ctx=args.ctx_size, n_seq_max=1)
        dec = SpeculativeDecoder(tgt, drf, SpecParams(
            n_draft=args.n_draft, p_min=args.p_min))
        out = dec.generate(prompt, args.n_predict, eos_ids=eos)
        extra = ""
    dt = time.time() - t0

    print(tok.decode(out))
    st = dec.stats
    print(f"\nn_generated = {len(out)}, drafted = {st.n_drafted}, "
          f"accepted = {st.n_accepted} "
          f"(rate {st.accept_rate:.2f}), target calls = "
          f"{st.n_target_calls}{extra}, {len(out) / dt:.2f} t/s",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
