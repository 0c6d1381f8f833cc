"""Tokenizer CLI — the examples/tokenize analogue.

Prints token ids (and pieces) for a prompt using the model's embedded vocab.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("llama-tokenize (tpu)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("-f", "--file", default=None)
    ap.add_argument("--stdin", action="store_true")
    ap.add_argument("--ids", action="store_true",
                    help="print only the id list")
    ap.add_argument("--no-bos", action="store_true")
    ap.add_argument("--no-parse-special", action="store_true")
    ap.add_argument("--show-count", action="store_true")
    args = ap.parse_args(argv)

    if args.prompt is not None:
        text = args.prompt
    elif args.file:
        with open(args.file, encoding="utf-8") as f:
            text = f.read()
    elif args.stdin:
        text = sys.stdin.read()
    else:
        ap.error("one of --prompt/--file/--stdin is required")

    from ..tokenizer import load_tokenizer
    from ..gguf.reader import GGUFReader

    with GGUFReader(args.model) as r:
        tok = load_tokenizer(r)
    ids = tok.encode(text, add_special=not args.no_bos,
                     parse_special=not args.no_parse_special)
    if args.ids:
        print("[" + ", ".join(str(i) for i in ids) + "]")
    else:
        for i in ids:
            piece = tok.token_to_piece(i)
            print(f"{i:>8} -> {piece!r}")
    if args.show_count:
        print(f"Total number of tokens: {len(ids)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
