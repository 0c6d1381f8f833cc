"""llama-infill analogue (reference examples/infill/infill.cpp): fill-in-
the-middle code completion from the command line.

Builds the PSM-order FIM prompt (fim_pre + prefix + fim_suf + suffix +
fim_mid, reference common_arg / infill.cpp:190-260), generates with the
sampler chain PLUS the dedicated infill sampler
(runtime/sampling.Infill — llama_sampler_init_infill), and stops at any
end-of-generation or FIM pad token.

Usage:
  python -m llama_cpp_test_tpu.cli.infill -m model.gguf \
      --in-prefix "def add(a, b):\n    " --in-suffix "\n    return c" -n 64
"""
from __future__ import annotations

import sys
import time


def build_parser():
    from ..common.args import Arg, build_parser as registry_parser

    extras = [
        Arg(("--in-prefix",), "in_prefix", str, "", "text before the hole",
            examples=("infill",)),
        Arg(("--in-suffix",), "in_suffix", str, "", "text after the hole",
            examples=("infill",)),
        Arg(("--in-prefix-file",), "in_prefix_file", str, None,
            "prefix from file", examples=("infill",)),
        Arg(("--in-suffix-file",), "in_suffix_file", str, None,
            "suffix from file", examples=("infill",)),
        Arg(("--no-infill-sampler",), "no_infill_sampler", "store_true",
            False, "disable the dedicated infill sampler",
            examples=("infill",)),
    ]
    return registry_parser("llama-infill (tpu)",
                           examples=("infill", "main", "sampling"), extra=extras)


def fim_prompt(tokenizer, prefix: str, suffix: str) -> list[int]:
    """PSM-order FIM prompt from the vocab's FIM tokens."""
    v = tokenizer.vocab
    if v.fim_pre_id < 0 or v.fim_suf_id < 0 or v.fim_mid_id < 0:
        raise ValueError("model lacks FIM (infill) tokens — use a "
                         "code model exported with fim_* token ids")
    ids = [v.fim_pre_id]
    ids.extend(tokenizer.encode(prefix, add_special=False))
    ids.append(v.fim_suf_id)
    ids.extend(tokenizer.encode(suffix, add_special=False))
    ids.append(v.fim_mid_id)
    if v.add_bos and ids[0] != v.bos_id:
        ids.insert(0, v.bos_id)
    return ids


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..common.args import parse_kv_overrides, sampler_params_from_args
    from ..runtime.engine import Context, Model
    from ..runtime.sampling import Infill, SamplerChain

    model = Model(args.model,
                  kv_overrides=parse_kv_overrides(
                      getattr(args, "override_kv", None)))
    if model.tokenizer is None:
        print("error: model has no tokenizer", file=sys.stderr)
        return 1
    prefix = args.in_prefix
    suffix = args.in_suffix
    if args.in_prefix_file:
        prefix = open(args.in_prefix_file, encoding="utf-8").read()
    if args.in_suffix_file:
        suffix = open(args.in_suffix_file, encoding="utf-8").read()
    try:
        toks = fim_prompt(model.tokenizer, prefix, suffix)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    ctx = Context(model, n_ctx=args.ctx_size, n_seq_max=1,
                  kv_type=args.cache_type_kv)
    sp = sampler_params_from_args(args)
    chain = SamplerChain.from_params(sp, n_vocab=model.hp.n_vocab)
    if not args.no_infill_sampler:
        # the infill sampler slots in before the final dist/greedy pick
        # (common/sampling.cpp inserts it the same way for llama-infill)
        chain.samplers.insert(max(0, len(chain.samplers) - 1),
                              Infill(model.tokenizer))
    v = model.tokenizer.vocab
    stop_ids = {v.fim_pad_id, v.fim_suf_id, v.fim_pre_id, v.fim_mid_id}

    s = ctx.new_seq()
    t0 = time.time()
    logits = ctx.prefill(s, toks)
    out: list[int] = []
    for _ in range(args.n_predict):
        tok = int(chain.sample(logits))
        chain.accept(tok)
        if v.is_eog(tok) or tok in stop_ids:
            break
        piece = model.tokenizer.token_to_piece(tok)
        if piece:
            sys.stdout.write(piece)
            sys.stdout.flush()
        out.append(tok)
        logits = ctx.decode([s], [tok])[0]
    dt = time.time() - t0
    print(f"\n# infill: {len(toks)} prompt + {len(out)} generated "
          f"in {dt:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
