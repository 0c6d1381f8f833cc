"""llama-cli analogue (reference examples/main/main.cpp): one-shot and
interactive generation from a GGUF model, with the full sampler chain.

Usage:
  python -m llama_cpp_test_tpu.cli.main -m model.gguf -p "prompt" -n 64
  python -m llama_cpp_test_tpu.cli.main -m model.gguf -i           # chat
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    """Flags come from the declarative registry (common/args.py — the
    common/arg.h analogue) with env mirrors; only llama-cli-specific
    extras are declared here."""
    from ..common.args import Arg, build_parser as registry_parser

    extras = [
        Arg(("-p", "--prompt"), "prompt", str, "", "prompt text",
            examples=("main",)),
        Arg(("-f", "--file"), "file", str, None, "prompt from file",
            examples=("main",)),
        Arg(("-i", "--interactive"), "interactive", "store_true", False,
            "interactive chat mode", examples=("main",)),
        Arg(("--no-display-prompt",), "no_display_prompt", "store_true",
            False, "", examples=("main",)),
        Arg(("--verbose-prompt",), "verbose_prompt", "store_true", False,
            "", examples=("main",)),
        Arg(("-r", "--reverse-prompt"), "reverse_prompt", str, None,
            "stop generation when this string appears (repeatable; "
            "interactive mode returns control)", action="append",
            examples=("main",)),
        Arg(("--prompt-cache",), "prompt_cache", str, None,
            "session file: restore the prompt's KV from it and update it "
            "after the run (main.cpp:237-255)", examples=("main",)),
        Arg(("--prompt-cache-all",), "prompt_cache_all", "store_true",
            False, "also cache generated tokens in the session file",
            examples=("main",)),
        Arg(("--prompt-cache-ro",), "prompt_cache_ro", "store_true",
            False, "use the session file but never update it",
            examples=("main",)),
    ]
    return registry_parser("llama-cli (tpu)",
                           examples=("main", "sampling"), extra=extras)


def _run_mamba(args) -> int:
    """One-shot generation for recurrent state-space models (mamba):
    the arch has no KV cache, so it rides models/mamba.py's
    MambaContext instead of the paged engine (interactive/session
    features are KV-cache machinery and not available here)."""
    from ..models.mamba import MambaContext, MambaModel, generate

    t0 = time.time()
    model = MambaModel(args.model)
    print(f"# mamba model loaded in {time.time()-t0:.1f}s "
          f"(n_layer={model.hp.n_layer}, d_inner={model.hp.d_inner})",
          file=sys.stderr)
    if model.tokenizer is None:
        print("error: model has no tokenizer", file=sys.stderr)
        return 1
    prompt = args.prompt or ""
    if getattr(args, "file", None):
        prompt = open(args.file, encoding="utf-8").read()
    toks = model.tokenizer.encode(prompt, add_special=True)
    ctx = MambaContext(model)
    vocab = model.tokenizer.vocab
    sys.stdout.write(prompt)
    for tok in generate(ctx, toks, args.n_predict):
        if vocab.is_eog(tok):
            break
        sys.stdout.write(model.tokenizer.token_to_piece(tok))
        sys.stdout.flush()
    sys.stdout.write("\n")
    return 0


def _run_rwkv6(args) -> int:
    """One-shot generation for rwkv6 (recurrent wkv states, no KV
    cache): rides models/rwkv6.py's Rwkv6Context."""
    from ..models.rwkv6 import Rwkv6Context, Rwkv6Model, generate

    t0 = time.time()
    model = Rwkv6Model(args.model)
    print(f"# rwkv6 model loaded in {time.time()-t0:.1f}s "
          f"(n_layer={model.hp.n_layer}, head_size={model.hp.head_size})",
          file=sys.stderr)
    if model.tokenizer is None:
        print("error: model has no tokenizer", file=sys.stderr)
        return 1
    prompt = args.prompt or ""
    if getattr(args, "file", None):
        prompt = open(args.file, encoding="utf-8").read()
    toks = model.tokenizer.encode(prompt, add_special=True)
    ctx = Rwkv6Context(model)
    vocab = model.tokenizer.vocab
    sys.stdout.write(prompt)
    for tok in generate(ctx, toks, args.n_predict):
        if vocab.is_eog(tok):
            break
        sys.stdout.write(model.tokenizer.token_to_piece(tok))
        sys.stdout.flush()
    sys.stdout.write("\n")
    return 0


def _run_rwkv7(args) -> int:
    """One-shot generation for rwkv7/arwkv7 (recurrent wkv7 states)."""
    from ..models.rwkv7 import Rwkv7Context, Rwkv7Model, generate

    t0 = time.time()
    model = Rwkv7Model(args.model)
    print(f"# {model.hp.arch} model loaded in {time.time()-t0:.1f}s "
          f"(n_layer={model.hp.n_layer}, head_size={model.hp.head_size})",
          file=sys.stderr)
    if model.tokenizer is None:
        print("error: model has no tokenizer", file=sys.stderr)
        return 1
    prompt = args.prompt or ""
    if getattr(args, "file", None):
        prompt = open(args.file, encoding="utf-8").read()
    toks = model.tokenizer.encode(prompt, add_special=True)
    ctx = Rwkv7Context(model)
    vocab = model.tokenizer.vocab
    sys.stdout.write(prompt)
    for tok in generate(ctx, toks, args.n_predict):
        if vocab.is_eog(tok):
            break
        sys.stdout.write(model.tokenizer.token_to_piece(tok))
        sys.stdout.flush()
    sys.stdout.write("\n")
    return 0


def _run_t5(args) -> int:
    """Encoder-decoder generation (t5): llama_encode on the prompt, then
    the decoder loop seeded with decoder_start_token (the reference
    main.cpp T5 flow)."""
    from ..models.t5 import T5Context, T5Model, generate

    t0 = time.time()
    model = T5Model(args.model)
    print(f"# t5 model loaded in {time.time()-t0:.1f}s "
          f"(n_layer={model.hp.n_layer}, d_kv={model.hp.d_kv})",
          file=sys.stderr)
    if model.tokenizer is None:
        print("error: model has no tokenizer", file=sys.stderr)
        return 1
    if model.dec is None:
        print("error: t5encoder GGUFs are embedding-only — use "
              "llama-embedding", file=sys.stderr)
        return 1
    prompt = args.prompt or ""
    if getattr(args, "file", None):
        prompt = open(args.file, encoding="utf-8").read()
    toks = model.tokenizer.encode(prompt, add_special=True)
    ctx = T5Context(model, n_ctx=max(64, args.n_predict + 8))
    vocab = model.tokenizer.vocab
    eos = vocab.eos_id if vocab.eos_id is not None else 1
    for tok in generate(ctx, toks, args.n_predict, eos_id=eos):
        sys.stdout.write(model.tokenizer.token_to_piece(tok))
        sys.stdout.flush()
    sys.stdout.write("\n")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..gguf.reader import open_gguf
    from ..runtime.engine import Context, Model
    from ..runtime.sampling import SamplerChain, SamplerParams
    from ..runtime.scheduler import GenRequest, Scheduler

    _arch = open_gguf(args.model).metadata.get("general.architecture")
    if _arch == "mamba":
        return _run_mamba(args)
    if _arch in ("rwkv6", "rwkv6qwen2"):
        return _run_rwkv6(args)
    if _arch in ("rwkv7", "arwkv7"):
        return _run_rwkv7(args)
    if _arch in ("t5", "t5encoder"):
        return _run_t5(args)

    t0 = time.time()
    mesh = None
    if args.tensor_parallel > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(dp=1, tp=args.tensor_parallel)
    from ..common.args import parse_kv_overrides, rope_kv_overrides
    import os as _os

    if getattr(args, "threads", 0):
        _os.environ["LLAMA_ARG_THREADS"] = str(args.threads)
    overrides = parse_kv_overrides(getattr(args, "override_kv", None))
    overrides.update(rope_kv_overrides(args))
    model = Model(args.model, mesh=mesh, kv_overrides=overrides)
    print(f"# model loaded in {time.time()-t0:.1f}s "
          f"(arch={model.hp.arch}, n_layer={model.hp.n_layer}, "
          f"n_vocab={model.hp.n_vocab})", file=sys.stderr)
    if model.tokenizer is None:
        print("error: model has no tokenizer", file=sys.stderr)
        return 1

    for path, scale in [(p, 1.0) for p in args.lora] + \
            [(p, float(s)) for p, s in args.lora_scaled]:
        from ..models.lora import attach_lora, load_lora

        attach_lora(model.weights, load_lora(path, model.hp), scale)
        print(f"# lora attached: {path} (scale {scale})", file=sys.stderr)
    cv_specs = [(p, 1.0) for p in args.control_vector] + \
        [(p, float(s)) for p, s in args.control_vector_scaled]
    if cv_specs:
        from ..models.cvec import attach_control_vector, load_control_vector
        import numpy as _np

        combined: dict[int, object] = {}
        for path, strength in cv_specs:
            for il, v in load_control_vector(path).items():
                combined[il] = combined.get(il, 0) + v * strength
        attach_control_vector(model.weights,
                              {k: _np.asarray(v) for k, v in combined.items()})
        print(f"# control vectors attached: {len(cv_specs)}", file=sys.stderr)

    ctx = Context(model, n_ctx=args.ctx_size, n_seq_max=1,
                  kv_type=args.cache_type_kv)
    sched = Scheduler(ctx, n_slots=1, chunk_size=args.batch_size,
                      ctx_shift=not args.no_context_shift)
    # session file (--prompt-cache, main.cpp:237-255): pre-warm slot 0's
    # sequence from the saved KV; the scheduler's prefix-reuse then skips
    # re-prefilling the shared prefix. Saved back after each run.
    import os as _os

    if args.prompt_cache and _os.path.exists(args.prompt_cache):
        from ..runtime.state import load_seq_state

        sess = load_seq_state(ctx, args.prompt_cache)
        sched.slots[0].seq = sess
        sched.slots[0].cache_tokens = list(sess.tokens)
        print(f"# session restored: {len(sess.tokens)} tokens from "
              f"{args.prompt_cache}", file=sys.stderr)
    # built by the shared helper so every 'sampling'-domain flag the parser
    # accepts (incl. --grammar/--grammar-file) actually reaches the chain
    from ..common.args import sampler_params_from_args

    sp = sampler_params_from_args(args)

    prompt = args.prompt
    if args.file:
        with open(args.file, encoding="utf-8") as f:
            prompt = f.read()

    def run_once(text: str) -> None:
        toks = model.tokenizer.encode(text, add_special=True,
                                      parse_special=True)
        if args.verbose_prompt:
            for t in toks:
                print(f"{t:7d} -> {model.tokenizer.token_to_piece(t)!r}",
                      file=sys.stderr)
        t_start = time.time()
        n_out = 0

        def on_token(tok, piece, finished):
            nonlocal n_out
            if finished is None and piece:
                sys.stdout.write(piece)
                sys.stdout.flush()
                n_out += 1

        req = GenRequest(prompt_tokens=toks, max_tokens=args.n_predict,
                         sampling=sp, on_token=on_token,
                         ignore_eos=args.ignore_eos, n_keep=args.keep,
                         stop_strings=list(args.reverse_prompt or ()))
        if not args.no_display_prompt:
            sys.stdout.write(text)
        sched.submit(req)
        sched.run()
        dt = time.time() - t_start
        m = sched.metrics()
        print(f"\n# {len(toks)} prompt + {len(req.output_tokens)} generated "
              f"in {dt:.2f}s | prefill {m['prompt_tok_per_s']} t/s | "
              f"decode {m['gen_tok_per_s']} t/s", file=sys.stderr)
        if args.prompt_cache and not args.prompt_cache_ro and \
                sched.slots[0].seq is not None:
            from ..runtime.state import save_seq_state

            sess = sched.slots[0].seq
            if not args.prompt_cache_all and \
                    sess.n_cached > len(toks):
                # prompt-only caching: drop the generated tail
                ctx.truncate_seq(sess, len(toks))
                sched.slots[0].cache_tokens = list(sess.tokens)
            nb = save_seq_state(ctx, sess, args.prompt_cache)
            print(f"# session saved: {sess.n_cached} tokens "
                  f"({nb/1e6:.1f} MB) -> {args.prompt_cache}",
                  file=sys.stderr)

    if args.interactive:
        print("== interactive mode; empty line or /exit quits ==",
              file=sys.stderr)
        while True:
            try:
                line = input("> ")
            except (EOFError, KeyboardInterrupt):
                break
            if not line.strip() or line.strip() == "/exit":
                break
            run_once(line)
    else:
        if not prompt:
            print("error: empty prompt (use -p or -f or -i)", file=sys.stderr)
            return 1
        run_once(prompt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
