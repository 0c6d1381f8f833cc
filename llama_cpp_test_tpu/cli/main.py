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
    ap = argparse.ArgumentParser(
        "llama-cli (tpu)",
        description="TPU-native llama.cpp-compatible text generation")
    ap.add_argument("-m", "--model", required=True, help="GGUF model path")
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("-f", "--file", default=None, help="prompt from file")
    ap.add_argument("-n", "--n-predict", type=int, default=128)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-i", "--interactive", action="store_true")
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--min-p", type=float, default=0.05)
    ap.add_argument("--typical", type=float, default=1.0)
    ap.add_argument("--repeat-penalty", type=float, default=1.0)
    ap.add_argument("--repeat-last-n", type=int, default=64)
    ap.add_argument("--frequency-penalty", type=float, default=0.0)
    ap.add_argument("--presence-penalty", type=float, default=0.0)
    ap.add_argument("--mirostat", type=int, default=0)
    ap.add_argument("--mirostat-tau", type=float, default=5.0)
    ap.add_argument("--mirostat-eta", type=float, default=0.1)
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("--no-display-prompt", action="store_true")
    ap.add_argument("--verbose-prompt", action="store_true")
    ap.add_argument("-tp", "--tensor-parallel", type=int, default=1,
                    help="shard over N local devices")
    ap.add_argument("--lora", action="append", default=[],
                    help="LoRA adapter GGUF (repeatable)")
    ap.add_argument("--lora-scaled", action="append", nargs=2, default=[],
                    metavar=("PATH", "SCALE"))
    ap.add_argument("--control-vector", action="append", default=[],
                    help="control-vector GGUF (repeatable)")
    ap.add_argument("--control-vector-scaled", action="append", nargs=2,
                    default=[], metavar=("PATH", "STRENGTH"))
    ap.add_argument("--keep", type=int, default=0,
                    help="tokens pinned at the head on context shift")
    ap.add_argument("-ctk", "--cache-type-kv", default="bf16",
                    choices=["bf16", "f16", "q8_0"],
                    help="KV cache data type (type_k/type_v analogue)")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..runtime.engine import Context, Model
    from ..runtime.sampling import SamplerChain, SamplerParams
    from ..runtime.scheduler import GenRequest, Scheduler

    t0 = time.time()
    mesh = None
    if args.tensor_parallel > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(dp=1, tp=args.tensor_parallel)
    model = Model(args.model, mesh=mesh)
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
    sched = Scheduler(ctx, n_slots=1)
    sp = SamplerParams(
        seed=args.seed, temp=args.temp, top_k=args.top_k, top_p=args.top_p,
        min_p=args.min_p, typ_p=args.typical,
        penalty_repeat=args.repeat_penalty,
        penalty_last_n=args.repeat_last_n,
        penalty_freq=args.frequency_penalty,
        penalty_present=args.presence_penalty,
        mirostat=args.mirostat, mirostat_tau=args.mirostat_tau,
        mirostat_eta=args.mirostat_eta,
    )

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
                         sampling=sp, on_token=on_token)
        if not args.no_display_prompt:
            sys.stdout.write(text)
        sched.submit(req)
        sched.run()
        dt = time.time() - t_start
        m = sched.metrics()
        print(f"\n# {len(toks)} prompt + {len(req.output_tokens)} generated "
              f"in {dt:.2f}s | prefill {m['prompt_tok_per_s']} t/s | "
              f"decode {m['gen_tok_per_s']} t/s", file=sys.stderr)

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
