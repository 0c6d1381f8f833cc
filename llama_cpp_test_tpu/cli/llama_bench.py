"""Matrix benchmark — the llama-bench analogue
(reference examples/llama-bench/llama-bench.cpp).

Benchmarks each model over a matrix of prompt-processing (pp), text-generation
(tg) and combined (pp+tg) tests, repeated -r times, reporting mean ± stdev
tokens/s. Output formats mirror the reference (llama-bench.cpp:99):
markdown table, csv, json, jsonl, sql (INSERT statements).

Example:
    python -m llama_cpp_test_tpu.cli.llama_bench -m model.gguf -p 512 -n 128
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np


def _model_meta(model) -> dict:
    hp = model.hp
    ftypes = {}
    for name, info in model.reader.tensors.items():
        t = getattr(info, "ggml_type", None)
        if t is not None:
            ftypes[t] = ftypes.get(t, 0) + 1
    main_type = max(ftypes, key=ftypes.get) if ftypes else None
    n_params = sum(int(np.prod(i.shape)) for i in model.reader.tensors.values())
    size = sum(getattr(i, "nbytes", 0) or 0
               for i in model.reader.tensors.values())
    return {
        "model_filename": model.path.rsplit("/", 1)[-1],
        "model_type": getattr(main_type, "name", str(main_type)),
        "model_n_params": n_params,
        "model_size": size,
        "n_layer": hp.n_layer,
        "n_embd": hp.n_embd,
    }


def _backend() -> str:
    import jax

    return jax.devices()[0].platform


def bench_pp(ctx, n_prompt: int, reps: int, rng) -> list[float]:
    """tokens/s for a single prefill of n_prompt tokens, reps times."""
    out = []
    for _ in range(reps + 1):  # first run includes compile: warmup, dropped
        s = ctx.new_seq()
        prompt = list(rng.integers(1, ctx.model.hp.n_vocab - 1, n_prompt))
        t0 = time.time()
        ctx.prefill(s, prompt)
        out.append(n_prompt / (time.time() - t0))
        ctx.free_seq(s)
    return out[1:]


def bench_tg(ctx, n_gen: int, reps: int, rng, n_prompt: int = 0) -> list[float]:
    """tokens/s for n_gen sequential decode steps (after optional prefill)."""
    out = []
    for _ in range(reps + 1):
        s = ctx.new_seq()
        if n_prompt:
            ctx.prefill(s, list(rng.integers(1, ctx.model.hp.n_vocab - 1,
                                             n_prompt)))
        tok = int(rng.integers(1, ctx.model.hp.n_vocab - 1))
        logits = ctx.decode([s], [tok])  # warm the decode program
        t0 = time.time()
        for _ in range(n_gen):
            tok = int(np.argmax(logits[0]))
            logits = ctx.decode([s], [tok])
        out.append(n_gen / (time.time() - t0))
        ctx.free_seq(s)
    return out[1:]


def run_tests(model, tests: list[tuple[str, int, int]], reps: int,
              n_ctx: int | None = None) -> list[dict]:
    """tests: list of (kind, n_prompt, n_gen); kind in pp|tg|pp+tg."""
    from ..runtime.engine import Context

    meta = _model_meta(model)
    backend = _backend()
    rng = np.random.default_rng(0)
    rows = []
    for kind, n_p, n_g in tests:
        ctx = Context(model, n_ctx=n_ctx or (n_p + n_g + 16), n_seq_max=1)
        if kind == "pp":
            ts = bench_pp(ctx, n_p, reps, rng)
            label = f"pp{n_p}"
        elif kind == "tg":
            ts = bench_tg(ctx, n_g, reps, rng)
            label = f"tg{n_g}"
        else:
            ts = bench_tg(ctx, n_g, reps, rng, n_prompt=n_p)
            label = f"pp{n_p}+tg{n_g}"
        row = dict(meta)
        row.update({
            "backend": backend,
            "test": label,
            "n_prompt": n_p,
            "n_gen": n_g,
            "avg_ts": round(statistics.mean(ts), 2),
            "stddev_ts": round(statistics.stdev(ts) if len(ts) > 1 else 0.0, 2),
            "samples_ts": [round(t, 2) for t in ts],
        })
        rows.append(row)
    return rows


_MD_COLS = ["model_filename", "model_type", "backend", "test", "t/s"]


def _fmt_md(rows: list[dict]) -> str:
    lines = ["| model | type | backend | test | t/s |",
             "| --- | --- | --- | --- | --- |"]
    for r in rows:
        ts = f"{r['avg_ts']} ± {r['stddev_ts']}"
        lines.append(f"| {r['model_filename']} | {r['model_type']} | "
                     f"{r['backend']} | {r['test']} | {ts} |")
    return "\n".join(lines)


def _fmt_csv(rows: list[dict]) -> str:
    import csv
    import io

    keys = [k for k in rows[0] if k != "samples_ts"]
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=keys, extrasaction="ignore")
    w.writeheader()
    for r in rows:
        w.writerow(r)
    return buf.getvalue().rstrip("\n")


def _fmt_sql(rows: list[dict]) -> str:
    keys = [k for k in rows[0] if k != "samples_ts"]
    out = [
        "CREATE TABLE IF NOT EXISTS llama_bench (" +
        ", ".join(f"{k} TEXT" for k in keys) + ");"
    ]
    for r in rows:
        vals = ", ".join(f"'{r[k]}'" for k in keys)
        out.append(f"INSERT INTO llama_bench ({', '.join(keys)}) "
                   f"VALUES ({vals});")
    return "\n".join(out)


def format_rows(rows: list[dict], fmt: str) -> str:
    if fmt == "md":
        return _fmt_md(rows)
    if fmt == "csv":
        return _fmt_csv(rows)
    if fmt == "json":
        return json.dumps(rows, indent=2)
    if fmt == "jsonl":
        return "\n".join(json.dumps(r) for r in rows)
    if fmt == "sql":
        return _fmt_sql(rows)
    raise ValueError(f"unknown output format {fmt!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("llama-bench (tpu)")
    ap.add_argument("-m", "--model", action="append", required=True,
                    help="GGUF model (repeatable)")
    ap.add_argument("-p", "--n-prompt", default="512",
                    help="comma list of prompt sizes (0 = skip pp tests)")
    ap.add_argument("-n", "--n-gen", default="128",
                    help="comma list of gen sizes (0 = skip tg tests)")
    ap.add_argument("-pg", default=None,
                    help="combined tests as pp,tg pairs e.g. 512,128")
    ap.add_argument("-r", "--repetitions", type=int, default=3)
    ap.add_argument("-c", "--ctx-size", type=int, default=None)
    ap.add_argument("-o", "--output",
                    choices=["md", "csv", "json", "jsonl", "sql"],
                    default="md")
    args = ap.parse_args(argv)

    from ..runtime.engine import Model

    tests: list[tuple[str, int, int]] = []
    for p in args.n_prompt.split(","):
        if int(p) > 0:
            tests.append(("pp", int(p), 0))
    for n in args.n_gen.split(","):
        if int(n) > 0:
            tests.append(("tg", 0, int(n)))
    if args.pg:
        pp, tg = (int(x) for x in args.pg.split(","))
        tests.append(("pp+tg", pp, tg))

    all_rows = []
    for mpath in args.model:
        model = Model(mpath)
        all_rows.extend(run_tests(model, tests, args.repetitions,
                                  n_ctx=args.ctx_size))
    print(format_rows(all_rows, args.output))
    return 0


if __name__ == "__main__":
    sys.exit(main())
