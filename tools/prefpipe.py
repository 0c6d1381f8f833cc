"""Is the ~50ms prefill residual tunnel round-trip latency or device time?

A single Context.prefill() call pays dispatch RTT (~25-30ms) + the
[128k] f32 logits download (~11ms) INSIDE its wall-clock, because it
ends with a synchronous np.asarray. Pipelined serving doesn't: N
prefills dispatched back-to-back overlap their round trips with device
compute. This probe measures both:

  sync      — min-of-N of the normal synced prefill (what stepanatomy
              and bench's latency view report)
  pipelined — dispatch NPIPE prefills on distinct sequences with the
              result sync deferred (np.asarray patched to pass jax
              arrays through), then one final sync; marginal
              ms/prefill = total / NPIPE

If marginal << sync, the residual is the LINK, not the device, and the
throughput-honest pp512 number is the pipelined one.

    python tools/prefpipe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    import bench as bench_mod
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    if not os.path.exists(bench_mod.L3_8B_CACHE):
        from llama_cpp_test_tpu.quant import codecs
        codecs.set_refine_iters(0)
        try:
            bench_mod.build_8b_model(bench_mod.L3_8B_CACHE)
        finally:
            codecs.set_refine_iters(2)

    t0 = time.time()
    model = Model(bench_mod.L3_8B_CACHE)
    print(f"# load+repack {time.time()-t0:.1f}s", flush=True)
    NPIPE = 4
    ctx = Context(model, n_ctx=1024, n_seq_max=NPIPE + 1, block_size=32)
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(1, 100000, 512))

    s0 = ctx.new_seq()
    np.asarray(ctx.prefill(s0, prompt))  # compile
    ctx.free_seq(s0)

    best = float("inf")
    for _ in range(4):
        si = ctx.new_seq()
        t0 = time.time()
        np.asarray(ctx.prefill(si, prompt))
        best = min(best, time.time() - t0)
        ctx.free_seq(si)
    print(f"sync:      {best*1e3:.1f} ms/prefill ({512/best:.1f} tok/s)",
          flush=True)

    # defer the result download: let engine-internal np.asarray pass jax
    # arrays through untouched (host-side arrays still convert normally)
    orig_asarray = np.asarray

    def lazy_asarray(a, *args, **kw):
        if isinstance(a, jax.Array):
            return a
        return orig_asarray(a, *args, **kw)

    best_pipe = float("inf")
    for _ in range(3):
        seqs = [ctx.new_seq() for _ in range(NPIPE)]
        np.asarray = lazy_asarray
        try:
            t0 = time.time()
            outs = [ctx.prefill(si, prompt) for si in seqs]
            outs = [orig_asarray(o) for o in outs]
            dt = time.time() - t0
        finally:
            np.asarray = orig_asarray
        best_pipe = min(best_pipe, dt / NPIPE)
        for si in seqs:
            ctx.free_seq(si)
    print(f"pipelined: {best_pipe*1e3:.1f} ms/prefill "
          f"({512/best_pipe:.1f} tok/s) [{NPIPE} in flight]", flush=True)
    print(f"link share of sync latency: {(best-best_pipe)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
