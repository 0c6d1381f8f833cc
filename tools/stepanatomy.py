"""8B decode-step anatomy on real TPU: where do the ~3ms of non-qmm go?

Runs the ENGINE's real decode_greedy_loop on the synthesized Llama-3-8B
Q4_K model (bench.py's north-star config) in three modes:

  full       — unmodified engine step (the e2e baseline)
  noqmm      — qmm/qmm_split mocked to broadcast-zeros: step time =
               attention + KV writes + rope/norm/residual glue + argmax
  barebones  — additionally mocks attend_decode + write_kv: step time =
               pure XLA glue (norms/rope/residual/reshapes/argmax/scan)

Each mode is ONE process run (module-jit caches key on function identity,
so mocks must be installed before the first trace):

    python tools/stepanatomy.py full|noqmm|barebones

Decomposition: qmm = full - noqmm; attention+scatter = noqmm - barebones;
glue = barebones.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "full"


def install_mocks():
    import jax

    from llama_cpp_test_tpu.models import llama as llama_mod
    from llama_cpp_test_tpu.runtime import kv_cache

    if MODE in ("full", "prefill"):
        return
    if MODE == "prefill_noattn":
        def mock_attend_prefill(q, k_pool, v_pool, block_table, positions,
                                kv_len, scale, window=0, soft_cap=0.0,
                                alibi=None):
            v = (jnp.sum(k_pool[0, 0, 0]) * 0 + 1e-30).astype(q.dtype)
            return q * v

        kv_cache.attend_prefill = mock_attend_prefill
        return
    if MODE == "prefill_noqmm":
        def mock_qmm(x, qt, out_dtype=jnp.float32, **kw):
            v = (jnp.sum(x).astype(jnp.float32) * 1e-30)
            return jnp.broadcast_to(v, (*x.shape[:-1], qt.n_orig)) \
                .astype(out_dtype)

        def mock_qmm_split(x, qt, out_dtype=jnp.float32, **kw):
            v = (jnp.sum(x).astype(jnp.float32) * 1e-30)
            return [jnp.broadcast_to(v, (*x.shape[:-1], n)).astype(out_dtype)
                    for (_npk, n) in qt.parts]

        llama_mod.qmm = mock_qmm
        llama_mod.qmm_split = mock_qmm_split
        return

    def mock_qmm(x, qt, out_dtype=jnp.float32, **kw):
        v = (jnp.sum(x).astype(jnp.float32) * 1e-30)
        return jnp.broadcast_to(v, (*x.shape[:-1], qt.n_orig)) \
            .astype(out_dtype)

    def mock_qmm_split(x, qt, out_dtype=jnp.float32, **kw):
        v = (jnp.sum(x).astype(jnp.float32) * 1e-30)
        return [jnp.broadcast_to(v, (*x.shape[:-1], n)).astype(out_dtype)
                for (_npk, n) in qt.parts]

    llama_mod.qmm = mock_qmm
    llama_mod.qmm_split = mock_qmm_split
    if MODE == "barebones":
        real_write = kv_cache.write_kv

        def mock_attend(q, k_pool, v_pool, block_table, kv_len, scale,
                        window=0, softcap=0.0):
            v = (jnp.sum(k_pool[0, 0, 0]) * 0 + 1e-30).astype(q.dtype)
            return q * v

        def mock_write(pool, new, slots):
            return pool

        kv_cache.attend_decode = mock_attend
        kv_cache.write_kv = mock_write


def main():
    install_mocks()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as bench_mod

    if not os.path.exists(bench_mod.L3_8B_CACHE):
        from llama_cpp_test_tpu.quant import codecs

        t0 = time.time()
        codecs.set_refine_iters(0)
        try:
            bench_mod.build_8b_model(bench_mod.L3_8B_CACHE)
        finally:
            codecs.set_refine_iters(2)
        print(f"# built 8B model in {time.time()-t0:.1f}s", flush=True)

    from llama_cpp_test_tpu.runtime.engine import Context, Model

    t0 = time.time()
    model = Model(bench_mod.L3_8B_CACHE)
    print(f"# load+repack {time.time()-t0:.1f}s", flush=True)
    ctx = Context(model, n_ctx=1024, n_seq_max=4, block_size=32)
    rng = np.random.default_rng(0)
    if MODE.startswith("prefill"):
        # pp512 anatomy: time whole-prompt prefills on fresh sequences
        prompt = list(rng.integers(1, 100000, 512))
        s0 = ctx.new_seq()
        np.asarray(ctx.prefill(s0, prompt))   # compile
        ctx.free_seq(s0)
        best = float("inf")
        for _ in range(4):
            si = ctx.new_seq()
            t0 = time.time()
            np.asarray(ctx.prefill(si, prompt))
            best = min(best, time.time() - t0)
            ctx.free_seq(si)
        print(f"{MODE}: {best*1e3:.1f} ms / 512 tok "
              f"({512/best:.1f} tok/s)", flush=True)
        return
    s = ctx.new_seq()
    lg = ctx.prefill(s, list(rng.integers(1, 100000, 512)))
    tok = int(np.argmax(lg))
    t0 = time.time()
    ctx.decode_greedy_loop(s, tok, 64)  # compile
    print(f"# window compile+first {time.time()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        ctx.decode_greedy_loop(s, tok, 64)
        best = min(best, time.time() - t0)
    print(f"{MODE}: {best/64*1e3:.3f} ms/step ({64/best:.1f} tok/s)",
          flush=True)


if __name__ == "__main__":
    main()
