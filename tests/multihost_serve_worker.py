"""Worker for the multi-host SERVING test: rank 0 drives a Scheduler over a
DriverContext (broadcasting engine calls), rank 1+ replay them via
follower_loop — the full llama-server multi-host wiring minus HTTP.

Usage: multihost_serve_worker.py <coordinator> <num_procs> <rank> <gguf> <out>
Writes rank 0's generated tokens (per request, concatenated with -1
separators) plus tokens/s to <out>.npy; followers write [0].
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, num_procs, rank, gguf, out_path = sys.argv[1:6]
    num_procs, rank = int(num_procs), int(rank)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np

    from llama_cpp_test_tpu.parallel import driver as drv
    from llama_cpp_test_tpu.parallel.mesh import init_distributed, make_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    init_distributed(coordinator, num_procs, rank)
    mesh = make_mesh(dp=1, tp=len(jax.devices()))
    model = Model(gguf, mesh=mesh)
    port = drv.command_port(coordinator)
    host0 = coordinator.rsplit(":", 1)[0]

    if rank != 0:
        # Context init BEFORE connecting: init does collective device work
        # that rank 0 enters concurrently (see DriverContext docstring)
        ctx = Context(model, n_ctx=64, n_seq_max=4, block_size=8)
        drv.follower_loop(ctx, host0, port, timeout=120.0)
        np.save(out_path, np.asarray([0], np.int64))
        print(f"rank {rank}: follower done")
        return

    followers = []
    ctx = drv.DriverContext(model, n_ctx=64, n_seq_max=4, block_size=8,
                            followers=followers)
    if num_procs > 1:
        followers.extend(drv.serve_followers(port, num_procs - 1))
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams
    from llama_cpp_test_tpu.runtime.scheduler import GenRequest, Scheduler

    sched = Scheduler(ctx, n_slots=2, decode_window=4)
    # 2 requests on 2 slots with budget 16 >> window 4: the chained
    # double-buffered window path engages (asserted by the test — the
    # round-4 build silently fell back to synchronous windows here)
    reqs = [
        sched.submit(GenRequest([3 + i, 17, 42], max_tokens=16,
                                sampling=SamplerParams(temp=0.0),
                                ignore_eos=True))
        for i in range(2)
    ]
    t0 = time.time()
    sched.run()
    dt = time.time() - t0
    n_tok = sum(len(r.output_tokens) for r in reqs)
    out = []
    for r in reqs:
        out.extend(r.output_tokens)
        out.append(-1)
    out.append(int(sched.metrics()["windows_chained"]))
    out.append(int(round(n_tok / dt * 1000)))  # tok/s x1000, last element
    ctx.close()
    np.save(out_path, np.asarray(out, np.int64))
    print(f"rank 0: {n_tok} tokens in {dt:.2f}s ({n_tok/dt:.1f} tok/s)")


if __name__ == "__main__":
    main()
