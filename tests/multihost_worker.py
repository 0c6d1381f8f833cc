"""Worker process for the multi-host (multi-controller) serving test.

Launched by tests/test_multihost.py as N coordinated JAX processes on one
machine (2 CPU devices each via xla_force_host_platform_device_count) — the
CI stand-in for real multi-host TPU serving, replacing the reference's
ggml-rpc layer-split (SURVEY.md §2.4) with a global SPMD mesh.

Usage: multihost_worker.py <coordinator> <num_procs> <rank> <gguf> <out>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, num_procs, rank, gguf, out_path = sys.argv[1:6]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from llama_cpp_test_tpu.parallel.mesh import init_distributed, make_mesh
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    init_distributed(coordinator, int(num_procs), int(rank))
    import numpy as np

    assert len(jax.devices()) == 2 * int(num_procs), \
        f"global devices: {len(jax.devices())}"

    mesh = make_mesh(dp=1, tp=len(jax.devices()))
    model = Model(gguf, mesh=mesh)
    ctx = Context(model, n_ctx=64, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    prompt = [3, 17, 42, 9]
    logits = ctx.prefill(s, prompt)
    toks = [int(np.argmax(logits))]
    for _ in range(5):
        logits = ctx.decode([s], [toks[-1]])[0]
        toks.append(int(np.argmax(logits)))
    np.save(out_path, np.asarray(toks + [len(jax.devices())], np.int64))
    print(f"rank {rank}: toks {toks}")


if __name__ == "__main__":
    main()
