"""Multi-host (multi-controller) serving: 2 JAX processes x 2 CPU devices
coordinate a global ('dp','tp') mesh via jax.distributed — the runtime the
reference covers with ggml-rpc + layer split (ggml-rpc.cpp:1151), rebuilt as
SPMD collectives over a global mesh. Asserts both ranks produce the same
greedy tokens as a single-process run."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from test_engine import make_tiny_gguf

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_distributed_decode(tmp_path):
    # tp=4 must divide n_head_kv -> widen the tiny model to 4 kv heads
    import test_engine

    path = str(tmp_path / "tiny_mh.gguf")
    old = dict(test_engine.HP)
    test_engine.HP = dict(old, n_head_kv=4, head_dim=32, n_embd=128,
                          n_ff=128)
    try:
        make_tiny_gguf(path)
    finally:
        test_engine.HP = old
    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"rank{r}.npy") for r in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             coord, "2", str(r), path, outs[r]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    r0 = np.load(outs[0])
    r1 = np.load(outs[1])
    assert r0[-1] == 4, "expected 4 global devices"
    np.testing.assert_array_equal(r0, r1)

    # single-process reference (in-process, already on the 8-dev CPU mesh)
    from llama_cpp_test_tpu.runtime.engine import Context, Model

    model = Model(path)
    ctx = Context(model, n_ctx=64, n_seq_max=2, block_size=8)
    s = ctx.new_seq()
    logits = ctx.prefill(s, [3, 17, 42, 9])
    toks = [int(np.argmax(logits))]
    for _ in range(5):
        logits = ctx.decode([s], [toks[-1]])[0]
        toks.append(int(np.argmax(logits)))
    np.testing.assert_array_equal(r0[:-1], np.asarray(toks))


def _run_serve_workers(tmp_path, path, num_procs):
    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"srank{num_procs}_{r}.npy")
            for r in range(num_procs)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_serve_worker.py"),
             coord, str(num_procs), str(r), path, outs[r]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(num_procs)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"serve worker failed:\n{log[-3000:]}"
    return np.load(outs[0])


@pytest.mark.timeout(1200)
def test_two_process_distributed_serving(tmp_path):
    """Full serving stack across 2 coordinated processes: rank 0 runs the
    Scheduler over a DriverContext, rank 1 replays via follower_loop
    (parallel/driver.py — the ggml-rpc serve analogue). Output must match
    a single-process (num_procs=1, no followers) run of the same
    scheduler workload; the tok/s of both runs gives the scaling ratio."""
    import test_engine

    path = str(tmp_path / "tiny_mhs.gguf")
    old = dict(test_engine.HP)
    test_engine.HP = dict(old, n_head_kv=4, head_dim=32, n_embd=128,
                          n_ff=128)
    try:
        make_tiny_gguf(path)
    finally:
        test_engine.HP = old
    r1 = _run_serve_workers(tmp_path, path, 1)
    r2 = _run_serve_workers(tmp_path, path, 2)
    # same tokens (everything before the trailing chained-count + tok/s)
    np.testing.assert_array_equal(r1[:-2], r2[:-2])
    # the chained double-buffered window path must ENGAGE on the
    # multi-host DriverContext (round 4 silently fell back to sync
    # windows, losing the scheduler-overlap win exactly where the
    # multi-host scaling target applies)
    assert r2[-2] >= 1, f"windows_chained={r2[-2]} on 2-proc serving"
    assert r1[-2] >= 1, f"windows_chained={r1[-2]} on 1-proc serving"
    tok_s_1 = r1[-1] / 1000.0
    tok_s_2 = r2[-1] / 1000.0
    print(f"serving tok/s: 1-proc {tok_s_1:.1f}, 2-proc {tok_s_2:.1f}, "
          f"ratio {tok_s_2 / max(tok_s_1, 1e-9):.2f} "
          f"(chained windows: {r1[-2]}/{r2[-2]})")
