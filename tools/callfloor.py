"""Per-Pallas-call fixed-cost probe (v5e, tunneled).

The 8B decode qmm chain runs at ~600 GB/s vs the 865 GB/s measured dense
ceiling. Hypothesis (round 5): the gap is per-call floors (call setup +
pipeline ramp/tail), not in-kernel inefficiency. Direct test: stream the
SAME total bytes through (a) four sequential 4096->4096 Q4_K qmm calls vs
(b) one 4096->16384 call. The time difference is three call floors.

Variants isolate: chained (data-dependent) vs independent calls, the XLA
slice/convert glue between calls, and dense (non-quantized) calls as the
pallas-generic control. min-of-5 timed loops (single-run spread on the
tunnel measured up to 40%).

Usage (on the TPU host): python tools/callfloor.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llama_cpp_test_tpu.ops.qmatmul import qmm
from tools.dbench import mk_q4k, _rtt

N_ITER = 64
C = 4096


def time_scan(step, x0, ws, reps=5):
    @jax.jit
    def loop(x, w):
        return jax.lax.scan(lambda c, _: (step(c, w), ()), x, None,
                            length=N_ITER)[0]

    t0 = time.time()
    np.asarray(loop(x0, ws))
    print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(x0, ws))
        best = min(best, time.perf_counter() - t0)
    return (best - _rtt()) / N_ITER


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((8, C)), jnp.bfloat16)

    qts4, nbytes4 = [], 0
    for _ in range(4):
        qt, nb = mk_q4k(C, C, rng)
        qts4.append(qt)
        nbytes4 += nb
    qt1, nbytes1 = mk_q4k(4 * C, C, rng)

    # (a) four sequential data-dependent calls (glue: slice + bf16 cast)
    def step4(x, ws):
        for qt in ws:
            x = qmm(x, qt)[:, :C].astype(jnp.bfloat16)
        return x

    # (b) four INDEPENDENT calls on the same x (no inter-call glue dep)
    def step4i(x, ws):
        acc = 0.0
        for qt in ws:
            acc = acc + qmm(x, qt)[:, :C]
        return (x + acc * 1e-9).astype(jnp.bfloat16)

    # (c) one call, 4x the columns
    def step1(x, ws):
        return qmm(x, ws[0])[:, :C].astype(jnp.bfloat16)

    rows = [("4 chained", step4, qts4, nbytes4),
            ("4 indep  ", step4i, qts4, nbytes4),
            ("1 call   ", step1, (qt1,), nbytes1)]
    res = {}
    for name, step, ws, nb in rows:
        dt = time_scan(step, x0, ws)
        res[name] = dt
        print(f"{name}: {dt*1e3:7.3f} ms  {nb/dt/1e9:6.1f} GB/s", flush=True)
    print(f"per-call floor (chained) ~= "
          f"{(res['4 chained']-res['1 call   '])/3*1e6:6.1f} us")
    print(f"per-call floor (indep)   ~= "
          f"{(res['4 indep  ']-res['1 call   '])/3*1e6:6.1f} us")

    # dense control: same shapes through plain XLA dot (no pallas)
    w4 = [jnp.asarray(rng.standard_normal((C, C)), jnp.bfloat16)
          for _ in range(4)]
    w1 = jnp.asarray(rng.standard_normal((C, 4 * C)), jnp.bfloat16)

    def d4(x, ws):
        for w in ws:
            x = jnp.dot(x, w, preferred_element_type=jnp.float32) \
                .astype(jnp.bfloat16)
        return x

    def d1(x, ws):
        return jnp.dot(x, ws[0], preferred_element_type=jnp.float32)[:, :C] \
            .astype(jnp.bfloat16)

    dt4 = time_scan(d4, x0, w4)
    dt1 = time_scan(d1, x0, (w1,))
    nb4, nb1 = 4 * C * C * 2, C * 4 * C * 2
    print(f"dense 4 chained: {dt4*1e3:7.3f} ms  {nb4/dt4/1e9:6.1f} GB/s")
    print(f"dense 1 call   : {dt1*1e3:7.3f} ms  {nb1/dt1/1e9:6.1f} GB/s")
    print(f"dense per-op floor ~= {(dt4-dt1)/3*1e6:6.1f} us")


if __name__ == "__main__":
    main()
