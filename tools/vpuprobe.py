"""Is the decode qmm kernel VPU-dequant-bound? (v5e, tunneled)

callfloor.py showed a single 4096->16384 Q4_K call at 514 GB/s vs 747 for
the dense chain — too big a gap for the ~10us call floor. Per-tile budget
at tile_m=8: DMA ~2.3us (2MB qs), MXU ~2.2us (2 x [8,2048]x[2048,1024]
dots), VPU unpack ~5-20us (4M elems x ~5 elementwise ops). If the VPU is
the limiter, an int8 plane (no nibble unpack: 1 convert + 1 mul per elem)
should run near the dense rate per byte, while u4 stays at ~60%.

Rows (all 4096 -> 16384, one call, min-of-5 x 64-iter scans):
  q4k   — u4 + scale + min (the shipped Q4_K path)
  q40   — u4 + scale only (drops the min/bsum dots)
  int8  — int8 + scale (drops the nibble unpack)
  dense — bf16 (the DMA roofline control)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llama_cpp_test_tpu.ops.qmatmul import qmm
from llama_cpp_test_tpu.quant.repack import QTensor
from tools.dbench import mk_q4k, mk_q40, _rtt
from tools.callfloor import time_scan

C = 4096
N = 4 * C
GROUP = 32


def mk_int8(n, k, rng):
    qs = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
    sc = jnp.asarray(rng.standard_normal((1, k // GROUP, n)) * 0.01,
                     jnp.bfloat16)
    qt = QTensor("int8", (n, k), n, GROUP, qs, sc, None, None)
    return qt, qs.size + sc.size * 2


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((8, C)), jnp.bfloat16)

    rows = []
    qt, nb = mk_q4k(N, C, rng)
    rows.append(("q4k  ", qt, nb))
    qt, nb = mk_q40(N, C, rng)
    rows.append(("q40  ", qt, nb))
    qt, nb = mk_int8(N, C, rng)
    rows.append(("int8 ", qt, nb))

    for name, qt, nb in rows:
        def step(x, ws):
            return qmm(x, ws[0])[:, :C].astype(jnp.bfloat16)
        dt = time_scan(step, x0, (qt,))
        print(f"{name}: {dt*1e3:7.3f} ms  {nb/1e6:6.1f} MB  "
              f"{nb/dt/1e9:6.1f} GB/s", flush=True)

    w = jnp.asarray(rng.standard_normal((C, N)), jnp.bfloat16)

    def dstep(x, ws):
        return jnp.dot(x, ws[0], preferred_element_type=jnp.float32)[:, :C] \
            .astype(jnp.bfloat16)

    dt = time_scan(dstep, x0, (w,))
    nb = w.size * 2
    print(f"dense: {dt*1e3:7.3f} ms  {nb/1e6:6.1f} MB  "
          f"{nb/dt/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
