"""Microbenchmark harness for qmatmul kernel candidates on real TPU.

Times a single dequant-matmul of decode shape (M=8) over a Q4_K-like weight
(K x N) against the HBM roofline, for several kernel designs. Run on the TPU
chip: python tools/kbench.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HBM_BW = 819e9  # v5e bytes/s


def timeit(fn, *args, iters=50):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(name, dt, nbytes):
    gbs = nbytes / dt / 1e9
    print(f"{name:40s} {dt*1e6:9.1f} us  {gbs:7.1f} GB/s  "
          f"({100*gbs*1e9/HBM_BW:5.1f}% of roofline)")


# ---------------------------------------------------------------------------
# candidate kernels. Logical op: y[M,N] = x[M,K] @ w[K,N],
# w = s[g(k),n] * q[k,n] with group=32 along K.

M, K, N = 8, 2048, 11264  # fused gate+up of tinyllama-ish
GROUP = 32


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    q = rng.integers(0, 16, size=(K, N), dtype=np.uint8)
    s = rng.standard_normal((K // GROUP, N)).astype(np.float32) * 0.01
    return x, q, s


# --- A: kmajor, u4 packed along N (plane [K, N/2]), bf16 scales,
#        sublane-broadcast scale expansion, bf16 MXU
def kernel_a(x_ref, qs_ref, s_ref, o_ref, *, nsteps):
    kk = pl.program_id(1)
    x = x_ref[:]
    qs = qs_ref[:]
    s = s_ref[:]  # [tg, 2, tn] bf16  (2 = lo/hi plane scales)
    tk, tn = qs.shape
    tg = tk // GROUP
    lo = (qs & 0xF).astype(jnp.int8)
    hi = (qs >> 4).astype(jnp.int8)
    s_lo = jax.lax.broadcast_in_dim(s[:, 0, :], (tg, GROUP, tn), (0, 2))
    s_lo = s_lo.reshape(tk, tn)
    s_hi = jax.lax.broadcast_in_dim(s[:, 1, :], (tg, GROUP, tn), (0, 2))
    s_hi = s_hi.reshape(tk, tn)
    w_lo = lo.astype(jnp.bfloat16) * s_lo
    w_hi = hi.astype(jnp.bfloat16) * s_hi
    acc_lo = jnp.dot(x, w_lo, preferred_element_type=jnp.float32)
    acc_hi = jnp.dot(x, w_hi, preferred_element_type=jnp.float32)
    upd = jnp.concatenate([acc_lo, acc_hi], axis=1)

    @pl.when(kk == 0)
    def _():
        o_ref[:] = upd

    @pl.when(kk != 0)
    def _():
        o_ref[:] = o_ref[:] + upd


def build_a(tile_n=256, tile_k=2048):
    x, q, s = make_data()
    # pack: byte[k, j] = q[k, j] | q[k, j + N/2] << 4
    qs = np.asarray(q[:, : N // 2] | (q[:, N // 2:] << 4), np.uint8)
    # scales [K/G, 2, N/2] bf16: [:,0,:] for lo cols, [:,1,:] for hi cols
    s2 = np.stack([np.asarray(s)[:, : N // 2], np.asarray(s)[:, N // 2:]],
                  axis=1)
    qs = jnp.asarray(qs)
    s2 = jnp.asarray(s2, jnp.bfloat16)
    nh = N // 2
    grid = (nh // tile_n, K // tile_k)
    tg = tile_k // GROUP

    f = pl.pallas_call(
        functools.partial(kernel_a, nsteps=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, tile_k), lambda n, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda n, kk: (kk, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, 2, tile_n), lambda n, kk: (kk, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, 2 * tile_n), lambda n, kk: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=qs.size + s2.size * 2 + M * K * 2 + M * N * 4,
            transcendentals=0),
    )
    fj = jax.jit(lambda xx: f(xx, qs, s2))
    nbytes = qs.size + s2.size * 2
    return fj, x, nbytes


# --- B: same layout, int8 MXU with per-group partials via reshaped batched dot
def kernel_b(x_ref, qs_ref, s_ref, o_ref):
    kk = pl.program_id(1)
    x = x_ref[:]          # [M, tk] bf16
    qs = qs_ref[:]
    s = s_ref[:]          # [tg, 2, tn] f32
    tk, tn = qs.shape
    tg = tk // GROUP
    lo = (qs & 0xF).astype(jnp.bfloat16)
    hi = (qs >> 4).astype(jnp.bfloat16)
    # per-group partial sums: batched dot over tg groups
    xg = x.reshape(M, tg, GROUP).swapaxes(0, 1)      # [tg, M, GROUP]
    lg = lo.reshape(tg, GROUP, tn)
    hg = hi.reshape(tg, GROUP, tn)
    p_lo = jax.lax.dot_general(
        xg, lg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # [tg, M, tn]
    p_hi = jax.lax.dot_general(
        xg, hg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    acc_lo = jnp.sum(p_lo * s[:, 0, :][:, None, :], axis=0)
    acc_hi = jnp.sum(p_hi * s[:, 1, :][:, None, :], axis=0)
    upd = jnp.concatenate([acc_lo, acc_hi], axis=1)

    @pl.when(kk == 0)
    def _():
        o_ref[:] = upd

    @pl.when(kk != 0)
    def _():
        o_ref[:] = o_ref[:] + upd


def build_b(tile_n=256, tile_k=2048):
    x, q, s = make_data()
    qs = np.asarray(q[:, : N // 2] | (q[:, N // 2:] << 4), np.uint8)
    s2 = np.stack([np.asarray(s)[:, : N // 2], np.asarray(s)[:, N // 2:]],
                  axis=1)
    qs = jnp.asarray(qs)
    s2 = jnp.asarray(s2, jnp.float32)
    nh = N // 2
    grid = (nh // tile_n, K // tile_k)
    tg = tile_k // GROUP
    f = pl.pallas_call(
        kernel_b,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, tile_k), lambda n, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda n, kk: (kk, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, 2, tile_n), lambda n, kk: (kk, 0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, 2 * tile_n), lambda n, kk: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=qs.size + s2.size * 4 + M * K * 2 + M * N * 4,
            transcendentals=0),
    )
    fj = jax.jit(lambda xx: f(xx, qs, s2))
    nbytes = qs.size + s2.size * 4
    return fj, x, nbytes


# --- C: dense bf16 matvec (what XLA does, 2 bytes/wt) — BW reference point
def build_c():
    x, q, s = make_data()
    w = jnp.asarray(np.asarray(q, np.float32), jnp.bfloat16).reshape(K, N)
    f = jax.jit(lambda xx: jnp.dot(xx, w, preferred_element_type=jnp.float32))
    return f, x, w.size * 2


# --- D: current repo kernel (nmajor, ematmul expansion, f32 scales)
def build_d():
    import sys
    sys.path.insert(0, "/root/repo")
    from llama_cpp_test_tpu.ops.qmatmul import qmm
    from llama_cpp_test_tpu.quant.repack import QTensor
    x, q, s = make_data()
    # build a QTensor in the current layout: qs [N/2, K] u8 packed along N
    qn = np.asarray(q).T  # [N, K]
    qs = (qn[: N // 2] | (qn[N // 2:] << 4)).astype(np.uint8)
    srow = np.asarray(s).T.astype(np.float32)  # [N, G]
    sgm = srow.reshape(2, N // 2, K // GROUP).transpose(0, 2, 1)
    qt = QTensor("u4", (N, K), N, GROUP, jnp.asarray(qs),
                 jnp.asarray(sgm), None, None)
    f = jax.jit(lambda xx: qmm(xx, qt))
    return f, x, qs.size + sgm.size * 4


# --- E: pure HBM read benchmark (upper bound)
def build_e():
    nb = K * N // 2 + (K // GROUP) * N * 2
    a = jnp.zeros((nb // 1024, 1024), jnp.uint8)

    def k(a_ref, o_ref):
        o_ref[0, 0] = jnp.sum(a_ref[:].astype(jnp.int32))

    tile = 512
    f = pl.pallas_call(
        lambda a_ref, o_ref: k(a_ref, o_ref),
        grid=(a.shape[0] // tile,),
        in_specs=[pl.BlockSpec((tile, 1024), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )
    fj = jax.jit(lambda: f(a))
    return (lambda _: fj()), jnp.zeros(()), a.size


def main():
    print(f"shape: M={M} K={K} N={N} group={GROUP}")
    for name, builder in [
        ("E: raw HBM read", build_e),
        ("C: dense bf16 matvec (XLA)", build_c),
        ("A: kmajor u4+bf16 scales, bf16 MXU", build_a),
        ("B: kmajor u4, per-group batched dot", build_b),
        ("D: current repo qmm (ematmul)", build_d),
    ]:
        try:
            f, x, nbytes = builder()
            dt = timeit(f, x)
            report(name, dt, nbytes)
        except Exception as e:
            print(f"{name:40s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
