"""Microbenchmark harness for qmatmul kernel candidates on real TPU.

Times decode-shape (M=8) dequant-matmuls over a Q4_K-like weight against the
HBM roofline. The axon TPU is behind a network tunnel, so per-dispatch
latency is ~0.5-1ms — every candidate therefore runs N_ITER times INSIDE one
jitted lax.scan (with an output->input dependency so XLA can't CSE the
iterations away) and the dispatch cost amortizes to noise. Weights are
loop-invariant but larger than VMEM, so each iteration re-streams them from
HBM — exactly the serving decode access pattern.

Run on the TPU chip: python tools/kbench.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HBM_BW = 819e9  # v5e bytes/s
N_ITER = 64

# Logical op: y[M,N] = x[M,K] @ w[K,N], w = s[g(k),n]*q[k,n], group=32 on K.
M, K, N = 8, 2048, 11264  # fused gate+up of tinyllama-ish
GROUP = 32


def time_device(step, x, iters=N_ITER):
    """step: x -> y. Runs `iters` chained invocations in ONE dispatch."""

    @jax.jit
    def loop(x0):
        def body(carry, _):
            y = step(carry)
            # fold a scalar of y back into x: dependency chain, no CSE
            return carry + (y.ravel()[0] * 0).astype(carry.dtype), ()

        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out

    loop(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    loop(x).block_until_ready()
    return (time.perf_counter() - t0) / iters


def report(name, dt, nbytes):
    gbs = nbytes / dt / 1e9
    print(f"{name:44s} {dt*1e6:9.1f} us  {gbs:7.1f} GB/s  "
          f"({100*gbs*1e9/HBM_BW:5.1f}% of roofline)", flush=True)


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    q = rng.integers(0, 16, size=(K, N), dtype=np.uint8)
    s = rng.standard_normal((K // GROUP, N)).astype(np.float32) * 0.01
    return x, q, s


# --- repo: the shipped qmm kernel on a Q4_K-shaped QTensor (with min planes)
def build_repo_qmm():
    sys.path.insert(0, "/root/repo")
    from llama_cpp_test_tpu.ops.qmatmul import qmm
    from llama_cpp_test_tpu.quant.repack import QTensor

    x, q, s = make_data()
    qn = np.asarray(q)  # [K, N] -> planes packed along N
    qs = (qn[:, : N // 2] | (qn[:, N // 2:] << 4)).astype(np.uint8)
    sgm = np.asarray(s).T.reshape(2, N // 2, K // GROUP).transpose(0, 2, 1)
    mgm = (sgm * 0.1).astype(np.float32)
    qt = QTensor("u4", (N, K), N, GROUP, jnp.asarray(qs),
                 jnp.asarray(sgm, jnp.bfloat16),
                 jnp.asarray(mgm, jnp.bfloat16), None)
    nbytes = qs.size + sgm.size * 2 * 2
    return (lambda xx: qmm(xx, qt)), x, nbytes


def build_repo_qmm_nomin():
    sys.path.insert(0, "/root/repo")
    from llama_cpp_test_tpu.ops.qmatmul import qmm
    from llama_cpp_test_tpu.quant.repack import QTensor

    x, q, s = make_data()
    qn = np.asarray(q)
    qs = (qn[:, : N // 2] | (qn[:, N // 2:] << 4)).astype(np.uint8)
    sgm = np.asarray(s).T.reshape(2, N // 2, K // GROUP).transpose(0, 2, 1)
    qt = QTensor("u4", (N, K), N, GROUP, jnp.asarray(qs),
                 jnp.asarray(sgm, jnp.bfloat16), None, None)
    nbytes = qs.size + sgm.size * 2
    return (lambda xx: qmm(xx, qt)), x, nbytes


# --- F: lean u4 kernel — no f32 intermediate, 3D sublane-broadcast scale
def kernel_f(x_ref, qs_ref, s_ref, o_ref):
    kk = pl.program_id(2)
    x = x_ref[...]
    qs32 = qs_ref[...].astype(jnp.int32)
    tk, tnp = qs_ref.shape
    tg = tk // GROUP
    accs = []
    for h in range(2):
        qh = (qs32 & 0xF) if h == 0 else (qs32 >> 4)
        qf = qh.astype(jnp.bfloat16).reshape(tg, GROUP, tnp)
        w = (qf * s_ref[h][:, None, :]).reshape(tk, tnp)
        accs.append(jnp.dot(x, w, preferred_element_type=jnp.float32))
    upd = jnp.stack(accs, axis=1)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = upd

    @pl.when(kk != 0)
    def _():
        o_ref[...] = o_ref[...] + upd


def build_f(tile_n=256, tile_k=2048):
    x, q, s = make_data()
    qn = np.asarray(q)
    qs = jnp.asarray((qn[:, : N // 2] | (qn[:, N // 2:] << 4)).astype(np.uint8))
    sgm = jnp.asarray(
        np.asarray(s).T.reshape(2, N // 2, K // GROUP).transpose(0, 2, 1),
        jnp.bfloat16)
    npk = N // 2
    tg = tile_k // GROUP
    grid = (1, npk // tile_n, K // tile_k)
    f = pl.pallas_call(
        kernel_f,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, tile_k), lambda mm, n, kk: (mm, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda mm, n, kk: (kk, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tg, tile_n), lambda mm, n, kk: (0, kk, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, 2, tile_n), lambda mm, n, kk: (mm, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 2, npk), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=qs.size + sgm.size * 2,
            transcendentals=0),
    )
    return (lambda xx: f(xx, qs, sgm)), x, qs.size + sgm.size * 2


# --- G: native int4 dtype — Mosaic unpacks, cast to bf16 in kernel
def kernel_g(x_ref, qs_ref, s_ref, o_ref):
    kk = pl.program_id(2)
    x = x_ref[...]
    tk, tn = qs_ref.shape
    tg = tk // GROUP
    qf = qs_ref[...].astype(jnp.bfloat16).reshape(tg, GROUP, tn)
    w = (qf * s_ref[...][:, None, :]).reshape(tk, tn)
    upd = jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = upd

    @pl.when(kk != 0)
    def _():
        o_ref[...] = o_ref[...] + upd


def build_g(tile_n=512, tile_k=2048):
    x, q, s = make_data()
    qs = jnp.asarray(np.asarray(q, np.int8) - 8, jnp.int4)  # [K, N]
    sg = jnp.asarray(np.asarray(s), jnp.bfloat16)           # [G, N]
    tg = tile_k // GROUP
    grid = (1, N // tile_n, K // tile_k)
    f = pl.pallas_call(
        kernel_g,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, tile_k), lambda mm, n, kk: (mm, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda mm, n, kk: (kk, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, tile_n), lambda mm, n, kk: (kk, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tile_n), lambda mm, n, kk: (mm, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=K * N // 2 + sg.size * 2,
            transcendentals=0),
    )
    return (lambda xx: f(xx, qs, sg)), x, K * N // 2 + sg.size * 2


# --- H: int8 weight plane (Q8_0-like), direct int8->bf16
def kernel_h(x_ref, qs_ref, s_ref, o_ref):
    kk = pl.program_id(2)
    x = x_ref[...]
    tk, tn = qs_ref.shape
    tg = tk // GROUP
    qf = qs_ref[...].astype(jnp.bfloat16).reshape(tg, GROUP, tn)
    w = (qf * s_ref[...][:, None, :]).reshape(tk, tn)
    upd = jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(kk == 0)
    def _():
        o_ref[...] = upd

    @pl.when(kk != 0)
    def _():
        o_ref[...] = o_ref[...] + upd


def build_h(tile_n=256, tile_k=2048):
    x, q, s = make_data()
    qs = jnp.asarray(np.asarray(q, np.int8))  # [K, N] int8
    sg = jnp.asarray(np.asarray(s), jnp.bfloat16)
    tg = tile_k // GROUP
    grid = (1, N // tile_n, K // tile_k)
    f = pl.pallas_call(
        kernel_h,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, tile_k), lambda mm, n, kk: (mm, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda mm, n, kk: (kk, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, tile_n), lambda mm, n, kk: (kk, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tile_n), lambda mm, n, kk: (mm, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=qs.size + sg.size * 2,
            transcendentals=0),
    )
    return (lambda xx: f(xx, qs, sg)), x, qs.size + sg.size * 2


# --- C: dense bf16 matvec (XLA) — 2 bytes/weight bandwidth reference
def build_c():
    x, q, s = make_data()
    w = jnp.asarray(np.asarray(q, np.float32), jnp.bfloat16).reshape(K, N)
    return (lambda xx: jnp.dot(xx, w, preferred_element_type=jnp.float32)), \
        x, w.size * 2


# --- E: raw HBM streaming upper bound (pallas reduce over bytes)
def build_e():
    nb = K * N // 2 + (K // GROUP) * N * 2
    rows = nb // 1024
    a = jnp.zeros((rows, 1024), jnp.uint8)
    tile = 512

    def kern(x_ref, a_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jnp.sum(a_ref[...].astype(jnp.float32), axis=0,
                              keepdims=True)[:, :128] + x_ref[0, 0]

    f = pl.pallas_call(
        kern,
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1024), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )
    x0 = jnp.zeros((1, 128), jnp.float32)
    return (lambda xx: f(xx, a)), x0, a.size


def main():
    print(f"shape: M={M} K={K} N={N} group={GROUP}  ({N_ITER} iters/dispatch)")
    for name, builder in [
        ("E: raw HBM stream (upper bound)", build_e),
        ("C: dense bf16 matvec (XLA)", build_c),
        ("repo: qmm u4+min (Q4_K planes)", build_repo_qmm),
        ("repo: qmm u4 no-min (Q4_0 planes)", build_repo_qmm_nomin),
        ("F: lean u4 (no f32 mid, 3D scale bcast)", build_f),
        ("G: native int4 dtype", build_g),
        ("H: int8 plane, direct int8->bf16", build_h),
    ]:
        try:
            f, x, nbytes = builder()
            dt = time_device(f, x)
            report(name, dt, nbytes)
        except Exception as e:
            print(f"{name:44s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}", flush=True)


if __name__ == "__main__":
    main()
