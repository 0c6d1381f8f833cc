"""Compile every Pallas kernel against the REAL TPU toolchain.

tests/test_tpu_lowering.py lowers kernels to Mosaic MLIR on CPU — that
catches BlockSpec/tiling mistakes, but NOT backend layout-pass rejections
(e.g. "infer-vector-layout: unsupported shape cast", which killed the first
round-3 bench in flash_prefill while the CPU gate was green: the terminal's
libtpu is a different Mosaic build than the local jaxlib).

This gate runs `jax.jit(f).lower(args).compile()` on the live TPU/axon
backend — full remote compile, no execution, a few seconds per program —
over the same geometry matrix as the CPU gate. Run it on the TPU machine
before trusting a kernel change:

    python tools/tpu_compile_gate.py
"""
import functools
import sys
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

import test_tpu_lowering as g  # geometry matrix + qt_spec helpers
from llama_cpp_test_tpu.ops import qmatmul
from llama_cpp_test_tpu.ops import gmm as gmm_mod
from llama_cpp_test_tpu.ops.flash_prefill import flash_prefill
from llama_cpp_test_tpu.ops.paged_attention import paged_attention_decode
from llama_cpp_test_tpu.quant.repack import QTensor

f32, bf16, i32 = jnp.float32, jnp.bfloat16, jnp.int32
sds = jax.ShapeDtypeStruct


def compile_tpu(name, f, *args):
    try:
        jax.jit(f).lower(*args).compile()
        print(f"OK   {name}", flush=True)
        return True
    except Exception as e:
        msg = str(e).splitlines()
        head = next((l for l in msg if "Mosaic" in l or "INTERNAL" in l),
                    msg[0] if msg else "")
        print(f"FAIL {name}: {type(e).__name__}: {head[:160]}", flush=True)
        return False


def main():
    assert jax.default_backend() == "tpu", "run on the TPU machine"
    ok = True

    for m in g.M_REGIMES:
        for kind, group, has_min, has_lut in g.PLANE_KINDS:
            for n, k in g.GEOMETRIES:
                if k % group:
                    continue
                qt = g.qt_spec(kind, n, k, group, has_min=has_min,
                               has_lut=has_lut)
                ok &= compile_tpu(
                    f"qmm {kind} g{group} min={has_min} {n}x{k} M={m}",
                    functools.partial(qmatmul.qmm, tile_n=256),
                    sds((m, k), f32), qt)

    for kind, group, has_min, has_lut in g.PLANE_KINDS[:3]:
        for e, n, k, tile_m in g.GMM_GEOS:
            if k % group:
                continue
            base = g.qt_spec(kind, n, k, group, has_min=has_min,
                             has_lut=has_lut)
            lead = lambda s: None if s is None else sds((e,) + s.shape,
                                                        s.dtype)
            qt = QTensor(base.kind, base.shape, base.n_orig, base.group,
                         lead(base.qs), lead(base.scale), lead(base.min_),
                         base.lut)
            t = 4
            ok &= compile_tpu(
                f"gmm {kind} g{group} E={e} {n}x{k} tile_m={tile_m}",
                functools.partial(gmm_mod.gmm_apply, tile_m=tile_m),
                sds((t * tile_m, k), f32), qt, sds((t,), i32))

    # dequant-pipeline variants: one geometry per plane kind each
    for variant in ("bf16",):
        for kind, group, has_min, has_lut in g.PLANE_KINDS:
            n, k = g.GEOMETRIES[0]
            if k % group:
                continue
            qt = g.qt_spec(kind, n, k, group, has_min=has_min,
                           has_lut=has_lut)
            ok &= compile_tpu(
                f"qmm[{variant}] {kind} g{group} min={has_min} {n}x{k}",
                functools.partial(qmatmul.qmm, tile_n=256, variant=variant),
                sds((8, k), f32), qt)

    for h, kv, d, bs in g.ATTN_GEOS:
        b, nb, nbmax = 8, 64, 32
        ok &= compile_tpu(
            f"paged_attn h{h} kv{kv} d{d} bs{bs}",
            paged_attention_decode,
            sds((b, h, d), bf16), sds((kv, nb, bs, d), bf16),
            sds((kv, nb, bs, d), bf16), sds((b,), i32), sds((b, nbmax), i32))
    # pages-per-step variants incl. a non-divisible page axis (pad path)
    for pap, nbmax in ((1, 32), (8, 28), (16, 32)):
        h, kv, d, bs = g.ATTN_GEOS[0]
        b, nb = 8, 64
        ok &= compile_tpu(
            f"paged_attn pap={pap} nbmax={nbmax}",
            functools.partial(paged_attention_decode, pages_per_step=pap),
            sds((b, h, d), bf16), sds((kv, nb, bs, d), bf16),
            sds((kv, nb, bs, d), bf16), sds((b,), i32), sds((b, nbmax), i32))
    # quantized (q8_0) KV pages: int8 pools + per-slot f32 scales
    for h, kv, d, bs in g.ATTN_GEOS:
        b, nb, nbmax = 8, 64, 32
        fq = (lambda q, k, v, l, p, ks, vs: paged_attention_decode(
            q, k, v, l, p, pages_per_step=8, k_scale=ks, v_scale=vs))
        ok &= compile_tpu(
            f"paged_attn_q8 h{h} kv{kv} d{d} bs{bs}",
            fq,
            sds((b, h, d), bf16), sds((kv, nb, bs, d), jnp.int8),
            sds((kv, nb, bs, d), jnp.int8), sds((b,), i32),
            sds((b, nbmax), i32),
            sds((kv, nb, bs), f32), sds((kv, nb, bs), f32))

    for h, kv, d, bs in g.ATTN_GEOS:
        for t in (128, 512):
            b, nb, nbmax = 2, 64, 64
            ok &= compile_tpu(
                f"flash_prefill h{h} kv{kv} d{d} bs{bs} t{t}",
                functools.partial(flash_prefill, window=0, soft_cap=0.0),
                sds((b, t, h, d), bf16), sds((kv, nb, bs, d), bf16),
                sds((kv, nb, bs, d), bf16), sds((b, t), i32),
                sds((b,), i32), sds((b, nbmax), i32))
    h, kv, d, bs = 16, 8, 128, 16
    b, t, nb, nbmax = 2, 256, 64, 64
    ok &= compile_tpu(
        "flash_prefill swa+softcap",
        functools.partial(flash_prefill, window=1024, soft_cap=50.0),
        sds((b, t, h, d), bf16), sds((kv, nb, bs, d), bf16),
        sds((kv, nb, bs, d), bf16), sds((b, t), i32), sds((b,), i32),
        sds((b, nbmax), i32))

    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
