"""Decode-path kernel breakdown on real TPU.

bench.py gives one end-to-end number (tok/s through the engine). This tool
apportions it: a lax.scan with the SAME structure as the engine's device
decode loop (N chained iterations per dispatch) whose body is one component
of the per-token work over DISTINCT per-layer weights (so every iteration
re-streams from HBM exactly like serving decode):

  qmm      — the 22-layer x (wqkv, wo, gate|up, down) + lm_head fused
             dequant-matmul chain (Pallas)
  qmm_xla  — same chain through the XLA fallback path
  dense    — same chain, bf16 dense weights (2 bytes/weight bandwidth ref)
  attn     — 22 paged_attention_decode calls on a 512-token cache

Run on the TPU machine:  python tools/dbench.py [qmm qmm_xla dense attn]
Each variant costs one remote compile (~2-5 min) then runs in one dispatch.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llama_cpp_test_tpu.ops.qmatmul import qmm, qmm_xla
from llama_cpp_test_tpu.quant.repack import QTensor

import os

HBM_BW = 819e9
N_ITER = int(os.environ.get("DB_ITERS", "64"))
B = int(os.environ.get("DB_B", "8"))   # decode batch rows (engine pads to 8)
GROUP = 32
TILE_N = int(os.environ.get("DB_TILE_N", "256"))

# Model geometry (DB_GEOM): 'tiny' = TinyLlama-1.1B (bench.py config #1),
# '8b' = Llama-3-8B (BASELINE.json north-star config #2 — attention grid
# floors and dispatch overheads weigh ~3x less per byte at this size).
# DB_NL trims layers to cut remote-compile time when A/B-ing (~40s/layer).
GEOM = os.environ.get("DB_GEOM", "tiny")
if GEOM == "8b":
    C, FF, NL, V = 4096, 14336, int(os.environ.get("DB_NL", "32")), 128256
    QKV = 4096 + 2 * 8 * 128          # 32 q heads + 8 kv heads x 128
else:
    C, FF, NL, V = 2048, 5632, int(os.environ.get("DB_NL", "22")), 32000
    QKV = 2560                        # 32q + 4k + 4v heads x 64
SHAPES = [
    (QKV, C),         # fused wqkv
    (C, C),           # wo
    (2 * FF, C),      # fused gate|up
    (C, FF),          # down
]


def mk_q4k(n, k, rng, mult=512):
    """Random Q4_K-like planes (u4 + bf16 scale/min), layout 't'."""
    npk = (n + (-n % mult)) // 2
    qs = jnp.asarray(rng.integers(0, 256, (k, npk), dtype=np.uint8))
    sc = jnp.asarray(rng.standard_normal((2, k // GROUP, npk)) * 0.01,
                     jnp.bfloat16)
    mn = jnp.asarray(rng.standard_normal((2, k // GROUP, npk)) * 0.001,
                     jnp.bfloat16)
    qt = QTensor("u4", (npk * 2, k), n, GROUP, qs, sc, mn, None)
    nbytes = qs.size + sc.size * 2 + mn.size * 2
    return qt, nbytes


def mk_q40(n, k, rng, mult=512):
    """Scale-only u4 planes (Q4_0-like, no affine min): isolates the
    xsum/min-fold dots from the main pipeline."""
    npk = (n + (-n % mult)) // 2
    qs = jnp.asarray(rng.integers(0, 256, (k, npk), dtype=np.uint8))
    sc = jnp.asarray(rng.standard_normal((2, k // GROUP, npk)) * 0.01,
                     jnp.bfloat16)
    qt = QTensor("u4", (npk * 2, k), n, GROUP, qs, sc, None, None)
    return qt, qs.size + sc.size * 2


def mk_dense(n, k, rng):
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.01, jnp.bfloat16)
    qt = QTensor("dense", (n, k), n, k, w)
    return qt, w.size * 2


def build_chain(mk, matmul):
    rng = np.random.default_rng(0)
    layers = []
    total = 0
    for _ in range(NL):
        row = []
        for n, k in SHAPES:
            qt, nb = mk(n, k, rng)
            row.append(qt)
            total += nb
        layers.append(row)
    try:
        head, nb = mk(V, C, rng, mult=2048)  # loader pads the head to
    except TypeError:                        # tile_n=1024 planes
        head, nb = mk(V, C, rng)
    total += nb

    # weights are ARGUMENTS, not closures: the remote-compile path
    # serializes closure constants into the program body (HTTP 413)
    def step(x, ws):
        lys, hd = ws
        for wqkv, wo, wgu, wdn in lys:
            y = matmul(x, wqkv)[:, :C]
            y = matmul(y.astype(jnp.bfloat16), wo)
            g = matmul(y.astype(jnp.bfloat16), wgu)
            h = (g[:, :FF] * jax.nn.sigmoid(g[:, FF:2 * FF]))
            x = matmul(h.astype(jnp.bfloat16), wdn)[:, :C] \
                .astype(jnp.bfloat16)
        logits = matmul(x, hd)
        return x + (logits[:, :1] * 1e-9).astype(x.dtype)

    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((B, C)),
                     jnp.bfloat16)
    return step, x0, (layers, head), total


def build_split_chain():
    """The ENGINE's projection call pattern: fused wqkv / gate|up tensors
    through qmm_split (one kernel pass + per-part pack-slice/reshape/cast)
    vs build_chain's plain qmm. The difference isolates the split-output
    glue that stepanatomy measured as ~2ms/step at 8B geometry."""
    from llama_cpp_test_tpu.quant.repack import fuse_qtensors

    rng = np.random.default_rng(0)
    layers = []
    total = 0
    hq = 32
    kvh, d = (8, 128) if GEOM == "8b" else (4, 64)
    for _ in range(NL):
        wq, b1 = mk_q4k(hq * d, C, rng)
        wk, b2 = mk_q4k(kvh * d, C, rng)
        wv, b3 = mk_q4k(kvh * d, C, rng)
        wqkv = fuse_qtensors([wq, wk, wv])
        wo, b4 = mk_q4k(C, C, rng)
        g, b5 = mk_q4k(FF, C, rng)
        u, b6 = mk_q4k(FF, C, rng)
        gu = fuse_qtensors([g, u])
        dn, b7 = mk_q4k(C, FF, rng)
        layers.append((wqkv, wo, gu, dn))
        total += b1 + b2 + b3 + b4 + b5 + b6 + b7
    head, nb = mk_q4k(V, C, rng, mult=2048)
    total += nb

    from llama_cpp_test_tpu.ops.qmatmul import qmm_split

    def step(x, ws):
        lys, hd = ws
        for wqkv, wo, gu, dn in lys:
            q, k, v = qmm_split(x, wqkv, tile_n=TILE_N)
            y = qmm((q[:, :C] + 1e-9 * (k[:, :1] + v[:, :1]))
                    .astype(jnp.bfloat16), wo)
            g2, u2 = qmm_split(y.astype(jnp.bfloat16), gu, tile_n=TILE_N)
            h = (jax.nn.silu(g2) * u2)
            x = qmm(h.astype(jnp.bfloat16), dn)[:, :C].astype(jnp.bfloat16)
        logits = qmm(x, hd)
        return x + (logits[:, :1] * 1e-9).astype(x.dtype)

    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((B, C)),
                     jnp.bfloat16)
    return step, x0, (layers, head), total


def build_attn():
    from llama_cpp_test_tpu.ops.paged_attention import paged_attention_decode

    pap = int(os.environ.get("DB_PAP", "8"))  # pages per grid step
    bs = int(os.environ.get("DB_BS", "16"))   # KV page size (block_size)
    kvl = int(os.environ.get("DB_KVLEN", "512"))  # cached tokens/sequence
    rng = np.random.default_rng(0)
    kvh, d = (8, 128) if GEOM == "8b" else (4, 64)
    npages = -(-kvl // bs)
    nb_ = max(64, B * npages + 8)
    kv_len = jnp.asarray([kvl] * B, jnp.int32)
    tables = jnp.asarray(
        np.stack([rng.permutation(nb_)[:npages] for _ in range(B)]),
        jnp.int32)
    pools = []
    total = 0
    for _ in range(NL):
        k = jnp.asarray(rng.standard_normal((kvh, nb_, bs, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((kvh, nb_, bs, d)), jnp.bfloat16)
        pools.append((k, v))
        total += 2 * kvh * B * kvl * d * 2  # bytes actually read
    h = 32  # q heads (both geometries)

    use_xla = os.environ.get("DB_ATTN_XLA") == "1"
    if use_xla:
        # pure-XLA gather+softmax (no Pallas): at short caches the paged
        # kernel's per-(seq, chunk) grid floor may lose to one big fused
        # batched attention
        from llama_cpp_test_tpu.runtime.kv_cache import attend_prefill_xla

        @jax.jit
        def one(q, k, v):
            pos = (kv_len - 1)[:, None]
            return attend_prefill_xla(q[:, None], k, v, tables, pos,
                                      kv_len, 1.0)[:, 0]

        def step(q, ws):
            out = q
            for k, v in ws:
                out = one(out, k, v)
            return out
    else:
        def step(q, ws):
            out = q
            for k, v in ws:
                out = paged_attention_decode(out, k, v, kv_len, tables,
                                             pages_per_step=pap)
            return out

    q0 = jnp.asarray(rng.standard_normal((B, h, d)), jnp.bfloat16)
    return step, q0, pools, total


def build_gmm():
    """MoE decode FFN chain (bench.py moe_8x_top2 geometry): 8 layers of
    route -> gate/up/down grouped matmuls -> combine, B=8 tokens top-2 of 8
    experts. Isolates the gmm path the way the qmm chain isolates dense
    decode (VERDICT r3 weak #4: no row isolated gmm)."""
    from llama_cpp_test_tpu.ops import gmm as gmm_mod

    rng = np.random.default_rng(0)
    # default: bench.py moe_8x_top2 scaled geometry. DB_GMM_GEOM=mixtral
    # uses FULL Mixtral-8x7B expert planes (BASELINE config #4 flagship
    # size; DB_GMM_NL layers keep build+compile bounded — per-layer cost
    # extrapolates, expert planes are the flagship 4096x14336)
    if os.environ.get("DB_GMM_GEOM") == "mixtral":
        C_, FF_, E, KU = 4096, 14336, 8, 2
        NLm = int(os.environ.get("DB_GMM_NL", "4"))
    else:
        C_, FF_, E, KU = 1024, 1536, 8, 2
        NLm = int(os.environ.get("DB_GMM_NL", "8"))
    tile_m = 8

    def mk_exp(n, k):
        npk = (n + (-n % 512)) // 2
        qs = jnp.asarray(rng.integers(0, 256, (E, k, npk), dtype=np.uint8))
        sc = jnp.asarray(rng.standard_normal((E, 2, k // GROUP, npk)) * 0.01,
                         jnp.bfloat16)
        mn = jnp.asarray(rng.standard_normal((E, 2, k // GROUP, npk)) * 1e-3,
                         jnp.bfloat16)
        qt = QTensor("u4", (npk * 2, k), n, GROUP, qs, sc, mn, None)
        return qt, qs.size + sc.size * 2 + mn.size * 2

    layers = []
    total = 0
    for _ in range(NLm):
        gate, b1 = mk_exp(FF_, C_)
        up, b2 = mk_exp(FF_, C_)
        down, b3 = mk_exp(C_, FF_)
        router = jnp.asarray(rng.standard_normal((C_, E)) * 0.1, jnp.bfloat16)
        layers.append((router, gate, up, down))
        # decode streams the UNION of routed experts' planes: ~min(E, B*KU)
        # distinct experts for random routing (B=1 -> top_k, B>=E/KU -> all)
        total += int((b1 + b2 + b3) * min(E, B * KU) / E) + router.size * 2

    fused = os.environ.get("DB_GMM_FUSED", "0") == "1"
    if fused:
        from llama_cpp_test_tpu.quant.repack import fuse_expert_qtensors

        layers = [(r, fuse_expert_qtensors([g, u]), None, d)
                  for r, g, u, d in layers]

    def step(x, ws):
        for router, gate, up, down in ws:
            logits = x @ router
            topv, topi = jax.lax.top_k(jax.nn.softmax(
                logits.astype(jnp.float32)), KU)
            topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
            routing = gmm_mod.route_tokens(
                topi.astype(jnp.int32), topv, n_expert_local=E,
                expert_offset=0, tile_m=tile_m)
            xs = x[routing.tok_idx]
            if up is None:  # fused gate|up plane (engine fast path)
                g, u = gmm_mod.gmm_apply_split(xs, gate,
                                               routing.tile_expert, tile_m)
            else:
                g = gmm_mod.gmm_apply(xs, gate, routing.tile_expert, tile_m)
                u = gmm_mod.gmm_apply(xs, up, routing.tile_expert, tile_m)
            h = (jax.nn.silu(g[:, :FF_]) * u[:, :FF_]).astype(jnp.bfloat16)
            d = gmm_mod.gmm_apply(h, down, routing.tile_expert, tile_m)
            y = gmm_mod.combine(d[:, :C_], routing, x.shape[0])
            x = (x + y * 1e-3).astype(jnp.bfloat16)
        return x

    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((B, C_)),
                     jnp.bfloat16)
    return step, x0, layers, total


def build_samp():
    """Device-sampling chain: the windowed decode step's sampling cost at
    DB_B rows x 32000 vocab (penalties + candidate top-k + gumbel pick).
    lax.top_k on TPU lowers to a full sort and dominated the B=64 window
    step; this row tracks the approx_max_k replacement."""
    from llama_cpp_test_tpu.runtime import device_sampling as ds
    from llama_cpp_test_tpu.runtime.sampling import SamplerParams

    rng = np.random.default_rng(0)
    Vv = 32000
    params = ds.DeviceSamplerParams.from_rows(
        [SamplerParams(temp=0.7, top_k=40, seed=i) for i in range(B)], B)
    hist = jnp.asarray(ds.make_history([[1, 2, 3]] * B, B))
    key = jax.random.PRNGKey(0)
    base = jnp.asarray(rng.standard_normal((B, Vv)), jnp.float32)

    null = os.environ.get("DB_SAMP_NULL") == "1"

    def step(x, ws):
        params, hist, key = ws
        if null:  # harness floor: argmax only (bounds the scan overhead)
            toks = jnp.argmax(x, axis=-1).astype(jnp.int32)
        else:
            toks = ds.sample_tokens(x, params, hist, key,
                                    jnp.zeros((B,), jnp.int32))
        # feed the tokens back so the chain is serialized
        return x + (toks[:, None] * 1e-9).astype(x.dtype)

    return step, base, (params, hist, key), B * Vv * 4


def build_kvw():
    """KV-write chain: 22 layers of decode-step scatters (write_kv) at DB_B
    rows — isolates the per-step cache-update cost (TPU scatters serialize;
    a B=64 step scatters 64 rows x 2 pools x 22 layers).
    DB_KVW=onehot tests a matmul-based scatter replacement."""
    from llama_cpp_test_tpu.runtime import kv_cache

    rng = np.random.default_rng(0)
    kvh, d, bs = 4, 64, 32
    nb_ = B * 8 + 8
    pools = [(jnp.asarray(rng.standard_normal((kvh, nb_, bs, d)),
                          jnp.bfloat16),
              jnp.asarray(rng.standard_normal((kvh, nb_, bs, d)),
                          jnp.bfloat16)) for _ in range(NL)]
    slots = jnp.asarray(rng.permutation(nb_ * bs)[:B], jnp.int32)[:, None]
    total = NL * 2 * B * kvh * d * 2  # bytes written

    use_onehot = os.environ.get("DB_KVW") == "onehot"

    def write_onehot(pool, new, s):
        kv, nb, bsz, dd = pool.shape
        flat = pool.reshape(kv, nb * bsz, dd)
        oh = (s.reshape(-1)[:, None] ==
              jnp.arange(nb * bsz)[None, :]).astype(jnp.bfloat16)  # [B, S]
        vals = new.reshape(-1, kv, dd).swapaxes(0, 1)              # [KV,B,D]
        upd = jnp.einsum("bs,kbd->ksd", oh, vals.astype(jnp.bfloat16))
        keep = 1.0 - jnp.max(oh, axis=0)                           # [S]
        flat = flat * keep[None, :, None] + upd
        return flat.reshape(kv, nb, bsz, dd)

    def step(x, ws):
        # x: [B, 1, KV, D] fresh values; chain pools serially
        acc = x
        for i, (k, v) in enumerate(ws):
            if use_onehot:
                k2 = write_onehot(k, acc, slots)
                v2 = write_onehot(v, acc, slots)
            else:
                k2 = kv_cache.write_kv(k, acc, slots)
                v2 = kv_cache.write_kv(v, acc, slots)
            acc = acc + (k2[0, 0, 0, 0] * 1e-9).astype(acc.dtype)
        return acc

    x0 = jnp.asarray(rng.standard_normal((B, 1, kvh, d)), jnp.bfloat16)
    return step, x0, pools, total


_RTT = None


def _rtt() -> float:
    """One dispatch+download round trip over the device link — measured
    once and subtracted from every scan timing. At 16 iters the tunnel's
    ~30ms RTT shows up as a phantom 1.9ms/iter "fixed cost" (which round 3
    initially chased as kernel overhead)."""
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8, 128), jnp.float32)
        np.asarray(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
        print(f"  link RTT: {_RTT*1e3:.1f}ms", flush=True)
    return _RTT


def time_scan(step, x0, ws):
    @jax.jit
    def loop(x, w):
        return jax.lax.scan(lambda c, _: (step(c, w), ()), x, None,
                            length=N_ITER)[0]

    # time through a host materialization: block_until_ready on the axon
    # tunnel returns before device execution completes (observed 21 TB/s
    # "bandwidth"), np.asarray cannot lie
    t0 = time.time()
    np.asarray(loop(x0, ws))
    print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
    # min-of-N: single timed runs show up to 40% tunnel-contention spread
    # (round-5 callfloor.py measurements)
    best = float("inf")
    for _ in range(int(os.environ.get("DB_REPS", "3"))):
        t0 = time.perf_counter()
        np.asarray(loop(x0, ws))
        best = min(best, time.perf_counter() - t0)
    return (best - _rtt()) / N_ITER


def main():
    which = sys.argv[1:] or ["qmm", "dense", "attn"]
    builders = {
        "qmm": lambda: build_chain(
            mk_q4k, lambda x, qt: qmm(x, qt, tile_n=TILE_N)),
        # dequant-pipeline variants (ops/qmatmul.py QMM_VARIANT docs)
        "qmm_f32": lambda: build_chain(
            mk_q4k, lambda x, qt: qmm(x, qt, tile_n=TILE_N, variant="f32")),
        "qmm_bf16": lambda: build_chain(
            mk_q4k, lambda x, qt: qmm(x, qt, tile_n=TILE_N, variant="bf16")),
        "qmm_pipe": lambda: build_chain(
            mk_q4k, lambda x, qt: qmm(x, qt, tile_n=TILE_N, variant="pipe")),
        "qmm_cache": lambda: build_chain(
            mk_q4k, lambda x, qt: qmm(x, qt, tile_n=TILE_N,
                                      variant="cache")),
        "qmm_nomin": lambda: build_chain(
            mk_q40, lambda x, qt: qmm(x, qt, tile_n=TILE_N)),
        "qmm_xla": lambda: build_chain(mk_q4k, qmm_xla),
        "qmm_split": build_split_chain,
        "dense": lambda: build_chain(mk_dense, lambda x, qt: jnp.dot(
            x, qt.qs, preferred_element_type=jnp.float32)[:, :qt.n_orig]),
        "attn": build_attn,
        "gmm": build_gmm,
        "samp": build_samp,
        "kvw": build_kvw,
    }
    for name in which:
        step, x0, ws, nbytes = builders[name]()
        dt = time_scan(step, x0, ws)
        gbs = nbytes / dt / 1e9
        print(f"{name:8s} {dt*1e3:8.2f} ms/tok  {nbytes/1e6:7.1f} MB/tok  "
              f"{gbs:7.1f} GB/s ({100*gbs*1e9/HBM_BW:5.1f}% roofline)",
              flush=True)


if __name__ == "__main__":
    main()
