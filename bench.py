"""Benchmark driver (llama-bench analogue, examples/llama-bench).

Measures, on one real TPU chip, through the full engine path (fused Pallas
dequant-matmul + paged KV + jitted loops):

  decode       single-seq device greedy loop, TinyLlama-1.1B-geometry Q4_K
               (BASELINE config #1) — the headline metric
  sched        serving-path tokens/s: 4 concurrent slots through the
               Scheduler's windowed device decode + device sampling
  batch64      64-sequence batched decode (continuous-batching throughput,
               BASELINE config #2 shape)
  moe          Mixtral-geometry (scaled) top-2/8 expert decode through the
               grouped gmm kernel (BASELINE config #4 shape)
  prefill      pp512

Prints ONE JSON line: the headline decode row, with every other config in
"extra" (metric -> {tok_s, vs_roofline}). Set BENCH_FAST=1 to skip the
secondary configs (each costs one remote compile on a tunneled device).

Rooflines are HBM-bandwidth based: bytes-touched-per-token = weight planes
streamed + KV read, per config.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

MODEL_CACHE = "/tmp/bench_tinyllama_q4k.gguf"
MOE_CACHE = "/tmp/bench_moe_q4k.gguf"
L3_8B_CACHE = "/tmp/bench_llama3_8b_q4k.gguf"

HBM_BW = {  # bytes/s, per chip
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6e": 1640e9,
    "cpu": 50e9,
}


def tinyllama_hp():
    return dict(n_vocab=32000, n_embd=2048, n_head=32, n_head_kv=4,
                head_dim=64, n_layer=22, n_ff=5632)


def build_model(path):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from __graft_entry__ import _tiny_gguf

    hp = tinyllama_hp()
    _tiny_gguf(path, n_vocab=hp["n_vocab"], n_embd=hp["n_embd"],
               n_head=hp["n_head"], n_head_kv=hp["n_head_kv"],
               head_dim=hp["head_dim"], n_layer=hp["n_layer"],
               n_ff=hp["n_ff"], qtype=GGMLType.Q4_K)


MOE_HP = dict(n_vocab=32000, n_embd=1024, n_head=16, n_head_kv=4,
              head_dim=64, n_layer=8, n_ff=1536, n_expert=8, n_expert_used=2)


def build_moe_model(path):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from __graft_entry__ import _tiny_gguf

    _tiny_gguf(path, qtype=GGMLType.Q4_K, **MOE_HP)


# BASELINE config #4 at FLAGSHIP expert geometry: full Mixtral-8x7B expert
# planes (4096 x 14336, 8 experts, top-2) with 8 layers so the synthesized
# Q4_K model (~6.4GB) fits one chip's HBM beside the KV pool — per-token
# cost extrapolates linearly in layers, expert-plane economics are the
# flagship ones (dbench gmm at this geometry: 496 GB/s = 60.6% roofline
# vs 0.10 at quarter scale — the small row was dispatch-floor-bound).
MOE_FLAGSHIP_HP = dict(n_vocab=32000, n_embd=4096, n_head=32, n_head_kv=8,
                       head_dim=128, n_layer=8, n_ff=14336, n_expert=8,
                       n_expert_used=2)
MOE_FLAGSHIP_CACHE = "/tmp/bench_moe_flagship_q4k.gguf"


def build_moe_flagship(path):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from __graft_entry__ import _tiny_gguf

    _tiny_gguf(path, qtype=GGMLType.Q4_K, **MOE_FLAGSHIP_HP)


# BASELINE.json north-star config #2: Llama-3-8B geometry (synthesized
# Q4_K weights). Default ON (the headline metric) — disable with BENCH_8B=0
# if the build+compile budget (tens of minutes cold) is unavailable.
L3_8B_HP = dict(n_vocab=128256, n_embd=4096, n_head=32, n_head_kv=8,
                head_dim=128, n_layer=32, n_ff=14336)


def build_8b_model(path):
    from llama_cpp_test_tpu.gguf.constants import GGMLType
    from __graft_entry__ import _tiny_gguf

    _tiny_gguf(path, qtype=GGMLType.Q4_K, **L3_8B_HP)


def weight_bytes_per_token(hp, bits=4.5):
    """Dense-model weight bytes every decode step streams from HBM."""
    c, ff, L, v = hp["n_embd"], hp["n_ff"], hp["n_layer"], hp["n_vocab"]
    hq, hkv, d = hp["n_head"], hp["n_head_kv"], hp["head_dim"]
    per_layer = (c * hq * d + 2 * c * hkv * d + hq * d * c + 3 * c * ff)
    total = L * per_layer + v * c  # + lm head
    return total * bits / 8


def kv_bytes_per_token(hp, kv_len, batch=1):
    """KV pool bytes read per decode step (bf16 K+V, all layers)."""
    return (2 * hp["n_head_kv"] * hp["head_dim"] * kv_len * 2 *
            hp["n_layer"] * batch)


def moe_bytes_per_token(hp, bits=4.5):
    """MoE decode streams attn + router + top_k experts' FFN + lm head."""
    c, ff, L, v = hp["n_embd"], hp["n_ff"], hp["n_layer"], hp["n_vocab"]
    hq, hkv, d, e, ku = (hp["n_head"], hp["n_head_kv"], hp["head_dim"],
                         hp["n_expert"], hp["n_expert_used"])
    attn = c * hq * d + 2 * c * hkv * d + hq * d * c
    ffn = ku * 3 * c * ff          # only the chosen experts stream
    router = c * e
    total = L * (attn + ffn + router) + v * c
    return total * bits / 8


def main():
    import jax

    backend = jax.default_backend()
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", backend)
    bw = HBM_BW.get(gen, HBM_BW.get(backend, 819e9))
    fast = os.environ.get("BENCH_FAST") == "1"

    if not os.path.exists(MODEL_CACHE):
        from llama_cpp_test_tpu.quant import codecs

        t0 = time.time()
        codecs.set_refine_iters(0)  # fixture build speed on slow hosts
        try:
            build_model(MODEL_CACHE)
        finally:
            codecs.set_refine_iters(2)
        print(f"# built model in {time.time()-t0:.1f}s", file=sys.stderr)

    from llama_cpp_test_tpu.runtime.engine import Context, Model

    t0 = time.time()
    model = Model(MODEL_CACHE)
    print(f"# load+repack {time.time()-t0:.1f}s", file=sys.stderr)

    hp = tinyllama_hp()
    n_ctx = 1024
    extra = {}

    # ---- config #1: single-seq decode (headline) + prefill ----------------
    # block_size 64: decode attention cost is Mosaic grid steps (~0.4us x
    # B x n_ctx/block_size x n_layer), so bigger KV pages cut it 4x
    ctx = Context(model, n_ctx=n_ctx, n_seq_max=2, block_size=64)
    rng = np.random.default_rng(0)
    warm = ctx.new_seq()
    ctx.prefill(warm, list(rng.integers(1, 30000, 512)))
    ctx.free_seq(warm)
    s = ctx.new_seq()
    prompt = list(rng.integers(1, 30000, 512))
    t0 = time.time()
    logits = ctx.prefill(s, prompt)
    np.asarray(logits)
    pp_tok_s = len(prompt) / (time.time() - t0)

    tok = int(np.argmax(logits))
    n_steps = 128  # long window amortizes the device-link round trip
    ctx.decode_greedy_loop(s, tok, n_steps)  # compile
    t0 = time.time()
    toks = ctx.decode_greedy_loop(s, tok, n_steps)
    tg_loop = n_steps / (time.time() - t0)
    roof1 = bw / (weight_bytes_per_token(hp) + kv_bytes_per_token(hp, 560))
    extra["prefill_pp512"] = {"tok_s": round(pp_tok_s, 1)}

    # ---- serving path: scheduler windowed decode + device sampling --------
    if not fast:
        try:
            from llama_cpp_test_tpu.runtime.sampling import SamplerParams
            from llama_cpp_test_tpu.runtime.scheduler import (GenRequest,
                                                              Scheduler)

            from llama_cpp_test_tpu.runtime.scheduler import SlotState

            ctx2 = Context(model, n_ctx=n_ctx, n_seq_max=4, block_size=64)
            sch = Scheduler(ctx2, n_slots=4, chunk_size=512, decode_window=32,
                            gen_prefill_chunk=512)  # one prefill program

            def run_batch():
                for i in range(4):
                    sch.submit(GenRequest(
                        list(rng.integers(1, 30000, 512)), max_tokens=64,
                        sampling=SamplerParams(temp=0.7, top_k=40,
                                               seed=i + 1),
                        ignore_eos=True))
                # phase the prompts first so decode runs at full batch
                # through the windowed path (one window program)
                sch._launch_queued()
                while any(sl.state == SlotState.PROMPT for sl in sch.slots):
                    sch._prefill_one()
                n0 = sch.n_gen_tokens
                t0 = time.time()
                sch.run()
                return sch.n_gen_tokens - n0, time.time() - t0

            run_batch()                    # compile the window program
            n_gen, dt = run_batch()        # steady-state measurement
            sched_tok_s = n_gen / dt
            roof_s = bw / (weight_bytes_per_token(hp) / 4 +
                           kv_bytes_per_token(hp, 560))
            extra["sched_4slot"] = {
                "tok_s": round(sched_tok_s, 1),
                "vs_roofline": round(sched_tok_s / roof_s, 4),
                "per_seq_vs_device_loop": round(
                    (sched_tok_s / 4) / tg_loop, 3),
            }
        except Exception as e:  # pragma: no cover
            extra["sched_4slot"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ---- 64-seq batched decode -------------------------------------------
    if not fast:
        try:
            from llama_cpp_test_tpu.runtime.sampling import SamplerParams

            ctx3 = Context(model, n_ctx=256, n_seq_max=64, block_size=32,
                           num_blocks=64 * 8 + 16)
            seqs, toks64 = [], []
            for i in range(64):
                si = ctx3.new_seq()
                lg = ctx3.prefill(si, list(rng.integers(1, 30000, 64)))
                seqs.append(si)
                toks64.append(int(np.argmax(lg)))
            # windowed batched decode: device sampling, int-only downloads
            # (a host decode() call downloads B x 128KB of logits per step
            # over a ~10MB/s link — the windowed path is the serving path)
            greedy = [SamplerParams(temp=0.0)] * 64
            w64 = 16
            out = ctx3.decode_window(seqs, toks64, greedy, w64)  # compile
            toks_n = [int(t) for t in out[-1]]
            t0 = time.time()
            out = ctx3.decode_window(seqs, toks_n, greedy, w64)
            dt = time.time() - t0
            b64_tok_s = 64 * w64 / dt
            # aggregate roofline: one step streams weights once + 64 KV reads
            roof64 = bw / (weight_bytes_per_token(hp) / 64 +
                           kv_bytes_per_token(hp, 100))
            extra["decode_batch64"] = {
                "tok_s": round(b64_tok_s, 1),
                "vs_roofline": round(b64_tok_s / roof64, 4),
            }
        except Exception as e:  # pragma: no cover
            extra["decode_batch64"] = {
                "error": f"{type(e).__name__}: {e}"[:200]}

    # ---- MoE (Mixtral-shaped, scaled) ------------------------------------
    if not fast:
        try:
            if not os.path.exists(MOE_CACHE):
                from llama_cpp_test_tpu.quant import codecs

                codecs.set_refine_iters(0)
                try:
                    build_moe_model(MOE_CACHE)
                finally:
                    codecs.set_refine_iters(2)
            moe_model = Model(MOE_CACHE)
            ctxm = Context(moe_model, n_ctx=256, n_seq_max=2, block_size=32)
            sm = ctxm.new_seq()
            lg = ctxm.prefill(sm, list(rng.integers(1, 30000, 64)))
            tokm = int(np.argmax(lg))
            ctxm.decode_greedy_loop(sm, tokm, 64)  # compile
            t0 = time.time()
            ctxm.decode_greedy_loop(sm, tokm, 64)
            dt = time.time() - t0
            moe_tok_s = 64 / dt
            del ctxm, sm
            roof_m = bw / (moe_bytes_per_token(MOE_HP) +
                           kv_bytes_per_token(MOE_HP, 100))
            extra["moe_8x_top2"] = {
                "tok_s": round(moe_tok_s, 1),
                "vs_roofline": round(moe_tok_s / roof_m, 4),
            }
        except Exception as e:  # pragma: no cover
            extra["moe_8x_top2"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ---- Mixtral flagship-geometry MoE (opt-out: BENCH_MOE_FLAGSHIP=0) ----
    if os.environ.get("BENCH_MOE_FLAGSHIP", "1") != "0" and not fast:
        try:
            if not os.path.exists(MOE_FLAGSHIP_CACHE):
                from llama_cpp_test_tpu.quant import codecs

                t0 = time.time()
                codecs.set_refine_iters(0)
                try:
                    build_moe_flagship(MOE_FLAGSHIP_CACHE)
                finally:
                    codecs.set_refine_iters(2)
                print(f"# built flagship MoE in {time.time()-t0:.1f}s",
                      file=sys.stderr)
            mf = Model(MOE_FLAGSHIP_CACHE)
            ctxf = Context(mf, n_ctx=512, n_seq_max=2, block_size=32)
            sf = ctxf.new_seq()
            lg = ctxf.prefill(sf, list(rng.integers(1, 30000, 64)))
            tokf = int(np.argmax(lg))
            ctxf.decode_greedy_loop(sf, tokf, 64)  # compile
            t0 = time.time()
            ctxf.decode_greedy_loop(sf, tokf, 64)
            dt = time.time() - t0
            mf_tok_s = 64 / dt
            rooff = bw / (moe_bytes_per_token(MOE_FLAGSHIP_HP) +
                          kv_bytes_per_token(MOE_FLAGSHIP_HP, 150))
            extra["moe_flagship_decode"] = {
                "tok_s": round(mf_tok_s, 1),
                "vs_roofline": round(mf_tok_s / rooff, 4),
            }
            # free the 6.3GB of expert planes DETERMINISTICALLY before the
            # 8B row loads its 4.7GB: lazy GC left both resident once and
            # the 8B decode died with RESOURCE_EXHAUSTED
            del mf, ctxf
            import gc

            gc.collect()
        except Exception as e:  # pragma: no cover
            extra["moe_flagship_decode"] = {
                "error": f"{type(e).__name__}: {e}"[:200]}

    # ---- Llama-3-8B geometry (north star; opt-out: BENCH_8B=0) ------------
    if os.environ.get("BENCH_8B", "1") != "0" and not fast:
        try:
            if not os.path.exists(L3_8B_CACHE):
                from llama_cpp_test_tpu.quant import codecs

                t0 = time.time()
                codecs.set_refine_iters(0)
                try:
                    build_8b_model(L3_8B_CACHE)
                finally:
                    codecs.set_refine_iters(2)
                print(f"# built 8B model in {time.time()-t0:.1f}s",
                      file=sys.stderr)
            t0 = time.time()
            m8 = Model(L3_8B_CACHE)
            print(f"# 8B load+repack {time.time()-t0:.1f}s", file=sys.stderr)
            ctx8 = Context(m8, n_ctx=1024, n_seq_max=2, block_size=32)
            s8 = ctx8.new_seq()
            lg = ctx8.prefill(s8, list(rng.integers(1, 100000, 512)))
            tok8 = int(np.argmax(lg))
            ctx8.decode_greedy_loop(s8, tok8, 64)  # compile
            t0 = time.time()
            ctx8.decode_greedy_loop(s8, tok8, 64)
            dt = time.time() - t0
            tok_s8 = 64 / dt
            roof8 = bw / (weight_bytes_per_token(L3_8B_HP, bits=5.0) +
                          kv_bytes_per_token(L3_8B_HP, 600))
            # KBENCH round-5: fused 4-bit dequant is bound by per-ELEMENT
            # VPU processing at ~0.96 T elem/s (Q4_K and int8 take equal
            # time per element), so the attainable ceiling for this format
            # is elems/0.96T — report progress against BOTH rooflines
            elems8 = weight_bytes_per_token(L3_8B_HP, bits=8.0)  # = elems
            elem_roof8 = 0.96e12 / elems8
            extra["llama3_8b_decode"] = {
                "tok_s": round(tok_s8, 1),
                "vs_roofline": round(tok_s8 / roof8, 4),
                "vs_elem_roofline": round(tok_s8 / elem_roof8, 4),
            }
            # prefill MFU at the north-star geometry (TTFT driver): the
            # compute-bound regime — compare against the nominal bf16 MXU
            # peak (dbench r5: the fused-qmm prefill chain alone runs at
            # ~52% of nominal; the dense control measured 225 TFLOP/s)
            s8b = ctx8.new_seq()
            prompt8 = list(rng.integers(1, 100000, 512))
            ctx8.prefill(s8b, prompt8)     # compile this seq's shape
            ctx8.free_seq(s8b)
            # synced single-prefill latency (includes the tunnel's
            # ~25-30ms dispatch RTT + ~11ms logits download — tools/
            # prefpipe.py round-5: that link share is NOT device time)
            dt_sync = float("inf")
            for _ in range(3):
                s8c = ctx8.new_seq()
                t0 = time.time()
                np.asarray(ctx8.prefill(s8c, prompt8))
                dt_sync = min(dt_sync, time.time() - t0)
                ctx8.free_seq(s8c)
            # throughput (the llama-bench pp512 analogue): dispatch 4
            # back-to-back prefills with the result sync deferred, sync
            # once. pools thread functionally through each call, so the
            # chain is dependency-ordered on device; per-prefill marginal
            # time is the device+host cost without the per-call RTT.
            import jax as _jax
            _orig_asarray = np.asarray
            _lazy = (lambda a, *ar, **kw: a if isinstance(a, _jax.Array)
                     else _orig_asarray(a, *ar, **kw))
            dtp = float("inf")
            for _ in range(3):
                np.asarray = _lazy
                try:
                    t0 = time.time()
                    outs = []
                    for _k in range(4):
                        s8p = ctx8.new_seq()
                        outs.append(ctx8.prefill(s8p, prompt8))
                        ctx8.free_seq(s8p)
                    for o in outs:
                        _orig_asarray(o)
                    dtp = min(dtp, (time.time() - t0) / 4)
                finally:
                    np.asarray = _orig_asarray
            hp8 = L3_8B_HP
            c8, ff8, l8, v8 = (hp8["n_embd"], hp8["n_ff"], hp8["n_layer"],
                               hp8["n_vocab"])
            per_layer = (c8 * hp8["n_head"] * hp8["head_dim"] * 2 +
                         2 * c8 * hp8["n_head_kv"] * hp8["head_dim"] +
                         3 * c8 * ff8)
            flops = 2 * 512 * (l8 * per_layer + v8 * c8)
            mxu_peak = {"v5e": 197e12, "v5p": 459e12,
                        "v4": 275e12, "v6e": 918e12}.get(gen, 197e12)
            extra["prefill_8b_pp512"] = {
                "tok_s": round(512 / dtp, 1),
                "mfu": round(flops / dtp / mxu_peak, 4),
                "sync_ms": round(dt_sync * 1e3, 1),
            }
            # serving TTFT path: the first token samples from a device
            # top-K download (2*256 floats) instead of the [128k] f32
            # logits transfer. Round-5 correction (KBENCH): on the
            # current link this is ~neutral (sort ~7ms vs download
            # ~11ms); it matters when the link degrades to round-3
            # bandwidth. Kept as the synced first-token serving number.
            s8d = ctx8.new_seq()
            ctx8.prefill(s8d, prompt8, top_k=256)   # compile
            ctx8.free_seq(s8d)
            dts = float("inf")
            for _ in range(3):
                s8e = ctx8.new_seq()
                t0 = time.time()
                v8, i8 = ctx8.prefill(s8e, prompt8, top_k=256)
                np.asarray(i8)
                dts = min(dts, time.time() - t0)
                ctx8.free_seq(s8e)
            extra["prefill_8b_pp512_serving"] = {
                "tok_s": round(512 / dts, 1),
                "mfu": round(flops / dts / mxu_peak, 4),
            }
            del m8, ctx8
        except Exception as e:  # pragma: no cover
            extra["llama3_8b_decode"] = {
                "error": f"{type(e).__name__}: {e}"[:200]}

    # Headline = the BASELINE north-star row (Llama-3-8B decode) when it ran;
    # TinyLlama decode is the secondary row either way.
    extra["tinyllama_decode"] = {
        "tok_s": round(tg_loop, 2),
        "vs_roofline": round(tg_loop / roof1, 4),
    }
    row8 = extra.get("llama3_8b_decode")
    if row8 and "tok_s" in row8:
        result = {
            "metric": f"llama3_8b_q4k_decode_tok_s_{backend}",
            "value": row8["tok_s"],
            "unit": "tok/s",
            "vs_baseline": row8["vs_roofline"],
            "extra": extra,
        }
    else:
        result = {
            "metric": f"tinyllama1.1b_q4k_decode_tok_s_{backend}",
            "value": round(tg_loop, 2),
            "unit": "tok/s",
            "vs_baseline": round(tg_loop / roof1, 4),
            "extra": extra,
        }
    print(f"# decode {tg_loop:.1f} tok/s (roofline {roof1:.0f}) | "
          f"prefill {pp_tok_s:.1f} | extra: {extra}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
