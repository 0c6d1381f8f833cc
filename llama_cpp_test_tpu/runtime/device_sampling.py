"""Device-side sampling for windowed decode loops.

The host SamplerChain (runtime/sampling.py) mirrors llama-sampling.cpp
exactly but costs a device->host logits round-trip per token — ~24ms on a
tunneled TPU, which caps serving at ~40 tok/s no matter how fast the model
runs. This module jit-compiles the COMMON chain (penalties -> top-k ->
top-p -> min-p -> temperature -> dist, the default ordering of
llama_sampler_chain_default_params, reference common/sampling.cpp) so the
engine can scan N decode+sample steps per dispatch and only sync once per
window.

Approximation vs the host chain: candidates are pre-truncated to the top
K_MAX=256 logits (after penalties). With default top_k=40 this is exact;
for top_k<=0 (disabled) the probability mass beyond rank 256 at temp<=2 is
negligible. Rows needing samplers outside this set (typical/XTC/mirostat/
DRY/grammar/logit-bias/dynatemp) are ineligible — the scheduler falls back
to the per-token host path for those batches (see Scheduler._decode_all).
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

K_MAX = 256       # candidate truncation after penalties (a 32k-vocab
                  # lax.top_k dominates windowed-step cost; tail mass
                  # beyond rank 256 at temp <= 2 is negligible)
HIST_LEN = 128    # penalty history ring length (>= default penalty_last_n 64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceSamplerParams:
    """Per-row sampler parameters, all [B] arrays."""
    temp: jax.Array          # f32; <= 0 means greedy
    top_k: jax.Array         # i32; <= 0 means disabled (K_MAX candidates)
    top_p: jax.Array         # f32; >= 1 disables
    min_p: jax.Array         # f32; <= 0 disables
    penalty_last_n: jax.Array   # i32; 0 disables penalties for the row
    penalty_repeat: jax.Array   # f32 (1.0 = off)
    penalty_freq: jax.Array     # f32 (0.0 = off)
    penalty_present: jax.Array  # f32 (0.0 = off)
    seed: jax.Array             # i32 per-row RNG seed (SamplerParams.seed)

    @classmethod
    def from_rows(cls, rows: list, pad_to: int) -> "DeviceSamplerParams":
        """rows: list of SamplerParams; padded rows sample greedily."""
        def arr(get, default, dtype):
            v = [get(r) for r in rows] + [default] * (pad_to - len(rows))
            return jnp.asarray(np.asarray(v, dtype))
        return cls(
            temp=arr(lambda r: r.temp, 0.0, np.float32),
            top_k=arr(lambda r: r.top_k, 1, np.int32),
            top_p=arr(lambda r: r.top_p, 1.0, np.float32),
            min_p=arr(lambda r: r.min_p, 0.0, np.float32),
            penalty_last_n=arr(lambda r: max(0, min(r.penalty_last_n,
                                                    HIST_LEN)), 0, np.int32),
            penalty_repeat=arr(lambda r: r.penalty_repeat, 1.0, np.float32),
            penalty_freq=arr(lambda r: r.penalty_freq, 0.0, np.float32),
            penalty_present=arr(lambda r: r.penalty_present, 0.0, np.float32),
            seed=arr(lambda r: r.seed & 0x7FFFFFFF, 0, np.int32),
        )


def ineligible_reasons(p) -> list[str]:
    """Why a SamplerParams chain is NOT exactly expressible on device —
    each entry names the sampler that forces the per-token host path (the
    ~10x serving cliff of the tunneled-logits download), so the scheduler
    can tell the user instead of silently falling back."""
    reasons = []
    if p.typ_p < 1.0:
        reasons.append("typical_p")
    if p.xtc_probability > 0.0:
        reasons.append("xtc")
    if p.top_n_sigma > 0.0:
        reasons.append("top_n_sigma")
    if p.mirostat != 0:
        reasons.append("mirostat")
    if p.dry_multiplier > 0.0:
        reasons.append("dry")
    if p.logit_bias:
        reasons.append("logit_bias")
    if p.grammar:
        reasons.append("grammar")
    if p.dynatemp_range > 0.0:
        reasons.append("dynatemp")
    if p.penalty_last_n > HIST_LEN:
        reasons.append(f"penalty_last_n>{HIST_LEN}")
    if p.penalty_repeat < 1.0 or p.penalty_freq < 0.0 or \
            p.penalty_present < 0.0:
        # the candidate-union fast path is exact only for penalties that
        # LOWER logits (the standard direction); boosting penalties need
        # the full-vocab host chain
        reasons.append("negative/boosting penalties")
    if not (0 < p.top_k <= K_MAX - HIST_LEN):
        # the candidate-only penalty fast path is exact while penalized
        # displacements (<= HIST_LEN) keep the top-k window inside the
        # K_MAX candidate set
        reasons.append(f"top_k not in (0, {K_MAX - HIST_LEN}]")
    return reasons


# candidate count for the slow-path top-K download (scheduler
# _decode_host_step_candidates): large enough that top_k + a full
# penalty ring still fit, small enough that the download is trivial
# (2*256 floats/row vs [V] f32)
HOST_CANDIDATES_K = 256


def host_candidates_eligible(p) -> bool:
    """Host-chain (slow-path) rows that can sample from a device top-K
    download instead of full-vocab logits.

    Safe when every pre-top_k chain element only touches tokens that are
    guaranteed inside the downloaded top-K: penalties can demote at most
    penalty_last_n distinct tokens, so raw rank top_k + penalty_last_n
    always covers the post-penalty top_k (the same argument as the
    windowed device path's candidate-only penalties). Grammar masks run
    on the candidates with a full-logits fallback when they reject all K.
    NOT safe: DRY and logit_bias (may promote tokens at arbitrary raw
    rank), mirostat (needs the full distribution's surprise estimate),
    and top_k <= 0 (chain starts from the whole vocab)."""
    pen = p.penalty_last_n if (p.penalty_repeat != 1.0 or
                               p.penalty_freq != 0.0 or
                               p.penalty_present != 0.0) else 0
    return (0 < p.top_k and p.top_k + pen <= HOST_CANDIDATES_K and
            p.dry_multiplier == 0.0 and not p.logit_bias and
            p.mirostat == 0)


def eligible(p) -> bool:
    """True when a SamplerParams chain is expressible on device.

    Exactness: with the default 'auto' selector, vocabs <= 64k use exact
    top_k and the device chain matches the host chain token-for-token.
    For larger vocabs (e.g. llama3's 128k) candidate selection is the
    segmented selector — greedy stays exact; stochastic sampling has
    ~0.95+ recall at ranks >= 2 (LLAMA_TPU_TOPK=sort restores full
    exactness at ~10x the selection cost)."""
    return not ineligible_reasons(p)


def apply_penalties(logits: jax.Array, hist: jax.Array, hist_valid: jax.Array,
                    p: DeviceSamplerParams) -> jax.Array:
    """Repeat/frequency/presence penalties over the history ring, FULL
    vocab (reference llama_sampler_penalties semantics; kept for tests and
    small-vocab callers — the windowed fast path penalizes the candidate
    union instead, see sample_tokens).

    logits [B, V] f32; hist [B, HIST_LEN] i32 (-1 = empty slot);
    hist_valid [B, HIST_LEN] bool (within the row's penalty_last_n).
    """
    b, v = logits.shape
    on = (p.penalty_last_n > 0) & (
        (p.penalty_repeat != 1.0) | (p.penalty_freq != 0.0) |
        (p.penalty_present != 0.0))
    idx = jnp.where(hist_valid & (hist >= 0), hist, v)  # v = dump slot
    counts = jnp.zeros((b, v + 1), jnp.float32).at[
        jnp.arange(b)[:, None], idx].add(1.0)[:, :v]
    present = counts > 0
    rep = jnp.where(on, p.penalty_repeat, 1.0)[:, None]
    penalized = jnp.where(logits > 0, logits / rep, logits * rep)
    out = jnp.where(present, penalized, logits)
    out = out - counts * jnp.where(on, p.penalty_freq, 0.0)[:, None]
    out = out - present * jnp.where(on, p.penalty_present, 0.0)[:, None]
    return out


def _penalize_candidates(vals, cand_ids, hist, hist_valid, p):
    """Penalties on a candidate set: counts come from comparing candidate
    ids against the history ring (no [B, V] scatter — TPU scatter-add
    serialized at ~0.5us/element and dominated the windowed step).
    vals/cand_ids [B, N]; hist [B, HIST_LEN]. Returns penalized vals."""
    on = (p.penalty_last_n > 0) & (
        (p.penalty_repeat != 1.0) | (p.penalty_freq != 0.0) |
        (p.penalty_present != 0.0))
    h = jnp.where(hist_valid & (hist >= 0), hist, -1)
    counts = jnp.sum(
        (cand_ids[:, :, None] == h[:, None, :]) & (h[:, None, :] >= 0),
        axis=2).astype(jnp.float32)                        # [B, N]
    present = counts > 0
    rep = jnp.where(on, p.penalty_repeat, 1.0)[:, None]
    penalized = jnp.where(vals > 0, vals / rep, vals * rep)
    out = jnp.where(present, penalized, vals)
    out = out - counts * jnp.where(on, p.penalty_freq, 0.0)[:, None]
    out = out - present * jnp.where(on, p.penalty_present, 0.0)[:, None]
    return out


# Candidate-selection implementation for the large-vocab fast path:
#   auto   — exact lax.top_k for V <= 64k (measured FASTER than approx on
#            v5e at 32k vocab), segmented selection above (sort is ~10x
#            slower at 128k). Default.
#   approx — jax.lax.approx_max_k (native PartialReduce where supported)
#   seg    — segmented max: pad V to 512 segments, take each segment's
#            max (two elementwise passes, no sort), then an exact top_k
#            over the 512 segment winners. Greedy stays exact (the global
#            max is always a segment winner); sampling recall matches
#            approx-top-k-style selection (misses only when multiple
#            top-k tokens share a ~64-wide vocab segment).
#   sort   — exact lax.top_k (full per-row sort) at every vocab size.
# Under 'auto', 32k-vocab serving is fully exact; >64k vocabs use the
# segmented selector whose rank>=2 recall caveat is documented in
# ineligible_reasons/server stats.
_TOPK_IMPL = os.environ.get("LLAMA_TPU_TOPK", "auto")
_N_SEG = 512


def _segmented_top_candidates(logits, k_max):
    """[B, V] -> (vals, ids) of k_max candidates via segment winners."""
    b, v = logits.shape
    vpad = -(-v // _N_SEG) * _N_SEG
    seg = vpad // _N_SEG
    x = jnp.pad(logits, ((0, 0), (0, vpad - v)),
                constant_values=-jnp.inf).reshape(b, _N_SEG, seg)
    seg_max = jnp.max(x, axis=2)                       # [B, NSEG]
    seg_arg = jnp.argmax(x, axis=2).astype(jnp.int32)  # [B, NSEG]
    seg_ids = jnp.arange(_N_SEG, dtype=jnp.int32)[None, :] * seg + seg_arg
    vals, order = jax.lax.top_k(seg_max, k_max)        # small sort
    ids = jnp.take_along_axis(seg_ids, order, axis=1)
    return vals, ids


# Gumbel noise source for the categorical pick. "threefry" = vmapped
# jax.random (counter-based, matches round-3 streams); "hash" = a murmur3
# finalizer over (key, row seed, pos, rank) lanes — same determinism
# contract (noise is a pure function of those four), ~15 VPU ops total.
_GUMBEL_IMPL = os.environ.get("LLAMA_TPU_GUMBEL", "hash")
# measured B=64 window-step sampling cost (v5e, dbench samp): threefry
# 4.3ms -> hash 3.4ms; the residual is dozens-of-small-ops floors, not any
# single sampler. Streams differ from the round-3 threefry ones but keep
# the same (key, row seed, pos, rank) determinism contract.


def _hash_gumbel(key, seed, pos, b, k_max):
    """Deterministic per-(key, seed, pos, rank) gumbel noise via integer
    hashing (murmur3 fmix32) — no counter-based PRNG machinery."""
    try:
        kdata = jax.random.key_data(key)
    except TypeError:
        kdata = jnp.asarray(key)
    kdata = kdata.reshape(-1).astype(jnp.uint32)
    base = (kdata[0] ^ (kdata[-1] * jnp.uint32(0x9E3779B9)))
    x = (seed.astype(jnp.uint32)[:, None] * jnp.uint32(0x85EBCA6B)
         ^ pos.astype(jnp.uint32)[:, None] * jnp.uint32(0xC2B2AE35)
         ^ jnp.arange(k_max, dtype=jnp.uint32)[None, :]
         ^ base)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    # uniform in (0, 1): 24 mantissa-safe bits, +1 to avoid exactly 0
    u = (x >> 8).astype(jnp.float32) * (1.0 / 16777216.0) + 1e-8
    return -jnp.log(-jnp.log(u))


def sample_tokens(logits: jax.Array, p: DeviceSamplerParams,
                  hist: jax.Array, key: jax.Array,
                  pos: jax.Array | None = None) -> jax.Array:
    """One sampling step: [B, V] f32 logits -> [B] i32 tokens.

    hist: [B, HIST_LEN] i32 recent tokens, most recent LAST (-1 pads).
    pos:  optional [B] i32 sample positions. The Gumbel noise for a row is a
    deterministic function of (key, row seed, pos) — a request with a fixed
    SamplerParams.seed reproduces its output regardless of batch placement,
    window phase, or co-resident slots (the host chain seeds a per-request
    RNG; this is the batched analogue).
    """
    b, v = logits.shape
    ring_pos = jnp.arange(HIST_LEN)[None, :]
    hist_valid = ring_pos >= (HIST_LEN - p.penalty_last_n[:, None])
    k_max = min(K_MAX, v)

    if v > 2 * k_max:
        # Fast path: penalties on the raw top-k_max CANDIDATES only — no
        # [B, V] scatter (the r3 counts scatter-add serialized at ~4ms for
        # B=64) and no history-logit gather (TPU gather is just as slow —
        # the measured union variant cost 12ms). Exact for lowering-only
        # penalties (eligibility gate) when top_k <= K_MAX - HIST_LEN: at
        # most HIST_LEN penalized tokens can fall out of the top-k window,
        # pulling in at most raw rank k+HIST_LEN <= k_max — always inside
        # the candidate set. Same argument makes the greedy pick exact —
        # GIVEN exact candidates. The 'approx'/'seg' selectors retain the
        # global top-1 (a bin max) so greedy WITHOUT penalties is exact,
        # but their rank>=2 recall (~0.95+) means active penalties can in
        # rare cases surface a token approx dropped; LLAMA_TPU_TOPK=sort
        # restores full exactness at the cost of a 32k-wide sort.
        impl = _TOPK_IMPL
        if impl == "auto":
            # Measured on v5e (B=64, RTT-inclusive): at V=32000 the exact
            # sort is FASTEST (1.19ms vs approx 1.44 / seg 1.48); at
            # V=128256 the sort blows up (6.9ms) and seg wins (0.60 vs
            # approx 0.70). So: exact top_k for vocabs <= 64k, segmented
            # selection above.
            impl = "sort" if v <= 65536 else "seg"
        if impl == "seg":
            rvals, rids = _segmented_top_candidates(logits, k_max)
        elif jax.default_backend() == "tpu" and impl == "approx":
            rvals, rids = jax.lax.approx_max_k(logits, k_max)
        else:
            rvals, rids = jax.lax.top_k(logits, k_max)
        cand_vals = _penalize_candidates(rvals, rids, hist, hist_valid, p)
        # re-rank the (small) candidate set exactly
        vals, order = jax.lax.top_k(cand_vals, k_max)
        ids = jnp.take_along_axis(rids, order, axis=1)
    else:
        logits = apply_penalties(logits, hist, hist_valid, p)
        vals, ids = jax.lax.top_k(logits, k_max)   # sorted desc [B, k_max]
    greedy_tok = ids[:, 0]

    # top-k: threshold at the per-row kth value
    k = jnp.clip(jnp.where(p.top_k <= 0, k_max, p.top_k), 1, k_max)
    rank = jnp.arange(k_max)[None, :]
    keep = rank < k[:, None]
    vals = jnp.where(keep, vals, -jnp.inf)

    # softmax over the candidate set (for top-p / min-p)
    probs = jax.nn.softmax(vals, axis=-1)

    # top-p: keep while the exclusive prefix sum is below top_p
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = (cum - probs) < p.top_p[:, None]
    keep_p = keep_p.at[:, 0].set(True)
    vals = jnp.where(keep_p, vals, -jnp.inf)

    # min-p: relative to the max prob (candidates are sorted)
    keep_m = probs >= (p.min_p[:, None] * probs[:, 0:1])
    keep_m = keep_m.at[:, 0].set(True)
    vals = jnp.where(keep_m, vals, -jnp.inf)

    # temperature + categorical via Gumbel-max; temp <= 0 -> greedy (rank 0)
    temp = jnp.maximum(p.temp, 1e-6)[:, None]
    if pos is None:
        pos = jnp.zeros((b,), jnp.int32)
    if _GUMBEL_IMPL == "hash":
        g = _hash_gumbel(key, p.seed, pos, b, k_max)
    else:
        row_keys = jax.vmap(
            lambda s, q: jax.random.fold_in(jax.random.fold_in(key, s), q)
        )(p.seed, pos)
        g = jax.vmap(
            lambda kk: jax.random.gumbel(kk, (k_max,), jnp.float32))(
                row_keys)
    scores = vals / temp + g
    choice = jnp.argmax(scores, axis=-1)
    picked = jnp.take_along_axis(ids, choice[:, None], axis=1)[:, 0] \
        .astype(jnp.int32)
    # temp <= 0: exact greedy over the FULL vocab (immune to approx_max_k
    # recall and matching the host chain / decode() argmax bit-for-bit)
    return jnp.where(p.temp > 0, picked, greedy_tok)


def push_history(hist: jax.Array, tok: jax.Array) -> jax.Array:
    """Append tok [B] to the ring (most recent last)."""
    return jnp.concatenate([hist[:, 1:], tok[:, None]], axis=1)


def make_history(token_lists: list, pad_to: int) -> np.ndarray:
    """Host helper: [B, HIST_LEN] ring from per-row recent-token lists."""
    h = np.full((pad_to, HIST_LEN), -1, np.int32)
    for i, toks in enumerate(token_lists):
        tail = toks[-HIST_LEN:]
        if tail:
            h[i, HIST_LEN - len(tail):] = tail
    return h
