"""Inference engine: jitted prefill/decode steps over the paged KV cache.

The llama_context::decode analogue (reference src/llama-context.cpp:1155-1460)
re-designed for XLA: instead of building a ggml graph per ubatch and running a
backend scheduler, the engine jit-compiles a small set of bucketed step
functions (token-count buckets stand in for the reference's worst-case graph
reservation, llama-context.cpp:289-343) and feeds them device-resident
weights, donated KV pools, and int32 block tables from the host-side
BlockManager.

  Model     — weights + hparams + compiled steps (llama_model analogue)
  Context   — KV pools + block manager + per-sequence state (llama_context)
  generate()— llama-cli style greedy/sampled loop
"""
from __future__ import annotations

import dataclasses
import functools
import math
import os
import time
from typing import Any, Callable, Iterator, Sequence as Seq

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader, open_gguf
from ..models import llama as llama_mod
from ..models import hparams as hparams_mod
from ..models.hparams import HParams, hparams_from_metadata
from ..models.llama import LlamaWeights, device_put_weights, load_weights
from ..tokenizer import load_tokenizer
from . import kv_cache
from .block_manager import BlockManager, SequenceBlockTable
from .kv_cache import KVPools


def _expand_rows(dp: int, row: int, *arrays):
    """Replicate single-row host arrays onto a dp-sharded batch: each
    (array, fill) lands its row-0 data at `row`, other rows get `fill`
    (slot -1 rows drop their KV writes)."""
    out = []
    for a, fill in arrays:
        e = np.full((dp,) + a.shape[1:], fill, a.dtype)
        e[row] = a[0]
        out.append(e)
    return out


def _bucket(n: int, buckets: Seq[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


TOKEN_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)

# Minimum decode batch rows. A round-5 hypothesis was that padding the
# batch to qmm's tile_m floor (8) once per step would remove the
# per-projection pad/slice glue measured at 2 ms/step (8B,
# tools/stepanatomy.py); the clean A/B/A REFUTED it: TinyLlama decode
# 442.6/445.1 tok/s padded vs 497.2 unpadded (XLA folds the small pads
# cheaply, while 8x attention-grid rows and per-row op work are real).
# Kept as an env A/B hook; default 1 = unpadded.
DECODE_PAD_ROWS = int(os.environ.get("LLAMA_TPU_DECODE_PAD", "1"))


# ---------------------------------------------------------------------------
# jitted step


def _forward(w: LlamaWeights, pools: KVPools, tokens, positions, block_table,
             slots, kv_len, *, hp: HParams, decode: bool,
             tp_axis: str | None = None, tp: int = 1, rope_delta=None,
             x_embd=None, causal: bool = True, mrope_pos=None):
    """Shared forward: embeds, runs all layers (writing KV), final norm is NOT
    applied (lm_head does it). Returns (hidden [B, T, C], pools).

    positions are cache-index positions (mask ordering); rope_delta [B] is an
    optional per-row offset added for the RoPE rotation only — nonzero after
    Self-Extend grouped repositioning (SeqState.pos_offset).
    x_embd [B, T, C]: pre-computed input embeddings (multimodal image
    features, models/clip.py) replacing the token-embedding lookup — the
    llava_eval_image_embed analogue (reference examples/llava/llava.cpp)."""
    x = llama_mod.embed(w, tokens, hp.embd_scale) if x_embd is None \
        else x_embd.astype(jnp.bfloat16)
    if hp.post_norm or hp.pos_embd != "rope":
        # bert-family type/position rows + embedding LN; gpt2-family
        # learned absolute positions; bloom's embedding LayerNorm
        x = llama_mod.embed_extras(w, hp, x, positions)
    scale = hparams_mod.attn_scale_of(hp)
    cap = hp.attn_softcap
    rope_pos = positions if rope_delta is None else \
        positions + rope_delta[:, None]
    quant = pools.quantized
    alibi = None
    if hp.alibi:
        # per-head ALiBi slopes; under tp each shard takes its heads' slice
        al_full = jnp.asarray(llama_mod.layers.alibi_slopes(
            hp.n_head, hp.alibi_max_bias, style=hp.alibi_style))
        if tp_axis is not None and tp > 1:
            hl = hp.n_head // tp
            alibi = jax.lax.dynamic_slice_in_dim(
                al_full, jax.lax.axis_index(tp_axis) * hl, hl)
        else:
            alibi = al_full
    # jina-bert-v2: symmetric bidirectional ALiBi needs true q positions
    al_sym = positions if (hp.alibi and hp.alibi_sym) else None
    new_k, new_v = list(pools.k), list(pools.v)
    new_ks = list(pools.k_scale) if quant else None
    new_vs = list(pools.v_scale) if quant else None
    for li, lw in enumerate(w.layers):
        def attend(q, k_cur, v_cur, _li=li):
            if quant:
                # q8_0 KV (type_k/type_v analogue): quantizing scatter;
                # decode rides the Pallas flash kernel with in-VMEM dequant
                # (attend_decode_q8), prefill the dequantizing gather
                new_k[_li], new_ks[_li] = kv_cache.write_kv_q8(
                    new_k[_li], new_ks[_li], k_cur, slots)
                new_v[_li], new_vs[_li] = kv_cache.write_kv_q8(
                    new_v[_li], new_vs[_li], v_cur, slots)
                if decode and alibi is None:
                    return kv_cache.attend_decode_q8(
                        q, new_k[_li], new_ks[_li], new_v[_li], new_vs[_li],
                        block_table, kv_len, scale,
                        hparams_mod.layer_window(hp, _li), cap)
                k = kv_cache.gather_kv_q8(new_k[_li], new_ks[_li],
                                          block_table)
                v = kv_cache.gather_kv_q8(new_v[_li], new_vs[_li],
                                          block_table)
                qpos = positions if causal else jnp.broadcast_to(
                    (kv_len - 1)[:, None], positions.shape)
                if decode:  # quantized ALiBi decode: dequant-gather path
                    qpos = jnp.broadcast_to((kv_len - 1)[:, None],
                                            (q.shape[0], 1))
                return kv_cache.attend_gathered(
                    q, k, v, qpos, kv_len, scale,
                    hparams_mod.layer_window(hp, _li), cap, alibi=alibi,
                    alibi_sym_pos=al_sym)
            new_k[_li] = kv_cache.write_kv(new_k[_li], k_cur, slots)
            new_v[_li] = kv_cache.write_kv(new_v[_li], v_cur, slots)
            if decode:
                return kv_cache.attend_decode(
                    q, new_k[_li], new_v[_li], block_table, kv_len, scale,
                    hparams_mod.layer_window(hp, _li), cap, alibi=alibi)
            # non-causal (bidirectional) attention for embedding-mode
            # models (gritlm's llama_set_causal_attn(false)): every token
            # attends to the whole chunk — rope still uses true positions
            mask_pos = positions if causal else jnp.broadcast_to(
                (kv_len - 1)[:, None], positions.shape)
            return kv_cache.attend_prefill(
                q, new_k[_li], new_v[_li], block_table, mask_pos, kv_len,
                scale, hparams_mod.layer_window(hp, _li), cap, alibi=alibi,
                alibi_sym_pos=al_sym)

        x = llama_mod.forward_layer(
            x, lw, hp, rope_pos,
            w.inv_freq_for(hparams_mod.layer_window(hp, li)),
            w.rope_mscale, attend, tp_axis=tp_axis, tp=tp,
            mrope_pos=mrope_pos, li=li)
    if quant:
        return x, KVPools(new_k, new_v, new_ks, new_vs)
    return x, KVPools(new_k, new_v)


@functools.partial(jax.jit, static_argnames=("hp",), donate_argnums=(1,))
def _prefill_step(w: LlamaWeights, pools: KVPools, tokens, positions,
                  block_table, slots, kv_len, last_ix, rope_delta=None,
                  *, hp: HParams):
    """Prefill a chunk; logits only for last_ix (out_ids row-gather analogue,
    reference llama-model.cpp:4110-4115). Returns (logits [B, V], pools)."""
    x, pools = _forward(w, pools, tokens, positions, block_table, slots,
                        kv_len, hp=hp, decode=False, rope_delta=rope_delta)
    h_last = jnp.take_along_axis(x, last_ix[:, None, None], axis=1)[:, 0]
    logits = llama_mod.lm_head(w, hp, h_last[:, None])[:, 0]
    return logits, pools


@functools.partial(jax.jit, static_argnames=("hp", "k"), donate_argnums=(1,))
def _prefill_topk_step(w: LlamaWeights, pools: KVPools, tokens, positions,
                       block_table, slots, kv_len, last_ix, rope_delta=None,
                       *, hp: HParams, k: int):
    """_prefill_step returning only the last position's top-k (vals, ids).

    The full [V] f32 logits download costs ~51ms at 128k vocab over the
    tunneled link — measured as the dominant non-compute term of the 8B
    pp512 prefill (tools/stepanatomy.py prefill modes: 140.7ms total,
    ~90ms compute). Candidate-safe samplers only need the top candidates
    (the same argument as _decode_topk_step), cutting TTFT by ~35%."""
    x, pools = _forward(w, pools, tokens, positions, block_table, slots,
                        kv_len, hp=hp, decode=False, rope_delta=rope_delta)
    h_last = jnp.take_along_axis(x, last_ix[:, None, None], axis=1)[:, 0]
    logits = llama_mod.lm_head(w, hp, h_last[:, None])[:, 0]
    vals, ids = jax.lax.top_k(logits, k)
    return vals, ids.astype(jnp.int32), pools


@functools.partial(jax.jit, static_argnames=("hp",), donate_argnums=(1,))
def _prefill_embeds_step(w: LlamaWeights, pools: KVPools, x_embd, positions,
                         block_table, slots, kv_len, last_ix, mrope_pos=None,
                         *, hp: HParams):
    """Prefill a chunk of pre-computed embeddings (multimodal image
    features). x_embd: [B, T, C] f32/bf16. mrope_pos [B, T, 3]: qwen2vl
    image-token position streams (None = standard rope from positions).
    Returns (logits [B, V], pools)."""
    x, pools = _forward(w, pools, None, positions, block_table, slots,
                        kv_len, hp=hp, decode=False, x_embd=x_embd,
                        mrope_pos=mrope_pos)
    h_last = jnp.take_along_axis(x, last_ix[:, None, None], axis=1)[:, 0]
    logits = llama_mod.lm_head(w, hp, h_last[:, None])[:, 0]
    return logits, pools


@functools.partial(jax.jit, static_argnames=("hp",), donate_argnums=(1,))
def _prefill_all_logits_step(w: LlamaWeights, pools: KVPools, tokens,
                             positions, block_table, slots, kv_len,
                             *, hp: HParams):
    """Prefill returning logits for every position (perplexity path)."""
    x, pools = _forward(w, pools, tokens, positions, block_table, slots,
                        kv_len, hp=hp, decode=False)
    logits = llama_mod.lm_head(w, hp, x)
    return logits, pools


@functools.partial(jax.jit, static_argnames=("hp", "pooling", "causal"),
                   donate_argnums=(1,))
def _embed_step(w: LlamaWeights, pools: KVPools, tokens, positions,
                block_table, slots, kv_len, n_valid, n_skip=None,
                *, hp: HParams, pooling: str, causal: bool = True):
    """Prefill returning pooled, L2-normalized embeddings [B, C]
    (the llama_get_embeddings + pooling-type path, reference llama.h pooling;
    examples/embedding). causal=False runs bidirectional attention
    (gritlm's embedding mode)."""
    from ..ops import layers as _layers

    x, pools = _forward(w, pools, tokens, positions, block_table, slots,
                        kv_len, hp=hp, decode=False, causal=causal)
    x = llama_mod.final_norm(w, hp, x).astype(jnp.float32)
    tpos = jnp.arange(x.shape[1])[None, :]
    valid = tpos < n_valid[:, None]
    if n_skip is not None:
        # pool only positions >= n_skip (gritlm: instruction tokens attend
        # but are excluded from the pooled representation, gritlm.cpp:46)
        valid = valid & (tpos >= n_skip[:, None])
    if pooling == "mean":
        denom = jnp.sum(valid.astype(jnp.float32), axis=1, keepdims=True)
        emb = jnp.sum(jnp.where(valid[..., None], x, 0.0), axis=1) / \
            jnp.maximum(denom, 1)
    elif pooling == "cls":
        emb = x[:, 0]
    else:  # last
        emb = jnp.take_along_axis(
            x, jnp.maximum(n_valid - 1, 0)[:, None, None], axis=1)[:, 0]
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                            1e-12)
    return emb, pools


@functools.partial(jax.jit, static_argnames=("hp",), donate_argnums=(1,))
def _prefill_nll_step(w: LlamaWeights, pools: KVPools, tokens, positions,
                      block_table, slots, kv_len, targets, valid,
                      *, hp: HParams):
    """Prefill returning per-position negative log-likelihood of `targets`
    (the perplexity path — log-softmax + gather stays on device so only
    [B, T] floats come back, not [B, T, V] logits)."""
    x, pools = _forward(w, pools, tokens, positions, block_table, slots,
                        kv_len, hp=hp, decode=False)
    logits = llama_mod.lm_head(w, hp, x)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.where(valid, nll, 0.0), pools


@functools.partial(jax.jit, static_argnames=("hp",), donate_argnums=(1,))
def _decode_step(w: LlamaWeights, pools: KVPools, tokens, positions,
                 block_table, slots, kv_len, rope_delta=None, *, hp: HParams):
    """One token per sequence. tokens: [B, 1]. Returns (logits [B, V], pools)."""
    x, pools = _forward(w, pools, tokens, positions, block_table, slots,
                        kv_len, hp=hp, decode=True, rope_delta=rope_delta)
    logits = llama_mod.lm_head(w, hp, x)[:, 0]
    return logits, pools


@functools.partial(jax.jit, static_argnames=("hp", "k"), donate_argnums=(1,))
def _decode_topk_step(w: LlamaWeights, pools: KVPools, tokens, positions,
                      block_table, slots, kv_len, rope_delta=None,
                      *, hp: HParams, k: int):
    """One decode step returning only the top-k (vals, ids) per row.

    The grammar/exotic-sampler host path's cost on a tunneled device is
    the [B, V] f32 logits download (~13ms/row at 128k vocab over the
    ~10MB/s link); candidate-safe host chains only need the top candidates
    (reference semantics: every sampler after top_k operates on the
    narrowed candidate array anyway, llama-sampling.cpp chain order), so
    this downloads 2*B*k values instead. Exact lax.top_k — measured
    FASTER than approx_max_k at 32k vocab on v5e, and still ~7ms cheaper
    than the download it replaces at 128k."""
    x, pools = _forward(w, pools, tokens, positions, block_table, slots,
                        kv_len, hp=hp, decode=True, rope_delta=rope_delta)
    logits = llama_mod.lm_head(w, hp, x)[:, 0]
    vals, ids = jax.lax.top_k(logits, k)
    return vals, ids.astype(jnp.int32), pools


@functools.partial(jax.jit, static_argnames=("hp", "n_steps"),
                   donate_argnums=(1,))
def _decode_greedy_loop(w: LlamaWeights, pools: KVPools, tok0, pos0,
                        block_table, valid, *, hp: HParams, n_steps: int):
    """n_steps greedy decode steps fully on device (lax.scan): one dispatch
    and one [n_steps, B] download per window instead of per-token logits
    round-trips — essential when the host link is slow (TPU tunnel) and the
    analogue of llama-cli's tight greedy loop. Slots are derived on device
    from the position and the block table; invalid (pad) rows' KV writes
    are dropped via slot -1.

    tok0 [B] int32; pos0 [B] positions of tok0; valid [B] bool; returns
    (tokens [n_steps, B] = tok0's successors, pools). The caller pads B
    to DECODE_PAD_ROWS (default 1 — the pad-to-tile_m=8 hypothesis was
    A/B-refuted, see the constant's comment)."""
    bs = pools.block_size

    def body(carry, _):
        pools, tok, pos = carry
        slots = (jnp.take_along_axis(
            block_table, (pos // bs)[:, None], axis=1)[:, 0] * bs + pos % bs)
        slots = jnp.where(valid, slots, -1)
        x, pools = _forward(w, pools, tok[:, None], pos[:, None], block_table,
                            slots[:, None], pos + 1, hp=hp, decode=True)
        logits = llama_mod.lm_head(w, hp, x)[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (pools, nxt, pos + 1), nxt

    (pools, _, _), toks = jax.lax.scan(
        body, (pools, tok0, pos0), None, length=n_steps)
    return toks, pools


@functools.partial(jax.jit, static_argnames=("hp", "n_steps"),
                   donate_argnums=(1,))
def _draft_window_step(w: LlamaWeights, pools: KVPools, tok0, pos0,
                       block_table, valid, *, hp: HParams, n_steps: int):
    """n_steps greedy decode steps returning each step's token AND its
    softmax probability — the batched draft-proposal loop for server-side
    speculative decoding (the reference drafts per-token on the host,
    common/speculative.cpp:270; here the whole proposal is one dispatch).
    Returns (tokens [n_steps, B] i32, probs [n_steps, B] f32, pools)."""
    bs = pools.block_size

    def body(carry, _):
        pools, tok, pos = carry
        slots = (jnp.take_along_axis(
            block_table, (pos // bs)[:, None], axis=1)[:, 0] * bs + pos % bs)
        slots = jnp.where(valid, slots, -1)
        x, pools = _forward(w, pools, tok[:, None], pos[:, None], block_table,
                            slots[:, None], pos + 1, hp=hp, decode=True)
        logits = llama_mod.lm_head(w, hp, x)[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        p = jnp.exp(jnp.take_along_axis(
            logits, nxt[:, None], axis=1)[:, 0] - lse)
        return (pools, nxt, pos + 1), (nxt, p)

    (pools, _, _), (toks, ps) = jax.lax.scan(
        body, (pools, tok0, pos0), None, length=n_steps)
    return toks, ps, pools


@functools.partial(jax.jit, static_argnames=("hp", "n_steps"),
                   donate_argnums=(1,))
def _decode_window_step(w: LlamaWeights, pools: KVPools, tok0, pos0,
                        block_table, valid, params, hist0, key,
                        *, hp: HParams, n_steps: int):
    """n_steps decode+SAMPLE steps fully on device: the serving analogue of
    _decode_greedy_loop. Samples with the jitted common chain
    (runtime/device_sampling.py) so the scheduler syncs once per window
    instead of once per token (reference analogue: the per-slot sampling
    inside update_slots, server.cpp:2794 — but batched and device-resident).

    tok0 [B]; pos0 [B]; valid [B] bool (padded batch rows False — their KV
    writes drop); params: DeviceSamplerParams ([B] rows);
    hist0 [B, HIST_LEN] penalty history (most recent last).
    Returns (tokens [n_steps, B], hist [B, HIST_LEN], pools) — the final
    history rides back out so the scheduler can CHAIN windows device-side
    (tok0 of window k+1 = toks[-1] of window k) without a host sync."""
    from . import device_sampling as ds

    bs = pools.block_size

    def body(carry, _):
        pools, tok, pos, hist = carry
        slots = (jnp.take_along_axis(
            block_table, (pos // bs)[:, None], axis=1)[:, 0] * bs + pos % bs)
        slots = jnp.where(valid, slots, -1)
        x, pools = _forward(w, pools, tok[:, None], pos[:, None], block_table,
                            slots[:, None], pos + 1, hp=hp, decode=True)
        logits = llama_mod.lm_head(w, hp, x)[:, 0]
        hist = ds.push_history(hist, tok)
        # per-row noise keyed on (key, row seed, position) — fixed-seed
        # requests reproduce regardless of window phase or co-batching
        nxt = ds.sample_tokens(logits.astype(jnp.float32), params, hist,
                               key, pos)
        return (pools, nxt, pos + 1, hist), nxt

    (pools, _, _, hist), toks = jax.lax.scan(
        body, (pools, tok0, pos0, hist0), None, length=n_steps)
    return toks, hist, pools


# ---------------------------------------------------------------------------


class Model:
    """Loaded weights + tokenizer (llama_model analogue).

    mesh: optional jax.sharding.Mesh with ('dp', 'tp') axes — weights are
    loaded tensor-parallel over 'tp' and placed with NamedShardings
    (parallel/tp.py). Contexts created from a meshed model run shard_map'ed
    steps.
    """

    def __init__(self, path: str, hp: HParams | None = None, mesh=None,
                 kv_overrides: dict | None = None):
        self.path = path
        self.mesh = mesh
        tp = int(mesh.shape["tp"]) if mesh is not None else 1
        self.tp = tp
        # 5-axis (dp,pp,sp,ep,tp) meshes take the model-parallel path
        self.mp = mesh is not None and "pp" in mesh.axis_names
        from ..common import log

        t0 = time.time()
        self.reader = open_gguf(path)
        if kv_overrides:
            # metadata overrides before hparams parsing (--override-kv,
            # the llama_model_kv_override analogue, reference
            # llama.h:260-278); '*.' keys resolve to the model's arch
            # (rope_kv_overrides helpers)
            arch = self.reader.metadata.get("general.architecture", "llama")
            for k, v in kv_overrides.items():
                if k.startswith("*."):
                    k = f"{arch}{k[1:]}"
                log.info("kv override: %s = %r", k, v)
                self.reader.metadata[k] = v
        self.hp, w = load_weights(self.reader, hp, tp=tp)
        log.info("model %s: arch=%s n_layer=%d n_vocab=%d (load %.1fs)",
                 path.rsplit("/", 1)[-1], self.hp.arch, self.hp.n_layer,
                 self.hp.n_vocab, time.time() - t0)
        if self.mp:
            from ..parallel.pp import shard_mp_weights

            self.weights = shard_mp_weights(w, mesh)
        elif mesh is not None:
            from ..parallel.tp import shard_weights

            self.weights = shard_weights(w, mesh)
        else:
            self.weights = device_put_weights(w)
        try:
            self.tokenizer = load_tokenizer(self.reader)
        except Exception:
            self.tokenizer = None

    def n_vocab(self) -> int:
        return self.hp.n_vocab


@dataclasses.dataclass
class SeqState:
    """One sequence's host-side state (server slot analogue)."""
    seq_id: int
    tokens: list[int]
    table: SequenceBlockTable
    n_cached: int = 0  # tokens whose KV is in the pools
    group: int = 0     # dp group (owns a private block pool shard)
    # RoPE position of the next token minus n_cached: 0 while positions are
    # contiguous; Self-Extend grouped repositioning makes it negative
    # (the llama_kv_cell.delta analogue, reference llama-kv-cache.h:28-46)
    pos_offset: int = 0


@dataclasses.dataclass
class WindowHandle:
    """An in-flight windowed decode dispatch (Context.decode_window_async).

    Host sequence state (SeqState.tokens / n_cached) is applied at fetch()
    time, not dispatch time: a CHAINED window's sampled tokens exist only on
    device until its predecessor is fetched. Fetch order must follow chain
    order (the fed token of window k+1 is the last fetched token of k)."""
    seqs: list
    n_steps: int
    rowmap: np.ndarray              # caller order -> batch row
    bsz: int
    params: Any                     # DeviceSamplerParams (reused by chains)
    valid: Any                      # [bsz] bool device
    key: Any                        # PRNG key (replicated across chains)
    pos0: np.ndarray                # [bsz] first decoded position
    fed: list[int] | None = None    # fed token per seq (first window only)
    prev: "WindowHandle | None" = None
    toks_dev: Any = None            # [n_steps, bsz] device
    hist_dev: Any = None            # [bsz, HIST_LEN] device
    _result: np.ndarray | None = None

    def fetch(self) -> np.ndarray:
        """Sync this window's tokens to the host and apply sequence state.
        Returns [n_steps, B] int32 in caller order."""
        if self._result is None:
            toks = np.asarray(self.toks_dev)
            fed = self.fed
            if fed is None:
                if self.prev is None or self.prev._result is None:
                    raise RuntimeError(
                        "fetch a chained window only after its predecessor")
                fed = [int(self.prev._result[-1, self.rowmap[i]])
                       for i in range(len(self.seqs))]
            for i, s in enumerate(self.seqs):
                row = self.rowmap[i]
                s.tokens.append(fed[i])
                s.tokens.extend(int(t) for t in toks[:-1, row])
                s.n_cached += self.n_steps
            self._result = toks
            self.prev = None  # release the chain for GC
        return self._result[:, self.rowmap]


class Context:
    """KV pools + block manager + step dispatch (llama_context analogue)."""

    def __init__(self, model: Model, n_ctx: int = 2048, n_seq_max: int = 8,
                 block_size: int = 16, num_blocks: int | None = None,
                 kv_type: str = "bf16"):
        self.model = model
        hp = model.hp
        self.kv_type = kv_type
        self.n_ctx = n_ctx
        # longrope (phi3): per-context long/short rope-table selection —
        # the long table iff this context exceeds the pretraining window
        # (reference llama-model.cpp:11434-11445 get_rope_factors on
        # n_ctx_per_seq). A per-context weights VIEW, not a mutation: two
        # contexts over one Model may legitimately differ.
        w = model.weights
        if (w.rope_inv_freq_long is not None and hp.rope_orig_ctx > 0
                and n_ctx > hp.rope_orig_ctx):
            w = dataclasses.replace(w, rope_inv_freq=w.rope_inv_freq_long)
        self.w = w
        self.block_size = block_size
        self.mesh = model.mesh
        self.dp = int(self.mesh.shape["dp"]) if self.mesh is not None else 1
        self.mp = getattr(model, "mp", False)
        # pp microbatch count: batch rows per dp group come in multiples of M
        self.M = int(self.mesh.shape["pp"]) if self.mp else 1
        if num_blocks is None:
            num_blocks = max(n_seq_max * (n_ctx // block_size), 8)
        # num_blocks is PER dp group (each group owns a private pool shard)
        self.num_blocks = num_blocks
        if self.mesh is None:
            # host swap backing (swapBlocks): over-committed blocks move to
            # host instead of corrupting live sequences
            from .block_manager import HostSwapStore

            store = HostSwapStore(self._read_block, self._write_block)
            self.mgrs = [BlockManager(num_blocks, swap_store=store)]
        else:
            self.mgrs = [BlockManager(num_blocks) for _ in range(self.dp)]
        self.seqs: dict[int, SeqState] = {}
        self._next_id = 0
        # abort callback (ggml_abort_callback analogue, reference
        # llama-context.cpp:1302-1305): checked at every engine yield point;
        # a True return raises DecodeAborted (recoverable, code 2)
        self.abort_callback = None
        self._embed_fns: dict = {}
        self._nll_fn = None
        # rope_delta (Self-Extend) step variants; built for tp/dp meshes,
        # None on single-device (the base steps take rd directly) and mp
        self._prefill_rd_fn = None
        self._decode_rd_fn = None
        # block-table width bucket: full table for n_ctx
        self.nbmax = n_ctx // block_size
        if self.mp:
            from ..parallel.pp import build_mp_steps, new_mp_pools

            self.pools = new_mp_pools(hp, num_blocks * self.dp, block_size,
                                      self.mesh, kv_type=kv_type)
            (self._prefill_fn, self._decode_fn, self._copy_fn,
             self._prefill_all_fn, self._window_fn, mk_shift,
             self._mp_embed_builder, self._nll_fn) = \
                build_mp_steps(hp, self.mesh, self.w, self.pools)
            self._shift_fn = mk_shift(
                self.w.rope_inv_freq_swa is not None)
        elif self.mesh is not None:
            from ..parallel.tp import (build_copy_step, build_shift_step,
                                       build_tp_steps, build_window_step,
                                       shard_pools)

            self.pools = kv_cache.new_kv_pools(hp, num_blocks * self.dp,
                                               block_size, kv_type=kv_type)
            self.pools = shard_pools(self.pools, self.mesh)
            (self._prefill_fn, self._prefill_all_fn, self._decode_fn,
             self._prefill_rd_fn, self._decode_rd_fn) = \
                build_tp_steps(hp, self.mesh, self.w, self.pools)
            self._copy_fn = build_copy_step(self.mesh, self.pools)
            self._shift_fn = build_shift_step(hp, self.mesh, self.w,
                                              self.pools)
            self._window_fn = build_window_step(hp, self.mesh, self.w,
                                                self.pools)
        else:
            self.pools = kv_cache.new_kv_pools(hp, num_blocks, block_size,
                                               kv_type=kv_type)
            self._prefill_fn = functools.partial(_prefill_step, hp=hp)
            self._prefill_all_fn = functools.partial(
                _prefill_all_logits_step, hp=hp)
            self._decode_fn = functools.partial(_decode_step, hp=hp)
            self._copy_fn = None


    def _check_abort(self) -> None:
        if self.abort_callback is not None and self.abort_callback():
            from .errors import DecodeAborted

            raise DecodeAborted("decode aborted by callback")

    @property
    def mgr(self) -> BlockManager:
        """Single-group manager (dp == 1 convenience, used by tests)."""
        return self.mgrs[0]

    # -- host swap data plane (HostSwapStore callbacks) -----------------------

    def _read_block(self, blk: int):
        """Device -> host copy of one physical block across all layers."""
        data = kv_cache.gather_block(self.pools, np.int32(blk))
        return tuple(np.asarray(a) for a in data)

    def _write_block(self, data, blk: int) -> None:
        """Host -> device restore of a swapped block."""
        self.pools = kv_cache.scatter_block(
            self.pools, tuple(jnp.asarray(a) for a in data), np.int32(blk))

    # -- sequence management ------------------------------------------------

    def new_seq(self) -> SeqState:
        # pin to the least-loaded dp group (group-local block pool)
        loads = [0] * self.dp
        for s in self.seqs.values():
            loads[s.group] += 1
        g = int(np.argmin(loads))
        s = SeqState(self._next_id, [],
                     SequenceBlockTable(self.mgrs[g], self.block_size),
                     group=g)
        self._next_id += 1
        self.seqs[s.seq_id] = s
        return s

    def free_seq(self, s: SeqState) -> None:
        s.table.release()
        self.seqs.pop(s.seq_id, None)

    def fork_seq(self, s: SeqState) -> SeqState:
        """COW fork (seq_cp analogue) for beam/parallel sampling. The child
        shares blocks, so it stays in the parent's dp group."""
        child = SeqState(self._next_id, list(s.tokens), s.table.fork(),
                         s.n_cached, group=s.group)
        self._next_id += 1
        self.seqs[child.seq_id] = child
        return child

    # -- position edits on the live cache (K-shift) --------------------------

    def _seq_slot(self, s: SeqState, i: int) -> int:
        return s.table.blocks[i // self.block_size] * self.block_size + \
            i % self.block_size

    def _apply_shift(self, s: SeqState, src: list[int], dst: list[int],
                     delta: list[int]) -> None:
        s.table.ensure_resident()
        # un-share any COW blocks first: the shift mutates pool data in place
        for bi in range(len(s.table.blocks)):
            s.table._ensure_writable(bi)
        self._drain_copies([s])
        w = self.w
        if self.mesh is None:
            self.pools = kv_cache.apply_shift(
                self.pools, np.asarray(src, np.int32),
                np.asarray(dst, np.int32), np.asarray(delta, np.int32),
                w.rope_inv_freq, w.rope_mscale, w.rope_inv_freq_swa,
                hp=self.model.hp)
            return
        # ('dp','tp') mesh: per-group slot arrays, -1 pads drop
        n = max(len(src), 1)
        sa = np.full((self.dp, n), -1, np.int32)
        da = np.full((self.dp, n), -1, np.int32)
        ta = np.zeros((self.dp, n), np.int32)
        sa[s.group, :len(src)] = src
        da[s.group, :len(dst)] = dst
        ta[s.group, :len(delta)] = delta
        ms = np.asarray([w.rope_mscale], np.float32)
        if w.rope_inv_freq_swa is not None:
            self.pools = self._shift_fn(self.pools, sa, da, ta,
                                        w.rope_inv_freq, ms,
                                        w.rope_inv_freq_swa)
        else:
            self.pools = self._shift_fn(self.pools, sa, da, ta,
                                        w.rope_inv_freq, ms)

    def shift_context(self, s: SeqState, n_keep: int, n_discard: int) -> None:
        """Context shift: drop tokens [n_keep, n_keep+n_discard), slide the
        tail down and re-rotate its K by -n_discard (llama-cli
        main.cpp:583-608: seq_rm + seq_add(-n_discard) + K-shift)."""
        n = s.n_cached
        if n_discard <= 0 or n_keep + n_discard > n:
            raise ValueError("shift_context: bad n_keep/n_discard")
        if self.model.hp.pos_embd != "rope":
            # learned-position archs (gpt2/bert): K holds absolute position
            # information that a rope delta cannot re-base
            raise NotImplementedError(
                "context shift requires rope positions "
                f"(arch {self.model.hp.arch} uses learned positions)")
        s.table.ensure_resident()
        src = [self._seq_slot(s, i) for i in range(n_keep + n_discard, n)]
        dst = [self._seq_slot(s, i) for i in range(n_keep, n - n_discard)]
        self._apply_shift(s, src, dst, [-n_discard] * len(src))
        s.tokens = s.tokens[:n_keep] + s.tokens[n_keep + n_discard:]
        s.n_cached = n - n_discard
        s.table.truncate(s.n_cached)
        # moved tokens keep their relative rope spacing, so pos_offset holds

    def compact_reuse(self, s: SeqState, new_tokens: list[int],
                      n_reuse_min: int, max_keep: int | None = None) -> int:
        """Chunked prompt-cache reuse — the n_cache_reuse path (reference
        examples/server/server.cpp:3010-3050). Reshapes this sequence's
        cache to serve `new_tokens`: the longest common prefix is kept in
        place, then interior cached chunks of >= n_reuse_min consecutively
        matching tokens are K-SHIFTED down to their new positions (slot
        moves + rope re-rotation by the position delta, _apply_shift)
        instead of being recomputed. Unmatched cache cells are discarded.

        On return the cache holds exactly new_tokens[:ret] at contiguous
        positions; the caller prefills the remainder. max_keep caps the
        kept prefix (a server passes len(new_tokens)-1 so the last token is
        re-decoded for logits). Returns 0 (no reuse) on a pipeline mesh or
        after self_extend."""
        if self.mp or s.pos_offset:
            return 0
        old = s.tokens
        n_old = s.n_cached
        limit = len(new_tokens) if max_keep is None else min(
            max_keep, len(new_tokens))
        lcp = 0
        while lcp < min(n_old, limit) and old[lcp] == new_tokens[lcp]:
            lcp += 1
        head_c, head_p = lcp, lcp
        src: list[int] = []
        dst: list[int] = []
        delta: list[int] = []
        if n_reuse_min > 0 and head_c < n_old and head_p < limit:
            s.table.ensure_resident()
            while head_c < n_old and head_p < limit:
                n_match = 0
                while (head_c + n_match < n_old and
                       head_p + n_match < limit and
                       old[head_c + n_match] == new_tokens[head_p + n_match]):
                    n_match += 1
                if n_match >= n_reuse_min:
                    if head_c != head_p:
                        for t in range(n_match):
                            src.append(self._seq_slot(s, head_c + t))
                            dst.append(self._seq_slot(s, head_p + t))
                            delta.append(head_p - head_c)
                    head_c += n_match
                    head_p += n_match
                else:
                    head_c += 1
        total = head_p
        if src:
            self._apply_shift(s, src, dst, delta)
        s.tokens = list(new_tokens[:total])
        s.n_cached = total
        s.table.truncate(total)
        return total

    def self_extend(self, s: SeqState, n_keep: int, group: int) -> None:
        """Self-Extend grouped attention: compress cached rope positions
        beyond n_keep by `group` (reference passkey.cpp:131-137,
        llama_kv_self_seq_add + seq_div). Cache slots stay put; only the K
        rotation is re-based, and future tokens continue from the compressed
        position via SeqState.pos_offset."""
        n = s.n_cached
        if group <= 1 or n_keep >= n:
            return
        s.table.ensure_resident()
        off = s.pos_offset
        src, delta = [], []
        base = n_keep + off
        last_new = base - 1
        for i in range(n_keep, n):
            old_p = i + off
            new_p = base + (old_p - base) // group
            last_new = new_p
            if new_p != old_p:
                src.append(self._seq_slot(s, i))
                delta.append(new_p - old_p)
        if src:
            self._apply_shift(s, src, src, delta)
        s.pos_offset = last_new + 1 - n

    def _table_arr(self, seqs: Seq[SeqState]) -> np.ndarray:
        bt = np.zeros((len(seqs), self.nbmax), np.int32)
        for i, s in enumerate(seqs):
            blocks = s.table.resident_blocks()[: self.nbmax]
            bt[i, : len(blocks)] = blocks
        return bt

    def _drain_copies(self, seqs: Seq[SeqState]) -> None:
        per_group: list[list[tuple[int, int]]] = [[] for _ in range(self.dp)]
        any_copies = False
        for s in seqs:
            if s.table.pending_copies:
                per_group[s.group].extend(s.table.pending_copies)
                s.table.pending_copies = []
                any_copies = True
        if not any_copies:
            return
        if self.mesh is None:
            copies = per_group[0]
            src = jnp.asarray([c[0] for c in copies], jnp.int32)
            dst = jnp.asarray([c[1] for c in copies], jnp.int32)
            self.pools = kv_cache.apply_copies(self.pools, src, dst)
        else:
            width = max(len(c) for c in per_group)
            src = np.full((self.dp, width), -1, np.int32)
            dst = np.full((self.dp, width), -1, np.int32)
            for g, copies in enumerate(per_group):
                for i, (a, b) in enumerate(copies):
                    src[g, i], dst[g, i] = a, b
            self.pools = self._copy_fn(self.pools, src, dst)

    # -- steps ----------------------------------------------------------------

    def prefill(self, s: SeqState, tokens: list[int],
                all_logits: bool = False, top_k: int = 0) -> np.ndarray:
        """Append tokens to the sequence and run prefill. Returns last-token
        logits [V] (or [T, V] when all_logits).

        top_k > 0 (single-device, no pos_offset): return (vals [top_k],
        ids [top_k]) instead — the candidate download that replaces the
        [128k] f32 logits transfer with 2*top_k floats (TTFT path; a win
        whenever the link is slow — on a fast link the on-device 128k
        sort roughly offsets the saving, see KBENCH prefill anatomy)."""
        self._check_abort()
        if top_k > 0 and (self.mesh is not None or all_logits):
            raise NotImplementedError(
                "prefill(top_k=...) is single-device, last-position only")
        hp = self.model.hp
        t0 = s.n_cached
        n = len(tokens)
        if n == 0:
            # empty ubatch is an error, matching llama_decode's -1
            # (reference llama-context.cpp decode: n_tokens == 0 check)
            raise ValueError("prefill: empty token list")
        slots = s.table.append_tokens(n)
        self._drain_copies([s])
        tb = _bucket(n, TOKEN_BUCKETS)
        tok = np.zeros((1, tb), np.int32)
        tok[0, :n] = tokens
        pos = np.zeros((1, tb), np.int32)
        pos[0, :n] = np.arange(t0, t0 + n)
        slot_arr = np.full((1, tb), -1, np.int32)
        slot_arr[0, :n] = slots
        bt = self._table_arr([s])
        kv_len = np.asarray([t0 + n], np.int32)
        s.tokens.extend(tokens)
        s.n_cached += n
        # batch row layout: group g's rows are [g*M, (g+1)*M); the real
        # prefill row rides microbatch 0, padded rows have slot ids -1 so
        # their KV writes drop
        row = s.group * self.M
        if self.dp > 1 or self.M > 1:
            nrows = self.dp * self.M

            def expand(a, fill):
                out = np.full((nrows,) + a.shape[1:], fill, a.dtype)
                out[row] = a[0]
                return out
            tok, pos, bt = expand(tok, 0), expand(pos, 0), expand(bt, 0)
            slot_arr = expand(slot_arr, -1)
            kv_len = expand(kv_len.reshape(1), 1)
        if all_logits:
            if self._prefill_all_fn is None:
                raise NotImplementedError(
                    "all_logits prefill is not supported on a pipeline mesh")
            if s.pos_offset:
                raise NotImplementedError("all_logits after self_extend")
            logits, self.pools = self._prefill_all_fn(
                self.w, self.pools, tok, pos, bt, slot_arr,
                kv_len)
            return np.asarray(logits[row, :n])
        last_ix = np.zeros((tok.shape[0],), np.int32)
        last_ix[row] = n - 1
        if top_k > 0:
            rd = None
            if s.pos_offset:
                rd = np.full((tok.shape[0],), s.pos_offset, np.int32)
            vals, ids, self.pools = _prefill_topk_step(
                self.w, self.pools, tok, pos, bt, slot_arr,
                kv_len, last_ix, rd, hp=hp, k=top_k)
            return np.asarray(vals[row]), np.asarray(ids[row])
        if s.pos_offset:
            if self.mp:
                raise NotImplementedError(
                    "pos_offset (Self-Extend) is not supported on a "
                    "pipeline mesh; tp/dp meshes and single-device are")
            rd = np.full((tok.shape[0],), s.pos_offset, np.int32)
            fn = self._prefill_rd_fn if self.mesh is not None \
                else self._prefill_fn
            logits, self.pools = fn(
                self.w, self.pools, tok, pos, bt, slot_arr,
                kv_len, last_ix, rd)
        else:
            logits, self.pools = self._prefill_fn(
                self.w, self.pools, tok, pos, bt, slot_arr,
                kv_len, last_ix)
        return np.asarray(logits[row])

    def prefill_embeds(self, s: SeqState, embeds: np.ndarray,
                       placeholder_token: int = -1,
                       mrope_pos: np.ndarray | None = None) -> np.ndarray:
        """Prefill pre-computed input embeddings [T, C] (multimodal image
        features from models/clip.encode_image) instead of tokens — the
        llava_eval_image_embed analogue. The sequence's token list records
        `placeholder_token` for these positions. Returns last-position
        logits [V]. Single-device path."""
        self._check_abort()
        if self.mesh is not None:
            raise NotImplementedError("prefill_embeds: single-device only")
        if s.pos_offset:
            raise NotImplementedError("prefill_embeds after self_extend")
        hp = self.model.hp
        t0 = s.n_cached
        n = embeds.shape[0]
        if n == 0:
            raise ValueError("prefill_embeds: empty embedding list")
        slots = s.table.append_tokens(n)
        self._drain_copies([s])
        tb = _bucket(n, TOKEN_BUCKETS)
        x = np.zeros((1, tb, hp.n_embd), np.float32)
        x[0, :n] = np.asarray(embeds, np.float32)
        pos = np.zeros((1, tb), np.int32)
        pos[0, :n] = np.arange(t0, t0 + n)
        slot_arr = np.full((1, tb), -1, np.int32)
        slot_arr[0, :n] = slots
        bt = self._table_arr([s])
        kv_len = np.asarray([t0 + n], np.int32)
        s.tokens.extend([placeholder_token] * n)
        s.n_cached += n
        last_ix = np.asarray([n - 1], np.int32)
        mr = None
        if mrope_pos is not None:
            # qwen2vl image M-RoPE streams [n, 3]; cache positions (mask
            # order) stay t0..t0+n — only the rotation uses the streams.
            # The CALLER updates s.pos_offset afterwards so following text
            # tokens rope at the compressed position (get_rope_index
            # semantics; reference qwen2vl-cli.cpp:28-60)
            mr = np.zeros((1, tb, 3), np.int32)
            mr[0, :n] = np.asarray(mrope_pos, np.int32)
        logits, self.pools = _prefill_embeds_step(
            self.w, self.pools, jnp.asarray(x), pos, bt,
            slot_arr, kv_len, last_ix, mr, hp=hp)
        return np.asarray(logits[0])

    def embed(self, tokens: list[int], pooling: str | None = None,
              causal: bool | None = None, n_skip: int = 0) -> np.ndarray:
        """Pooled L2-normalized embedding of a token sequence [n_embd].
        Runs single-device, on the ('dp','tp') mesh, or on the pipeline
        mesh (parallel/pp.py 'embed' pipeline pass). causal=False uses
        bidirectional attention (gritlm embedding mode / bert-family
        encoders; single-device). pooling/causal default to the MODEL's
        hparams (bert: non-causal + CLS; decoders: causal + mean)."""
        hp = self.model.hp
        if pooling is None:
            pooling = hp.pooling if hp.pooling != "none" else "mean"
        if causal is None:
            causal = hp.causal
        if (not causal or n_skip) and self.mesh is not None:
            raise NotImplementedError(
                "non-causal / skip-pooled embed: single-device only")
        s = self.new_seq()
        try:
            n = len(tokens)
            if n == 0:
                raise ValueError("embed: empty token list")
            slots = s.table.append_tokens(n)
            self._drain_copies([s])
            tb = _bucket(n, TOKEN_BUCKETS)
            tok = np.zeros((1, tb), np.int32)
            tok[0, :n] = tokens
            pos = np.zeros((1, tb), np.int32)
            pos[0, :n] = np.arange(n)
            slot_arr = np.full((1, tb), -1, np.int32)
            slot_arr[0, :n] = slots
            bt = self._table_arr([s])
            kv_len = np.asarray([n], np.int32)
            n_valid = np.asarray([n], np.int32)
            if self.mesh is not None:
                row = s.group * self.M
                tok, pos, bt, slot_arr, kv_len, n_valid = _expand_rows(
                    self.dp * self.M, row, (tok, 0), (pos, 0), (bt, 0),
                    (slot_arr, -1), (kv_len.reshape(1), 1),
                    (n_valid.reshape(1), 1))
                fn = self._embed_fns.get(pooling)
                if fn is None:
                    if self.mp:
                        fn = self._mp_embed_builder(pooling)
                    else:
                        from ..parallel.tp import build_embed_step

                        fn = build_embed_step(hp, self.mesh,
                                              self.w,
                                              self.pools, pooling)
                    self._embed_fns[pooling] = fn
                emb, self.pools = fn(self.w, self.pools, tok,
                                     pos, bt, slot_arr, kv_len, n_valid)
                return np.asarray(emb[row])
            emb, self.pools = _embed_step(
                self.w, self.pools, tok, pos, bt, slot_arr,
                kv_len, n_valid, np.asarray([n_skip], np.int32),
                hp=hp, pooling=pooling, causal=causal)
            return np.asarray(emb[0])
        finally:
            self.free_seq(s)

    def decode_greedy_loop(self, s: SeqState, first_token: int,
                           n_steps: int) -> list[int]:
        """Generate n_steps tokens greedily in ONE device dispatch
        (single-sequence, single-device path). Feeds first_token, then each
        greedy successor, returning the n_steps generated tokens. The last
        returned token's KV is not yet cached (same contract as decode())."""
        if self.mesh is not None:
            raise NotImplementedError("greedy loop: single-device only")
        hp = self.model.hp
        # reserve blocks for the whole window up front
        s.table.append_tokens(n_steps)
        self._drain_copies([s])
        # pad rows to the qmm kernel's minimum tile_m (8): see
        # _decode_greedy_loop — avoids per-call pad/slice glue
        bsz = max(1, DECODE_PAD_ROWS)
        bt = np.zeros((bsz, self.nbmax), np.int32)
        bt[0] = self._table_arr([s])[0]
        tok0 = np.zeros((bsz,), np.int32)
        tok0[0] = first_token
        pos0 = np.zeros((bsz,), np.int32)
        pos0[0] = s.n_cached
        valid = np.zeros((bsz,), bool)
        valid[0] = True
        toks, self.pools = _decode_greedy_loop(
            self.w, self.pools, tok0, pos0, bt, valid,
            hp=hp, n_steps=n_steps)
        toks = [int(t) for t in np.asarray(toks)[:, 0]]
        s.tokens.append(int(first_token))
        s.tokens.extend(toks[:-1])
        s.n_cached += n_steps
        return toks

    def draft_window(self, seqs: Seq[SeqState], tokens: Seq[int],
                     n_steps: int) -> tuple[np.ndarray, np.ndarray]:
        """Batched greedy proposal loop for speculative drafting: feeds
        tokens[i] to sequence i and generates n_steps greedy successors in
        ONE dispatch, returning ([n_steps, B] tokens, [n_steps, B] probs —
        each token's softmax probability, the draft-confidence signal the
        host truncates on (p_draft_min). All n_steps tokens' KV is cached;
        callers roll back unaccepted tails with truncate_seq.
        Single-device path (draft models are small)."""
        if self.mesh is not None:
            raise NotImplementedError("draft_window: single-device only")
        hp = self.model.hp
        b = len(seqs)
        for s in seqs:
            s.table.append_tokens(n_steps)
        self._drain_copies(seqs)
        bsz = max(DECODE_PAD_ROWS, 1 << (b - 1).bit_length())
        tok0 = np.zeros((bsz,), np.int32)
        pos0 = np.zeros((bsz,), np.int32)
        bt = np.zeros((bsz, self.nbmax), np.int32)
        valid = np.zeros((bsz,), bool)
        valid[:b] = True
        bt_src = self._table_arr(seqs)
        for i, s in enumerate(seqs):
            tok0[i] = tokens[i]
            pos0[i] = s.n_cached
            bt[i] = bt_src[i]
        toks, ps, self.pools = _draft_window_step(
            self.w, self.pools, jnp.asarray(tok0),
            jnp.asarray(pos0), jnp.asarray(bt), jnp.asarray(valid),
            hp=hp, n_steps=n_steps)
        toks = np.asarray(toks)
        for i, s in enumerate(seqs):
            s.tokens.append(int(tokens[i]))
            s.tokens.extend(int(t) for t in toks[:-1, i])
            s.n_cached += n_steps
        return toks[:, :b], np.asarray(ps)[:, :b]

    def prefill_batch(self, seqs: Seq[SeqState],
                      rows: Seq[list[int]]) -> list[np.ndarray]:
        """Teacher-forced batched prefill returning ALL-position logits
        [B, T_i, V] (ragged rows padded on device, sliced on return) — the
        batched verification pass of server-side speculative decoding: one
        dispatch scores every generating slot's proposal (the reference
        packs per-slot spec batches into one llama_decode,
        server.cpp:3250)."""
        self._check_abort()
        hp = self.model.hp
        b = len(seqs)
        if any(s.pos_offset for s in seqs):
            raise NotImplementedError("prefill_batch after self_extend")
        lens = [len(r) for r in rows]
        if min(lens) == 0:
            raise ValueError("prefill_batch: empty token list")
        tb = _bucket(max(lens), TOKEN_BUCKETS)
        slot_rows = [s.table.append_tokens(n) for s, n in zip(seqs, lens)]
        self._drain_copies(seqs)
        by_group: list[list[int]] = [[] for _ in range(self.dp)]
        for i, s in enumerate(seqs):
            by_group[s.group].append(i)
        r = max(1, max(len(g) for g in by_group))
        if self.M > 1:
            b_mb = -(-r // self.M)
            b_mb = 1 << (b_mb - 1).bit_length()
            r = self.M * b_mb
        else:
            r = 1 << (r - 1).bit_length()
        bsz = self.dp * r
        tok = np.zeros((bsz, tb), np.int32)
        pos = np.zeros((bsz, tb), np.int32)
        slot_arr = np.full((bsz, tb), -1, np.int32)
        bt = np.zeros((bsz, self.nbmax), np.int32)
        kv_len = np.ones((bsz,), np.int32)
        rowmap = np.zeros(b, np.int64)
        bt_src = self._table_arr(seqs)
        for g, idxs in enumerate(by_group):
            for j, i in enumerate(idxs):
                row = g * r + j
                rowmap[i] = row
                s = seqs[i]
                n = lens[i]
                tok[row, :n] = rows[i]
                pos[row, :n] = np.arange(s.n_cached, s.n_cached + n)
                slot_arr[row, :n] = slot_rows[i]
                bt[row] = bt_src[i]
                kv_len[row] = s.n_cached + n
        for s, toks_i in zip(seqs, rows):
            s.tokens.extend(toks_i)
            s.n_cached += len(toks_i)
        logits, self.pools = self._prefill_all_fn(
            self.w, self.pools, tok, pos, bt, slot_arr, kv_len)
        logits = np.asarray(logits)
        return [logits[rowmap[i], : lens[i]] for i in range(b)]

    def truncate_seq(self, s: SeqState, n: int) -> None:
        """Roll the sequence's cache back to n tokens (frees trailing blocks).
        Used by the windowed decode path to discard KV written after a stop
        condition — the slot-restorer analogue (reference
        llama-kv-cache.h:192-240) for speculative over-decode."""
        if n > s.n_cached:
            raise ValueError("truncate_seq: n > n_cached")
        s.table.truncate(n)
        s.tokens = s.tokens[:n]
        s.n_cached = n

    def decode_window_async(self, seqs: Seq[SeqState],
                            tokens: Seq[int] | None = None,
                            samplers: Seq[Any] | None = None,
                            n_steps: int = 16, seed: int = 0,
                            histories: Seq[list[int]] | None = None,
                            carry: "WindowHandle | None" = None
                            ) -> "WindowHandle":
        """Dispatch n_steps batched decode+sample steps WITHOUT waiting.

        Returns a WindowHandle; call handle.fetch() to sync and apply host
        state. Pass the previous (unfetched) handle as `carry` to chain the
        next window entirely device-side: its input token and penalty
        history are the previous window's device arrays, so the dispatch
        happens BEFORE the previous window's results ever reach the host —
        the device computes window k+1 while the host post-processes
        window k (the host/device double-buffering the reference applies
        between pipeline stages, ggml-backend.cpp:662-667, applied to the
        serving loop). The chained window speculates that no sequence stops
        mid-window; callers roll back stopped rows with truncate_seq."""
        from . import device_sampling as ds

        self._check_abort()
        if any(s.pos_offset for s in seqs):
            raise NotImplementedError("decode_window after self_extend")
        hp = self.model.hp
        b = len(seqs)
        for s in seqs:
            s.table.append_tokens(n_steps)
        self._drain_copies(seqs)
        bt = None
        if carry is not None:
            if carry.seqs is not seqs and list(carry.seqs) != list(seqs):
                raise ValueError("carry must cover the same sequences")
            rowmap, bsz = carry.rowmap, carry.bsz
            bt = np.zeros((bsz, self.nbmax), np.int32)
            bt_src = self._table_arr(seqs)
            for i in range(b):
                bt[rowmap[i]] = bt_src[i]
            handle = WindowHandle(
                seqs=list(seqs), n_steps=n_steps, rowmap=rowmap, bsz=bsz,
                params=carry.params, valid=carry.valid, key=carry.key,
                pos0=carry.pos0 + carry.n_steps, prev=carry)
            tok0_dev = carry.toks_dev[-1]
            hist_dev = carry.hist_dev
        else:
            # row layout: group g's rows at [g*r, (g+1)*r), r = pow2 bucket
            # of the max group load (matches decode(); dp == 1 keeps 0..b-1)
            by_group: list[list[int]] = [[] for _ in range(self.dp)]
            for i, s in enumerate(seqs):
                by_group[s.group].append(i)
            r = max(1, max(len(g) for g in by_group))
            if self.M > 1:
                # pipeline mesh: rows per group = M microbatches x pow2 rows
                b_mb = -(-r // self.M)
                b_mb = 1 << (b_mb - 1).bit_length()
                r = self.M * b_mb
            else:
                r = 1 << (r - 1).bit_length()
                if self.mesh is None:
                    # qmm's minimum row tile is 8: padding the batch there
                    # (instead of inside every projection call) removes the
                    # per-call pad/slice glue (see _decode_greedy_loop)
                    r = max(r, DECODE_PAD_ROWS)
            bsz = self.dp * r
            tok0 = np.zeros((bsz,), np.int32)
            pos0 = np.zeros((bsz,), np.int32)
            bt = np.zeros((bsz, self.nbmax), np.int32)
            valid = np.zeros((bsz,), bool)
            bt_src = self._table_arr(seqs)
            hist_rows: list[list[int]] = [[] for _ in range(bsz)]
            sampler_rows: list[Any | None] = [None] * bsz
            rowmap = np.zeros(b, np.int64)
            for g, idxs in enumerate(by_group):
                for j, i in enumerate(idxs):
                    row = g * r + j
                    rowmap[i] = row
                    s = seqs[i]
                    tok0[row] = tokens[i]
                    pos0[row] = s.n_cached
                    bt[row] = bt_src[i]
                    valid[row] = True
                    hist_rows[row] = list(s.tokens) if histories is None \
                        else list(histories[i])
                    sampler_rows[row] = samplers[i]
            from .sampling import SamplerParams

            greedy = SamplerParams(temp=0.0)
            params = ds.DeviceSamplerParams.from_rows(
                [sp if sp is not None else greedy for sp in sampler_rows],
                bsz)
            handle = WindowHandle(
                seqs=list(seqs), n_steps=n_steps, rowmap=rowmap, bsz=bsz,
                params=params, valid=jnp.asarray(valid),
                key=jax.random.PRNGKey(seed), pos0=pos0,
                fed=[int(t) for t in tokens])
            tok0_dev = jnp.asarray(tok0)
            hist_dev = jnp.asarray(ds.make_history(hist_rows, bsz))
        if self.mesh is not None:
            toks, hist, self.pools = self._window_fn(n_steps)(
                self.w, self.pools, tok0_dev,
                jnp.asarray(handle.pos0), jnp.asarray(bt), handle.valid,
                handle.params, hist_dev, handle.key)
        else:
            toks, hist, self.pools = _decode_window_step(
                self.w, self.pools, tok0_dev,
                jnp.asarray(handle.pos0), jnp.asarray(bt), handle.valid,
                handle.params, hist_dev, handle.key, hp=hp, n_steps=n_steps)
        handle.toks_dev = toks
        handle.hist_dev = hist
        return handle

    def decode_window(self, seqs: Seq[SeqState], tokens: Seq[int],
                      samplers: Seq[Any], n_steps: int,
                      seed: int = 0,
                      histories: Seq[list[int]] | None = None) -> np.ndarray:
        """n_steps batched decode+sample steps in ONE device dispatch.

        tokens[i] is sequence i's next input token; samplers[i] is a
        SamplerParams eligible for device sampling (device_sampling.eligible).
        histories[i] seeds row i's penalty ring — pass the GENERATED tokens
        only to match the host SamplerChain, which accept()s sampled tokens
        but never prompt tokens (defaults to s.tokens = prompt + generated,
        for standalone use where the whole context should be penalized).
        Returns [n_steps, B] int32: step j's row i is the token sampled after
        feeding j prior tokens. All n_steps tokens' KV except the last is
        cached on return (same contract as decode_greedy_loop); callers that
        stop early must truncate_seq back to the accepted length.
        Runs single-device, on the ('dp','tp') mesh
        (parallel/tp.build_window_step), or on the dpxppxspxepxtp pipeline
        mesh (parallel/pp make_window: each step is a full pipelined pass,
        sampled identically on every device)."""
        return self.decode_window_async(
            seqs, tokens, samplers, n_steps, seed, histories).fetch()

    def prefill_nll(self, s: SeqState, tokens: list[int]) -> np.ndarray:
        """Prefill `tokens` and return per-position NLL of predicting
        tokens[i+1] from the prefix through tokens[i] (length n-1).
        Runs single-device or on the ('dp','tp') mesh (perplexity
        tooling)."""
        hp = self.model.hp
        t0 = s.n_cached
        n = len(tokens)
        if n < 2:
            raise ValueError("prefill_nll needs >= 2 tokens")
        slots = s.table.append_tokens(n)
        self._drain_copies([s])
        tb = _bucket(n, TOKEN_BUCKETS)
        tok = np.zeros((1, tb), np.int32)
        tok[0, :n] = tokens
        pos = np.zeros((1, tb), np.int32)
        pos[0, :n] = np.arange(t0, t0 + n)
        slot_arr = np.full((1, tb), -1, np.int32)
        slot_arr[0, :n] = slots
        bt = self._table_arr([s])
        kv_len = np.asarray([t0 + n], np.int32)
        targets = np.zeros((1, tb), np.int32)
        targets[0, : n - 1] = tokens[1:]
        valid = np.zeros((1, tb), bool)
        valid[0, : n - 1] = True
        s.tokens.extend(tokens)
        s.n_cached += n
        if self.mesh is not None:
            row = s.group * self.M
            tok, pos, bt, slot_arr, kv_len, targets, valid = _expand_rows(
                self.dp * self.M, row, (tok, 0), (pos, 0), (bt, 0),
                (slot_arr, -1), (kv_len.reshape(1), 1), (targets, 0),
                (valid, False))
            if self._nll_fn is None:
                from ..parallel.tp import build_nll_step

                self._nll_fn = build_nll_step(hp, self.mesh,
                                              self.w, self.pools)
            nll, self.pools = self._nll_fn(
                self.w, self.pools, tok, pos, bt, slot_arr,
                kv_len, targets, valid)
            return np.asarray(nll[row, : n - 1])
        nll, self.pools = _prefill_nll_step(
            self.w, self.pools, tok, pos, bt, slot_arr, kv_len,
            targets, valid, hp=hp)
        return np.asarray(nll[0, : n - 1])

    def decode(self, seqs: Seq[SeqState], tokens: Seq[int],
               top_k: int = 0):
        """One decode step for a batch of sequences. Returns logits [B, V]
        in the caller's order. Rows are arranged so each dp group's pinned
        sequences land on its shard of the batch axis.

        top_k > 0 (single-device only): return (vals [B, top_k],
        ids [B, top_k]) instead of full logits — the candidate-download
        path for host-chain sampling over a slow device link."""
        if top_k > 0 and self.mesh is not None:
            raise NotImplementedError(
                "decode(top_k=...) is single-device; mesh callers download "
                "full logits")
        self._check_abort()
        hp = self.model.hp
        b = len(seqs)
        slot_list = []
        for s, t in zip(seqs, tokens):
            slot_list.append(s.table.append_tokens(1)[0])
        self._drain_copies(seqs)
        # arrange: group g occupies rows [g*r, (g+1)*r), r = max group load
        by_group: list[list[int]] = [[] for _ in range(self.dp)]
        for i, s in enumerate(seqs):
            by_group[s.group].append(i)
        # bucket rows-per-group to powers of two: a continuous-batching server
        # varies batch size every step, and each size is a fresh XLA program
        # (the analogue of worst-case graph reservation, llama-context.cpp:289)
        r = max(1, max(len(g) for g in by_group))
        if self.M > 1:
            # pipeline mesh: rows per group = M microbatches x pow2 rows each
            b_mb = -(-r // self.M)
            b_mb = 1 << (b_mb - 1).bit_length()
            r = self.M * b_mb
        else:
            r = 1 << (r - 1).bit_length()
            if self.mesh is None:
                # min rows: qmm tile_m floor (see _decode_greedy_loop)
                r = max(r, DECODE_PAD_ROWS)
        bsz = self.dp * r
        tok = np.zeros((bsz, 1), np.int32)
        pos = np.zeros((bsz, 1), np.int32)
        slot_arr = np.full((bsz, 1), -1, np.int32)
        bt = np.zeros((bsz, self.nbmax), np.int32)
        kv_len = np.ones((bsz,), np.int32)
        rowmap = np.zeros(b, np.int64)
        bt_src = self._table_arr(seqs)
        for g, idxs in enumerate(by_group):
            for j, i in enumerate(idxs):
                row = g * r + j
                rowmap[i] = row
                s = seqs[i]
                tok[row, 0] = tokens[i]
                pos[row, 0] = s.n_cached
                slot_arr[row, 0] = slot_list[i]
                bt[row] = bt_src[i]
                kv_len[row] = s.n_cached + 1
        rd = None
        if any(s.pos_offset for s in seqs):
            if self.mp:
                raise NotImplementedError(
                    "pos_offset (Self-Extend) is not supported on a "
                    "pipeline mesh; tp/dp meshes and single-device are")
            rd = np.zeros((bsz,), np.int32)
            for i, s in enumerate(seqs):
                rd[rowmap[i]] = s.pos_offset
        for s, t in zip(seqs, tokens):
            s.tokens.append(int(t))
            s.n_cached += 1
        if top_k > 0:
            vals, ids, self.pools = _decode_topk_step(
                self.w, self.pools, tok, pos, bt, slot_arr, kv_len, rd,
                hp=hp, k=top_k)
            return np.asarray(vals)[rowmap], np.asarray(ids)[rowmap]
        if rd is not None:
            fn = self._decode_rd_fn if self.mesh is not None \
                else self._decode_fn
            logits, self.pools = fn(
                self.w, self.pools, tok, pos, bt, slot_arr,
                kv_len, rd)
        else:
            logits, self.pools = self._decode_fn(
                self.w, self.pools, tok, pos, bt, slot_arr,
                kv_len)
        return np.asarray(logits)[rowmap]


def generate(ctx: Context, prompt_tokens: list[int], max_new_tokens: int,
             sampler: Callable[[np.ndarray], int] | None = None,
             eos_ids: set[int] | None = None,
             n_keep: int = 0, ctx_shift: bool = True) -> Iterator[int]:
    """llama-cli style generation loop (reference examples/main/main.cpp),
    including context shift past n_ctx (main.cpp:583-608: keep n_keep head
    tokens, discard half of the rest, K-shift the tail down)."""
    if sampler is None:
        sampler = lambda logits: int(np.argmax(logits))
    s = ctx.new_seq()
    try:
        logits = ctx.prefill(s, prompt_tokens)
        for _ in range(max_new_tokens):
            tok = sampler(logits)
            if eos_ids and tok in eos_ids:
                break
            yield tok
            if ctx_shift and s.n_cached + 1 >= ctx.n_ctx \
                    and not ctx.mp:
                nk = min(n_keep, s.n_cached - 2)
                ctx.shift_context(s, nk, max((s.n_cached - nk) // 2, 1))
            logits = ctx.decode([s], [tok])[0]
    finally:
        ctx.free_seq(s)
