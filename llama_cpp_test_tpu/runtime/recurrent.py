"""Recurrent-state multi-sequence context: mamba in the scheduler/server.

The reference serves state-space models through the SAME llama-server
path as attention models by giving the KV cache a recurrent mode, where
each sequence owns one state cell instead of a token ring
(llama-kv-cache.h:146, llama_kv_cell per-seq states; batch splitting
switches to split_equal, llama-batch.h:68). This module is that mode's
TPU-native analogue: a device-resident STATE POOL of [n_seq_max + 1]
rows (conv tail + SSM state per layer), sequences indexed by row, with

  - prefill: one jitted masked lax.scan over a token bucket that reads
    and writes a single pool row (length padding never advances state),
  - decode:  one jitted batched step — gather B rows, vmap the mixer
    chain, scatter back (padded batch rows target a scratch row).

The surface matches what runtime/scheduler.py needs from the paged
Context (new_seq/free_seq/prefill/decode/shift_context + hparams), so
the SAME continuous-batching scheduler, sampler chains, grammar, stop
strings, and server endpoints run unchanged. Capability flags tell the
scheduler which fast paths do not apply to recurrent state:

  supports_windows       False — windowed device decode needs the paged
                         KV window kernels; recurrent decode is already
                         one dispatch per batch step
  supports_candidates    False — the all-rejected fallback rewinds one
                         token (truncate_seq), and a recurrent state
                         update cannot be undone without checkpointing
  supports_prefix_reuse  False — prompt-cache reuse truncates to an
                         interior position, same impossibility (the
                         reference likewise refuses partial seq_rm for
                         recurrent caches)

Context shift IS supported, and better than the paged engine's: the
state already summarizes discarded history, so shifting is pure
bookkeeping (no K-shift graph); positions never enter the math.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

import typing

from ..models.mamba import MambaHParams, MambaModel, _layer_ws, _mixer_step
from ..ops import layers
from .engine import TOKEN_BUCKETS, _bucket


class RecurrentArch(typing.NamedTuple):
    """Static (hashable) recipe binding a recurrent model family to the
    pooled scheduler context: a per-token chain over all layers and the
    final-norm + LM head. Functions are module-level so the NamedTuple
    hashes stably as a jit static argument."""
    chain: typing.Callable    # (wt, state_tuple, tok, hp) -> (x, state')
    head: typing.Callable     # (wt, x [..., C], hp) -> logits [..., V]


# -- mamba ------------------------------------------------------------------

def _mamba_chain(wt, state, tok, hp):
    """conv [L, di, K-1], ssm [L, di, N] -> (hidden [C], state')."""
    tok_embd, out_norm, out_w, layer_ws = wt
    conv, ssm = state
    x = tok_embd[tok]
    new_conv, new_ssm = [], []
    for li, ws in enumerate(layer_ws):
        x, c1, s1 = _mixer_step(ws, conv[li], ssm[li], x, hp=hp)
        new_conv.append(c1)
        new_ssm.append(s1)
    return x, (jnp.stack(new_conv), jnp.stack(new_ssm))


def _mamba_head(wt, x, hp):
    tok_embd, out_norm, out_w, layer_ws = wt
    xn = layers.rms_norm(x[..., None, :], out_norm, hp.rms_eps)[..., 0, :]
    return xn @ out_w.T


def _rwkv6_chain(wt, state, tok, hp):
    from ..models import rwkv6
    return rwkv6.token_chain(wt, state, tok, hp=hp)


def _rwkv6_head(wt, x, hp):
    from ..models import rwkv6
    return rwkv6.head(wt, x, hp=hp)


def _rwkv7_chain(wt, state, tok, hp):
    from ..models import rwkv7
    return rwkv7.token_chain(wt, state, tok, hp=hp)


def _rwkv7_head(wt, x, hp):
    from ..models import rwkv7
    return rwkv7.head(wt, x, hp=hp)


MAMBA_ARCH = RecurrentArch(_mamba_chain, _mamba_head)
RWKV6_ARCH = RecurrentArch(_rwkv6_chain, _rwkv6_head)
RWKV7_ARCH = RecurrentArch(_rwkv7_chain, _rwkv7_head)


@functools.partial(jax.jit, static_argnames=("arch", "hp"),
                   donate_argnums=(1,))
def _rec_prefill(wt, pool, sid, tokens, n_valid, *, arch: RecurrentArch,
                 hp):
    """tokens [Tb] (bucket-padded) through pool row sid; steps at
    t >= n_valid keep the state unchanged. Returns (logits [V] of the
    last VALID position, pool')."""
    state0 = tuple(p[sid] for p in pool)
    n_embd = wt[0].shape[-1]

    def step(carry, inp):
        state, last_x = carry
        tok, t = inp
        x, state1 = arch.chain(wt, state, tok, hp)
        upd = t < n_valid
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(upd, a, b), state1, state)
        return (state, jnp.where(upd, x, last_x)), None

    init = (state0, jnp.zeros((n_embd,), jnp.float32))
    (state, x), _ = jax.lax.scan(
        step, init, (tokens, jnp.arange(tokens.shape[0], dtype=jnp.int32)))
    logits = arch.head(wt, x, hp)
    return logits, tuple(p.at[sid].set(s) for p, s in zip(pool, state))


@functools.partial(jax.jit, static_argnames=("arch", "hp"),
                   donate_argnums=(1,))
def _rec_decode(wt, pool, sids, toks, *, arch: RecurrentArch, hp):
    """Batched single-token step. sids/toks [Bb]; padded rows carry the
    scratch sid (row n_seq_max) so their scatter never clobbers a live
    sequence. Returns (logits [Bb, V], pool')."""

    def one(state, tok):
        return arch.chain(wt, state, tok, hp)

    x, state1 = jax.vmap(one)(tuple(p[sids] for p in pool), toks)
    logits = arch.head(wt, x, hp)               # [Bb, V] on the MXU
    return logits, tuple(p.at[sids].set(s) for p, s in zip(pool, state1))


class _NullMgr:
    """Block-manager stand-in: recurrent state is O(1) per sequence, so
    block-count admission control never binds (slot count is the limit)."""

    def num_free(self) -> int:
        return 1 << 30


@dataclasses.dataclass
class _NullTable:
    blocks: tuple = ()

    def release(self) -> None:
        pass


@dataclasses.dataclass
class RecurrentSeq:
    seq_id: int
    row: int                       # state-pool row
    tokens: list
    n_cached: int = 0
    pos_offset: int = 0            # Self-Extend never applies (no rope)
    table: _NullTable = dataclasses.field(default_factory=_NullTable)


class RecurrentContext:
    """Scheduler-compatible context over a recurrent state pool."""

    supports_windows = False
    supports_candidates = False
    supports_prefix_reuse = False
    supports_window_chaining = False
    mesh = None
    mp = False

    def __init__(self, model, n_ctx: int = 4096,
                 n_seq_max: int = 8, **_ignored):
        self.model = model
        self.n_ctx = n_ctx
        self.n_seq_max = n_seq_max
        self.block_size = 1
        self.num_blocks = n_seq_max      # /metrics: state rows, not blocks
        self.mgrs = [_NullMgr()]
        hp = model.hp
        rows = n_seq_max + 1           # last row = decode-padding scratch
        if isinstance(model, MambaModel):
            self.arch = MAMBA_ARCH
            self._wt = (
                jnp.asarray(model.weights.tok_embd, jnp.float32),
                jnp.asarray(model.weights.output_norm, jnp.float32),
                jnp.asarray(model.weights.output, jnp.float32),
                tuple(tuple(jnp.asarray(a, jnp.float32)
                            for a in _layer_ws(ly))
                      for ly in model.weights.layers),
            )
            state0 = (
                jnp.zeros((hp.n_layer, hp.d_inner, hp.d_conv - 1),
                          jnp.float32),
                jnp.zeros((hp.n_layer, hp.d_inner, hp.d_state),
                          jnp.float32),
            )
        else:
            # rwkv families: reuse the model Contexts' weight tuples +
            # zero_state shapes (models/rwkv6.py, models/rwkv7.py)
            from ..models.rwkv6 import Rwkv6Context, Rwkv6Model
            from ..models.rwkv7 import Rwkv7Context, Rwkv7Model
            if isinstance(model, Rwkv6Model):
                self.arch = RWKV6_ARCH
                self._wt = Rwkv6Context(model)._wt
                from ..models.rwkv6 import zero_state
            elif isinstance(model, Rwkv7Model):
                self.arch = RWKV7_ARCH
                self._wt = Rwkv7Context(model)._wt
                from ..models.rwkv7 import zero_state
            else:
                raise TypeError(f"unsupported recurrent model {model!r}")
            state0 = zero_state(hp)
        self.pool = tuple(
            jnp.zeros((rows,) + z.shape, z.dtype) for z in state0)
        self._free_rows = list(range(n_seq_max))
        self._next_id = 0
        self.seqs: dict[int, RecurrentSeq] = {}

    # -- sequence lifecycle ------------------------------------------------

    def new_seq(self) -> RecurrentSeq:
        if not self._free_rows:
            raise RuntimeError("no free recurrent state rows")
        row = self._free_rows.pop()
        self.pool = tuple(p.at[row].set(0.0) for p in self.pool)
        s = RecurrentSeq(self._next_id, row, [])
        self._next_id += 1
        self.seqs[s.seq_id] = s
        return s

    def free_seq(self, s: RecurrentSeq) -> None:
        if s.seq_id in self.seqs:
            self.seqs.pop(s.seq_id)
            self._free_rows.append(s.row)

    # -- compute -----------------------------------------------------------

    def prefill(self, s: RecurrentSeq, tokens: list,
                all_logits: bool = False) -> np.ndarray:
        if all_logits:
            raise NotImplementedError("recurrent prefill returns the last "
                                      "position only")
        n = len(tokens)
        if n == 0:
            raise ValueError("prefill: empty token list")
        tb = _bucket(n, TOKEN_BUCKETS)
        tok = np.zeros((tb,), np.int32)
        tok[:n] = tokens
        logits, self.pool = _rec_prefill(
            self._wt, self.pool, np.int32(s.row), tok, np.int32(n),
            arch=self.arch, hp=self.model.hp)
        s.tokens.extend(int(t) for t in tokens)
        s.n_cached += n
        return np.asarray(logits)

    def decode(self, seqs: list, tokens: list) -> np.ndarray:
        b = len(seqs)
        bb = 1 << max(0, (b - 1)).bit_length()
        sids = np.full((bb,), self.n_seq_max, np.int32)   # scratch row
        toks = np.zeros((bb,), np.int32)
        for i, (s, t) in enumerate(zip(seqs, tokens)):
            sids[i] = s.row
            toks[i] = int(t)
        logits, self.pool = _rec_decode(self._wt, self.pool, sids, toks,
                                        arch=self.arch, hp=self.model.hp)
        for s, t in zip(seqs, tokens):
            s.tokens.append(int(t))
            s.n_cached += 1
        return np.asarray(logits)[:b]

    # -- maintenance -------------------------------------------------------

    def shift_context(self, s: RecurrentSeq, n_keep: int,
                      n_discard: int) -> None:
        """Drop history bookkeeping; the state already summarizes it and
        positions never enter the recurrence (the reference refuses
        seq_add for recurrent caches — here it is simply free)."""
        del s.tokens[n_keep:n_keep + n_discard]
        s.n_cached -= n_discard

    def truncate_seq(self, s: RecurrentSeq, n: int) -> None:
        raise NotImplementedError(
            "recurrent state cannot rewind (supports_candidates=False "
            "keeps the scheduler off every truncating path)")

    def abort(self) -> None:
        pass

    def _check_abort(self) -> None:
        pass
