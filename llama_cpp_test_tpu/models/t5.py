"""T5 encoder-decoder family (reference llm_build_t5_enc / llm_build_t5_dec,
llama-model.cpp; arches t5 + t5encoder, llama-arch.cpp T5 tensor table).

The reference serves T5 through llama_encode() (encoder pass, output
cached as cross-attention source) followed by llama_decode() steps whose
blocks interleave self-attention, cross-attention over the encoder
output, and FFN. This module is that surface, TPU-first:

  - encoder: ONE jitted dispatch — bidirectional self-attention with the
    learned relative-position bucket bias (shared from layer 0, as in
    HF where only block 0 has_relative_attention_bias), RMS norms,
    NO 1/sqrt(d) attention scale (T5's convention), relu or gated-gelu
    FFN (v1.1), d_kv decoupled from d_model/n_head.
  - decoder: cross k/v are projected from the encoder output once at
    encode time; generation steps run a jitted step function over a
    PREALLOCATED self-KV cache [L, Tmax, H, dkv] with a position mask,
    so every step reuses one compiled program (no per-length recompile).
    The unidirectional relative bucket is computed inside jit (pure
    arithmetic — log-spaced buckets, HF _relative_position_bucket).

Scope mirrors the reference's T5 support: llama-cli-style encode +
greedy/sampled decode and encoder-only embeddings (t5encoder). The
paged multi-sequence scheduler does not host encoder-decoder models
(the reference's server does not either).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import open_gguf
from ..ops import layers
from ..tokenizer import load_tokenizer


@dataclasses.dataclass(frozen=True)
class T5HParams:
    arch: str                 # "t5" | "t5encoder"
    n_vocab: int
    n_embd: int               # d_model
    n_layer: int
    n_head: int
    d_kv: int                 # per-head dim (decoupled from d_model)
    n_ff: int
    n_buckets: int
    rms_eps: float
    dec_start_token: int
    gated: bool               # v1.1 gated-gelu vs original relu


@dataclasses.dataclass
class T5Block:
    attn_norm: np.ndarray
    wq: np.ndarray            # [H*dkv, C]
    wk: np.ndarray
    wv: np.ndarray
    wo: np.ndarray            # [C, H*dkv]
    rel_b: np.ndarray | None  # [n_buckets, H] (layer 0; shared)
    # decoder-only cross attention
    cross_norm: np.ndarray | None = None
    cross_wq: np.ndarray | None = None
    cross_wk: np.ndarray | None = None
    cross_wv: np.ndarray | None = None
    cross_wo: np.ndarray | None = None
    ffn_norm: np.ndarray | None = None
    w_gate: np.ndarray | None = None   # v1.1 wi_0
    w_up: np.ndarray | None = None     # wi / wi_1
    w_down: np.ndarray | None = None   # wo


class T5Model:
    """Loaded t5/t5encoder GGUF (reference T5Model / T5EncoderModel
    converter output naming: enc.blk.* / dec.blk.* / token_embd)."""

    def __init__(self, path: str):
        self.path = path
        r = open_gguf(path)
        self.reader = r
        md = r.metadata
        arch = md.get("general.architecture")
        if arch not in ("t5", "t5encoder"):
            raise ValueError(f"not a t5 GGUF (arch {arch!r})")

        def g(key, default=None):
            v = md.get(f"{arch}.{key}", default)
            if v is None:
                raise KeyError(f"t5 GGUF missing {arch}.{key}")
            return v

        toks = md.get("tokenizer.ggml.tokens")
        n_vocab = int(md.get(f"{arch}.vocab_size",
                             len(toks) if toks is not None else 0))
        gated = "enc.blk.0.ffn_gate.weight" in r.tensors or \
            "dec.blk.0.ffn_gate.weight" in r.tensors
        self.hp = T5HParams(
            arch=arch,
            n_vocab=n_vocab,
            n_embd=int(g("embedding_length")),
            n_layer=int(g("block_count")),
            n_head=int(g("attention.head_count")),
            d_kv=int(g("attention.key_length")),
            n_ff=int(g("feed_forward_length")),
            n_buckets=int(g("attention.relative_buckets_count", 32)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
            dec_start_token=int(g("decoder_start_token_id", 0)),
            gated=gated,
        )

        def t(name):
            a = r.dequantize(name, np.float32)
            info = r.tensors[name]
            if len(info.shape) > 1:
                a = a.reshape(tuple(reversed(info.shape)))
            return a

        def opt(name):
            return t(name) if name in r.tensors else None

        def blocks(prefix, dec):
            out = []
            for i in range(self.hp.n_layer):
                p = f"{prefix}.blk.{i}."
                b = T5Block(
                    attn_norm=t(p + "attn_norm.weight"),
                    wq=t(p + "attn_q.weight"),
                    wk=t(p + "attn_k.weight"),
                    wv=t(p + "attn_v.weight"),
                    wo=t(p + "attn_o.weight"),
                    rel_b=opt(p + "attn_rel_b.weight"),
                    ffn_norm=t(p + "ffn_norm.weight"),
                    w_gate=opt(p + "ffn_gate.weight"),
                    w_up=t(p + "ffn_up.weight"),
                    w_down=t(p + "ffn_down.weight"),
                )
                if dec:
                    b.cross_norm = t(p + "cross_attn_norm.weight")
                    b.cross_wq = t(p + "cross_attn_q.weight")
                    b.cross_wk = t(p + "cross_attn_k.weight")
                    b.cross_wv = t(p + "cross_attn_v.weight")
                    b.cross_wo = t(p + "cross_attn_o.weight")
                out.append(b)
            return out

        self.tok_embd = t("token_embd.weight")
        self.enc = blocks("enc", dec=False)
        self.enc_norm = t("enc.output_norm.weight")
        self.dec = None
        self.dec_norm = None
        self.output = None
        if arch == "t5":
            self.dec = blocks("dec", dec=True)
            self.dec_norm = t("dec.output_norm.weight")
            # tied head (original T5) scales hidden by d_model^-0.5
            self.output = opt("output.weight")
        try:
            self.tokenizer = load_tokenizer(r)
        except Exception:
            self.tokenizer = None


def _rel_bucket(rel, *, bidirectional: bool, n_buckets: int,
                max_distance: int = 128):
    """HF T5Attention._relative_position_bucket in jnp. rel = mem_pos -
    query_pos."""
    nb = n_buckets
    b = 0
    if bidirectional:
        nb = nb // 2
        b = jnp.where(rel > 0, nb, 0)
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return b + jnp.where(is_small, rel, large)


def _block_attn(x, b: T5Block, hp: T5HParams, bias):
    """Self-attention half of a T5 block over full [T, C] x (encoder and
    teacher-forced decoder). bias [H, T, T] already masked."""
    h, dkv = hp.n_head, hp.d_kv
    cur = layers.rms_norm(x[None], b.attn_norm, hp.rms_eps)[0]
    q = (cur @ b.wq.T).reshape(-1, h, dkv)
    k = (cur @ b.wk.T).reshape(-1, h, dkv)
    v = (cur @ b.wv.T).reshape(-1, h, dkv)
    # T5 applies NO 1/sqrt(d) scale (folded into init)
    logits = jnp.einsum("qhd,khd->hqk", q, k) + bias
    att = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", att, v).reshape(-1, h * dkv)
    return x + o @ b.wo.T


def _block_ffn(x, b: T5Block, hp: T5HParams):
    cur = layers.rms_norm(x[None], b.ffn_norm, hp.rms_eps)[0]
    if hp.gated:
        act = jax.nn.gelu(cur @ b.w_gate.T, approximate=True)
        cur = act * (cur @ b.w_up.T)
    else:
        cur = jax.nn.relu(cur @ b.w_up.T)
    return x + cur @ b.w_down.T


@functools.partial(jax.jit, static_argnames=("hp",))
def _encode(wt, tokens, n_valid, *, hp: T5HParams):
    """Encoder over a padded token bucket -> hidden [Tb, C]; padded
    positions masked out of attention."""
    tok_embd, enc_norm, blocks = wt
    tb = tokens.shape[0]
    x = tok_embd[tokens]
    pos = jnp.arange(tb)
    rel = pos[None, :] - pos[:, None]          # mem - query
    buckets = _rel_bucket(rel, bidirectional=True, n_buckets=hp.n_buckets)
    rel_b = blocks[0][5]                        # layer-0 table [nb, H]
    bias = rel_b[buckets].transpose(2, 0, 1)    # [H, T, T]
    bias = jnp.where((pos < n_valid)[None, None, :], bias, -1e9)
    for bw in blocks:
        b = T5Block(*bw)
        x = _block_attn(x, b, hp, bias)
        x = _block_ffn(x, b, hp)
    return layers.rms_norm(x[None], enc_norm, hp.rms_eps)[0]


@functools.partial(jax.jit, static_argnames=("hp",))
def _cross_kv(wt_dec, enc_out, *, hp: T5HParams):
    """Project encoder output into per-layer cross k/v once."""
    ks, vs = [], []
    for bw in wt_dec:
        b = T5Block(*bw)
        ks.append((enc_out @ b.cross_wk.T)
                  .reshape(-1, hp.n_head, hp.d_kv))
        vs.append((enc_out @ b.cross_wv.T)
                  .reshape(-1, hp.n_head, hp.d_kv))
    return jnp.stack(ks), jnp.stack(vs)        # [L, S, H, dkv]


@functools.partial(jax.jit, static_argnames=("hp",),
                   donate_argnums=(3,))
def _decode_step(wt_dec_head, tok, t_idx, cache, cross_k, cross_v,
                 n_enc_valid, *, hp: T5HParams):
    """One decoder token at position t_idx. cache = (k [L, Tmax, H, d],
    v likewise); returns (logits [V], cache')."""
    tok_embd, dec_norm, out_w, blocks = wt_dec_head
    ck, cv = cache
    h, dkv = hp.n_head, hp.d_kv
    tmax = ck.shape[1]
    x = tok_embd[tok]
    pos = jnp.arange(tmax)
    rel = pos - t_idx                            # mem - query
    buckets = _rel_bucket(rel, bidirectional=False, n_buckets=hp.n_buckets)
    rel_tab = blocks[0][5]
    self_mask = jnp.where(pos <= t_idx, 0.0, -1e9)      # causal+valid
    enc_pos = jnp.arange(cross_k.shape[1])
    cross_mask = jnp.where(enc_pos < n_enc_valid, 0.0, -1e9)
    for li, bw in enumerate(blocks):
        b = T5Block(*bw)
        # self-attention with kv append
        cur = layers.rms_norm(x[None, None], b.attn_norm, hp.rms_eps)[0, 0]
        q = (b.wq @ cur).reshape(h, dkv)
        kn = (b.wk @ cur).reshape(h, dkv)
        vn = (b.wv @ cur).reshape(h, dkv)
        ck = ck.at[li, t_idx].set(kn)
        cv = cv.at[li, t_idx].set(vn)
        bias = rel_tab[buckets].T + self_mask[None, :]   # [H, Tmax]
        logits = jnp.einsum("hd,thd->ht", q, ck[li]) + bias
        att = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("ht,thd->hd", att, cv[li]).reshape(h * dkv)
        x = x + b.wo @ o
        # cross-attention over the encoder output
        cur = layers.rms_norm(x[None, None], b.cross_norm,
                              hp.rms_eps)[0, 0]
        q = (b.cross_wq @ cur).reshape(h, dkv)
        logits = jnp.einsum("hd,shd->hs", q, cross_k[li]) \
            + cross_mask[None, :]
        att = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("hs,shd->hd", att, cross_v[li]).reshape(h * dkv)
        x = x + b.cross_wo @ o
        # ffn
        cur = layers.rms_norm(x[None, None], b.ffn_norm, hp.rms_eps)[0, 0]
        if hp.gated:
            cur = jax.nn.gelu(b.w_gate @ cur, approximate=True) \
                * (b.w_up @ cur)
        else:
            cur = jax.nn.relu(b.w_up @ cur)
        x = x + b.w_down @ cur
    xn = layers.rms_norm(x[None, None], dec_norm, hp.rms_eps)[0, 0]
    if out_w is None:
        # tied head: T5 scales hidden by d_model^-0.5 before the shared
        # embedding matmul (HF T5ForConditionalGeneration tie path)
        logits = tok_embd @ (xn * (hp.n_embd ** -0.5))
    else:
        logits = out_w @ xn
    return logits, (ck, cv)


def _blk_tuple(b: T5Block) -> tuple:
    # field order matters: T5Block(*tuple) reconstructs it at trace time
    # (dataclasses.astuple would deepcopy every array)
    return tuple(
        None if a is None else jnp.asarray(a)
        for a in (b.attn_norm, b.wq, b.wk, b.wv, b.wo, b.rel_b,
                  b.cross_norm, b.cross_wq, b.cross_wk, b.cross_wv,
                  b.cross_wo, b.ffn_norm, b.w_gate, b.w_up, b.w_down))


class T5Context:
    """encode + stepwise decode over one sequence (llama-cli's T5 flow:
    llama_encode then the decode loop seeded with decoder_start_token)."""

    def __init__(self, model: T5Model, n_ctx: int = 512):
        self.model = model
        self.n_ctx = n_ctx
        hp = model.hp
        # share the layer-0 bias table into every block tuple slot
        def share_rel(blks):
            rel = next(b.rel_b for b in blks if b.rel_b is not None)
            return [dataclasses.replace(b, rel_b=rel) for b in blks]

        self._enc_wt = (
            jnp.asarray(model.tok_embd),
            jnp.asarray(model.enc_norm),
            tuple(_blk_tuple(b) for b in share_rel(model.enc)),
        )
        self._dec_wt = None
        if model.dec is not None:
            self._dec_wt = (
                jnp.asarray(model.tok_embd),
                jnp.asarray(model.dec_norm),
                None if model.output is None else jnp.asarray(model.output),
                tuple(_blk_tuple(b) for b in share_rel(model.dec)),
            )
        self.enc_out = None
        self._n_enc = 0
        self.reset_decoder()

    # -- encoder -----------------------------------------------------------

    def encode(self, tokens: list[int]) -> np.ndarray:
        """Run the encoder (llama_encode). Returns [n, C] embeddings and
        caches the output as the decoder's cross-attention source."""
        from ..runtime.engine import TOKEN_BUCKETS, _bucket

        n = len(tokens)
        tb = _bucket(n, TOKEN_BUCKETS)
        tok = np.zeros((tb,), np.int32)
        tok[:n] = tokens
        out = _encode(self._enc_wt, tok, np.int32(n), hp=self.model.hp)
        self.enc_out = out
        self._n_enc = n
        if self._dec_wt is not None:
            self._ck_cross, self._cv_cross = _cross_kv(
                self._dec_wt[3], out, hp=self.model.hp)
        return np.asarray(out[:n])

    # -- decoder -----------------------------------------------------------

    def reset_decoder(self) -> None:
        hp = self.model.hp
        self.n_past = 0
        if self.model.dec is not None:
            self._cache = (
                jnp.zeros((hp.n_layer, self.n_ctx, hp.n_head, hp.d_kv),
                          jnp.float32),
                jnp.zeros((hp.n_layer, self.n_ctx, hp.n_head, hp.d_kv),
                          jnp.float32),
            )

    def decode(self, token: int) -> np.ndarray:
        if self.enc_out is None:
            raise RuntimeError("encode() must run before decode()")
        if self.n_past >= self.n_ctx:
            raise RuntimeError("decoder context full")
        logits, self._cache = _decode_step(
            self._dec_wt, jnp.int32(token), jnp.int32(self.n_past),
            self._cache, self._ck_cross, self._cv_cross,
            np.int32(self._n_enc), hp=self.model.hp)
        self.n_past += 1
        return np.asarray(logits)


def generate(ctx: T5Context, prompt: list[int],
             max_new_tokens: int, eos_id: int = 1) -> Iterator[int]:
    """Encode the prompt, then greedy-decode from decoder_start_token
    (the reference main.cpp T5 flow: encode -> seed decoder)."""
    ctx.encode(prompt)
    ctx.reset_decoder()
    tok = ctx.model.hp.dec_start_token
    for _ in range(max_new_tokens):
        logits = ctx.decode(tok)
        tok = int(np.argmax(logits))
        if tok == eos_id:
            return
        yield tok
