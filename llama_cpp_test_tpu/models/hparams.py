"""Model hyperparameters parsed from GGUF metadata.

Mirrors the reference's llama-hparams.h + llama-model.cpp load_hparams,
including RoPE scaling (linear/YaRN) and GQA/MoE fields.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class HParams:
    """Frozen (hashable) so it can ride through jit as a static argument."""
    arch: str = "llama"
    n_vocab: int = 32000
    n_ctx_train: int = 2048
    n_embd: int = 4096
    n_layer: int = 32
    n_head: int = 32
    n_head_kv: int = 32
    n_ff: int = 11008
    head_dim: int = 128  # attention.key_length (n_embd/n_head unless set)
    rms_eps: float = 1e-5
    rope_dim: int = 128
    rope_freq_base: float = 10000.0
    rope_scaling: str = "none"  # none | linear | yarn | longrope
    rope_scale_factor: float = 1.0
    rope_orig_ctx: int = 0
    rope_attn_factor: float = 1.0
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    yarn_low_freq_factor: float = 1.0
    yarn_high_freq_factor: float = 4.0
    # MoE
    n_expert: int = 0
    n_expert_used: int = 0
    n_ff_exp: int = 0
    # normalize the selected top-k routing weights (build_moe_ffn norm_w;
    # true for mixtral, FALSE for qwen2moe — reference llama-model.cpp:6191)
    norm_topk: bool = True
    # deepseek2 MoE extensions (reference llama-hparams.h n_layer_dense_lead
    # / n_expert_shared / expert_weights_scale / expert_gating_func)
    n_layer_dense_lead: int = 0      # leading layers use the dense FFN
    n_expert_shared: int = 0         # always-on shared experts (ungated)
    expert_weights_scale: float = 1.0  # routed output multiplier
    expert_gating: str = "softmax"   # softmax | sigmoid | sparsemixer
    router_jitter: float = 0.01      # phimoe sparsemixer threshold eps
    # MLA attention (deepseek2; reference llm_build_deepseek2):
    # low-rank q/kv compression ranks; 0 = standard attention
    n_lora_q: int = 0
    n_lora_kv: int = 0
    # value head dim when != head_dim (MLA: qk 192 vs v 128);
    # 0 = same as head_dim
    head_dim_v: int = 0
    # yarn attention-magnitude log multiplier (deepseek2: 0.1*mscale_all_dim;
    # folded into attn_scale as mscale^2, NOT into the rope tables — see
    # hparams_from_metadata and reference llama-model.cpp:9217-9219)
    rope_yarn_log_mul: float = 0.0
    # qwen2vl M-RoPE frequency sections (t, h, w) over the rope half-dims:
    # image tokens rope each frequency with its section's position stream;
    # equal streams (text) reduce to standard NEOX rope
    # (reference GGML_ROPE_TYPE_MROPE; {arch}.rope.dimension_sections)
    mrope_sections: tuple = ()
    # misc
    sliding_window: int = 0
    # cohere2: rope ONLY on sliding-window layers; global layers carry no
    # positional signal at all (llm_build_cohere2's is_swa rope gate)
    nope_global: bool = False
    # chameleon 34B: norms apply to branch OUTPUTS, no pre-norms
    swin_norm: bool = False
    # jina-bert-v2: SYMMETRIC bidirectional ALiBi (-slope * |i-j|)
    alibi_sym: bool = False
    # RoPE freq base for sliding-window layers (gemma3: 10000 while global
    # layers use the metadata base 1e6 — reference llama-model.cpp:888
    # rope_freq_base_train_swa, selected per layer in llm_build_gemma3 :7572).
    # 0 = same as rope_freq_base.
    rope_freq_base_swa: float = 0.0
    # attention scale override; 0 = default 1/sqrt(head_dim). gemma2-27B and
    # gemma3-27B use 1/sqrt(n_embd/n_head) (reference llama-model.cpp:902,
    # :7463 — f_attention_scale with n_embd/n_head 144/168 vs head_dim 128).
    attn_scale: float = 0.0
    # olmo clip_qkv: clamp q/k/v projections to +-clamp_kqv; 0 = off
    # (reference llama-hparams.h f_clamp_kqv, llm_build_olmo ggml_clamp)
    clamp_kqv: float = 0.0
    # SWA layer pattern: with sliding_window set, layer li is GLOBAL when
    # (li + 1) % swa_pattern == 0 (gemma2: 2 = alternating, gemma3: 6 = 5
    # local : 1 global); 1 = every layer sliding (mistral)
    swa_pattern: int = 1
    tie_embeddings: bool = False
    # arch quirks (gemma family; reference llm_build_gemma/gemma2/gemma3)
    act_fn: str = "silu"        # gated-FFN activation: silu | gelu
    embd_scale: float = 1.0     # embedding multiplier (gemma: sqrt(n_embd))
    # granite mup-style scalar multipliers (reference llm_build_granite:
    # f_residual_scale / f_logit_scale; attention.scale rides attn_scale)
    residual_scale: float = 1.0
    logits_scale: float = 1.0   # logits DIVIDED by this (llama.cpp granite)
    attn_softcap: float = 0.0   # tanh cap on attention logits (gemma2: 50)
    final_softcap: float = 0.0  # tanh cap on output logits (gemma2: 30)
    # GGUF rope convention: 'norm' (interleaved pairs — llama/mistral/mixtral,
    # reference llama-model.cpp:11818) or 'neox' (half-split — qwen2 etc.,
    # :11846). NORM-layout Q/K rows are un-permuted at load so device compute
    # always runs the lane-friendly half-split rotation (models/llama.py).
    rope_type: str = "norm"
    # phi2/falcon-family quirks (reference llm_build_phi2):
    # parallel residual x + attn(norm(x)) + ffn(norm(x)) with ONE shared norm
    parallel_residual: bool = False
    # bert-family encoders (reference llm_build_bert): POST-norm layers
    # (x = LN(x + attn(x)); x = LN(x + ffn(x))), bidirectional attention,
    # learned-position or rope position encoding, no lm head
    post_norm: bool = False
    causal: bool = True          # default attention causality
    pos_embd: str = "rope"       # 'rope' | 'learned' (bert) | 'none' (alibi)
    # ALiBi position bias (bloom/mpt class): per-head slopes added to the
    # attention logits; attention rides the XLA paths (the Pallas kernels
    # have no bias input). max_bias = ggml soft_max_ext max_bias / HF 8.0
    alibi: bool = False
    alibi_max_bias: float = 8.0
    alibi_style: str = "bloom"   # 'bloom' | 'mpt' (non-pow2 head order)
    pooling: str = "last"        # default pooling for embed(): GGUF
    #                              {arch}.pooling_type (llama.h enum)
    # input/output norm flavor: 'rms' (llama) or 'ln' (LayerNorm with bias)
    norm_type: str = "rms"
    # gated FFN (SwiGLU/GeGLU) vs plain up->act->down (phi2)
    # per-layer geometry (openelm/deci): GGUF head_count / head_count_kv /
    # feed_forward_length written as PER-LAYER ARRAYS (reference
    # llama-hparams.h n_head_arr/n_head_kv_arr/n_ff_arr via get_key_or_arr).
    # () = uniform (the scalar fields above apply to every layer). deci
    # encodes attention-free layers as n_head 0 and "linear attention"
    # layers as n_head > 0 with n_head_kv 0 (llm_build_deci).
    n_head_layers: tuple = ()
    n_head_kv_layers: tuple = ()
    n_ff_layers: tuple = ()

    @property
    def n_embd_head(self) -> int:
        return self.head_dim

    @property
    def v_dim(self) -> int:
        """Value head dim (== head_dim except MLA archs)."""
        return self.head_dim_v or self.head_dim

    @property
    def n_gqa(self) -> int:
        return self.n_head // max(self.n_head_kv, 1)

    @property
    def uniform_layers(self) -> bool:
        """True when every layer shares the scalar head/ffn geometry."""
        return not (self.n_head_layers or self.n_head_kv_layers
                    or self.n_ff_layers)

    def n_head_of(self, li: int) -> int:
        return self.n_head_layers[li] if self.n_head_layers else self.n_head

    def n_head_kv_of(self, li: int) -> int:
        return (self.n_head_kv_layers[li] if self.n_head_kv_layers
                else self.n_head_kv)

    def n_ff_of(self, li: int) -> int:
        return self.n_ff_layers[li] if self.n_ff_layers else self.n_ff


def hparams_from_metadata(md: dict) -> HParams:
    arch = md.get("general.architecture", "llama")

    def g(suffix, default):
        v = md.get(f"{arch}.{suffix}", default)
        if isinstance(default, float):
            return float(v)
        if isinstance(default, bool):
            return bool(v)
        if isinstance(default, int):
            return int(v)
        return v

    n_embd = g("embedding_length", 4096)

    def arr(suffix) -> tuple:
        """Per-layer int array value of a key, or () when scalar/absent
        (reference llama-model-loader get_key_or_arr: head_count /
        head_count_kv / feed_forward_length may be arrays for openelm and
        deci)."""
        v = md.get(f"{arch}.{suffix}")
        if v is None or isinstance(v, (int, float, np.integer, np.floating)):
            return ()
        a = np.asarray(v)
        return tuple(int(x) for x in a.reshape(-1)) if a.ndim else ()

    n_head_layers = arr("attention.head_count")
    n_head_kv_layers = arr("attention.head_count_kv")
    n_ff_layers = arr("feed_forward_length")
    n_head = max(n_head_layers) if n_head_layers \
        else g("attention.head_count", 32)
    head_dim = g("attention.key_length", n_embd // max(n_head, 1))
    n_vocab = g("vocab_size", 0)
    if not n_vocab:
        toks = md.get("tokenizer.ggml.tokens")
        n_vocab = len(toks) if toks is not None else 32000
    scaling = str(md.get(f"{arch}.rope.scaling.type", "none") or "none")
    neox_arches = {"falcon", "grok", "dbrx", "bert", "nomic-bert", "stablelm",
                   "bitnet", "qwen", "qwen2", "qwen2vl", "qwen2moe", "qwen3",
                   "qwen3moe",
                   "olmo2", "olmoe",
                   # orion: HF rope is llama half-split and the GGUF rows
                   # are UNPERMUTED (OrionModel has no modify_tensors), so
                   # the half-split (neox) read matches both the model and
                   # reference-converted GGUF bytes. NOTE: the reference
                   # RUNTIME ropes these rows NORM-interleaved
                   # (llama-model.cpp rope-type switch), which does not
                   # match the original model; this engine follows the
                   # model and the GGUF byte layout.
                   "orion",
                   "phi2", "phi3", "phimoe", "gemma", "gemma2", "gemma3",
                   "starcoder2", "openelm", "gptneox", "codeshell", "nemotron",
                   "exaone", "minicpm3"}
    rope_type = "neox" if arch in neox_arches else "norm"
    gemma_like = arch in {"gemma", "gemma2", "gemma3"}
    import math as _math

    swa_pattern = 1
    if arch == "gemma2":
        swa_pattern = 2       # alternating local/global (llm_build_gemma2)
    elif arch == "gemma3":
        swa_pattern = g("attention.sliding_window_pattern", 6)
    elif arch == "cohere2":
        swa_pattern = 4   # 3 sliding + 1 global (llama-model.cpp:968)
    n_layer = g("block_count", 32)
    # gemma 27B variants scale attention by 1/sqrt(n_embd/n_head), not
    # 1/sqrt(head_dim); the reference detects them by layer count
    # (llama-model.cpp:902 gemma2 n_layer 46, :7463 gemma3 n_layer 62)
    attn_scale = 0.0
    if (arch == "gemma2" and n_layer == 46) or \
            (arch == "gemma3" and n_layer == 62):
        attn_scale = 1.0 / _math.sqrt(n_embd / max(n_head, 1))
    if arch in ("granite", "granitemoe"):
        attn_scale = g("attention.scale", attn_scale)
    if arch == "jais":
        # mup scaled-dot attention: 1/d_head, not 1/sqrt (llm_build_jais)
        attn_scale = 1.0 / head_dim
    # phi2 stores a plain layer_norm_epsilon (LayerNorm arch); reuse rms_eps
    eps = g("attention.layer_norm_rms_epsilon",
            g("attention.layer_norm_epsilon", 1e-5))
    # deepseek2 MLA: the yarn magnitude correction rides the ATTENTION
    # scale, not the rope tables. Reference llama-model.cpp:9216-9220
    # pre-scales kq_scale = mscale^2/sqrt(dk) with mscale = attn_factor *
    # (1 + rope_yarn_log_mul * ln(1/freq_scale)) and cancels the rope's own
    # yarn mscale via attn_factor_scaled; net rope magnitude is 1 (HF
    # DeepseekV2 has mscale == mscale_all_dim so its cos/sin scaling
    # ratio is 1 too). rope_freqs() skips its yarn mscale for this arch.
    yarn_log_mul = g("rope.scaling.yarn_log_multiplier", 0.0)
    # baichuan-13B-class ALiBi: the reference keys on n_layer == 40
    # (llama-model.cpp LLM_TYPE_13B -> no rope + alibi); GGUFs from this
    # converter also carry attention.max_alibi_bias explicitly
    _baichuan_alibi = arch == "baichuan" and (
        n_layer >= 40 or g("attention.max_alibi_bias", 0.0) > 0)
    if arch == "deepseek2":
        factor = g("rope.scaling.factor", 1.0)
        m = 1.0
        if scaling == "yarn" and factor > 1.0:
            m = g("rope.scaling.attn_factor", 1.0) * \
                (1.0 + yarn_log_mul * _math.log(factor))
        attn_scale = m * m / _math.sqrt(head_dim)
    hp = HParams(
        arch=arch,
        n_vocab=n_vocab,
        n_ctx_train=g("context_length", 2048),
        n_embd=n_embd,
        n_layer=n_layer,
        n_head=n_head,
        n_head_kv=(max(n_head_kv_layers) if n_head_kv_layers
                   else g("attention.head_count_kv", n_head)),
        n_ff=(max(n_ff_layers) if n_ff_layers
              else g("feed_forward_length", 11008)),
        n_head_layers=n_head_layers,
        n_head_kv_layers=n_head_kv_layers,
        n_ff_layers=n_ff_layers,
        head_dim=head_dim,
        rms_eps=eps,
        rope_dim=g("rope.dimension_count", head_dim),
        rope_freq_base=g("rope.freq_base", 10000.0),
        rope_scaling=scaling,
        rope_scale_factor=g("rope.scaling.factor", 1.0),
        rope_orig_ctx=g("rope.scaling.original_context_length", 0),
        rope_attn_factor=g("rope.scaling.attn_factor", 1.0),
        n_expert=g("expert_count", 0),
        n_expert_used=g("expert_used_count", 0),
        n_ff_exp=g("expert_feed_forward_length", 0),
        norm_topk=(bool(g("expert_weights_norm", False))
                   if arch == "deepseek2"
                   # deepseek v1 + qwen2moe/olmoe: raw softmax top-k
                   else arch not in ("qwen2moe", "olmoe", "deepseek")),
        n_layer_dense_lead=g("leading_dense_block_count", 0),
        n_expert_shared=g("expert_shared_count", 0),
        expert_weights_scale=g("expert_weights_scale", 1.0),
        expert_gating=("sparsemixer" if arch == "phimoe"
                       else "sigmoid" if int(g("expert_gating_func", 1)) == 2
                       else "softmax"),
        router_jitter=g("router_jitter", 0.01),
        n_lora_q=g("attention.q_lora_rank", 0),
        n_lora_kv=g("attention.kv_lora_rank", 0),
        head_dim_v=g("attention.value_length",
                     # minicpm3 reference GGUFs omit value_length and
                     # rely on n_embd/n_head == v_head_dim
                     n_embd // max(n_head, 1) if arch == "minicpm3"
                     else 0),
        rope_yarn_log_mul=yarn_log_mul,
        sliding_window=g("attention.sliding_window", 0),
        swa_pattern=max(1, swa_pattern),
        rope_freq_base_swa=(g("rope.local_freq_base", 10000.0)
                            if arch == "gemma3" else 0.0),
        attn_scale=attn_scale,
        clamp_kqv=g("attention.clamp_kqv", 0.0),
        rope_type=rope_type,
        # stablelm GGUFs carry the flag explicitly (reference StableLMModel
        # add_parallel_residual, convert_hf_to_gguf.py:1536); elsewhere it
        # is an arch property
        parallel_residual=bool(g("use_parallel_residual",
                                 arch in ("phi2", "falcon", "gptneox",
                                          "command-r", "cohere2",
                                          # plamo: ONE rms norm feeds both
                                          # branches, x + attn + swiglu-ffn
                                          # (llm_build_plamo)
                                          "plamo"))),
        norm_type=("ln" if arch in ("phi2", "falcon", "gptneox", "stablelm",
                                    "command-r", "starcoder2", "nemotron",
                                    "olmo",  # olmo: NON-PARAMETRIC LN
                                    "bert", "nomic-bert", "jina-bert-v2",
                                    "gpt2", "starcoder", "codeshell",
                                    "bloom", "mpt",
                                    "dbrx",  # dbrx: bias-free LN
                                    "cohere2", "orion", "jais",
                                    # phimoe: TRUE LayerNorm w/ bias (HF
                                    # PhiMoE; the reference's RMS+bias is
                                    # a divergence from the model)
                                    "phimoe")
                   else "rms"),
        act_fn=("relu2" if arch == "nemotron" else
                # bert/mpt/jina: HF applies the EXACT erf gelu
                "gelu_erf" if arch in ("bert", "mpt",
                                       "jina-bert-v2") else
                "gelu" if (gemma_like or arch in ("phi2", "falcon",
                                                  "gptneox", "starcoder2",
                                                  "gpt2", "starcoder",
                                                  "codeshell", "bloom",
                                                  "grok"))
                else "silu"),
        embd_scale=(_math.sqrt(n_embd) if gemma_like
                    else g("embedding_scale", 1.0)),
        residual_scale=g("residual_scale", 1.0),
        # lm_head DIVIDES by logits_scale: granite stores a divisor
        # (1/f_logit_scale applied, llm_build_granite); command-r stores a
        # multiplier (ggml_scale by f_logit_scale) -> invert here
        logits_scale=(1.0 / g("logit_scale", 1.0)
                      if arch in ("command-r", "cohere2")
                      else g("logit_scale", 1.0)),
        attn_softcap=g("attn_logit_softcapping",
                       50.0 if arch == "gemma2" else
                       # grok-1: 30*tanh(logits/30) in the original model
                       # (the reference graph OMITS it — this engine
                       # follows the model)
                       30.0 if arch == "grok" else 0.0),
        final_softcap=g("final_logit_softcapping",
                        30.0 if arch == "gemma2" else 0.0),
        post_norm=arch in ("bert", "nomic-bert", "jina-bert-v2"),
        causal=arch not in ("bert", "nomic-bert", "jina-bert-v2"),
        pos_embd=("learned" if arch in ("bert", "gpt2", "starcoder")
                  else "none" if arch in ("bloom", "mpt", "jina-bert-v2",
                                          "jais", "refact")
                  or _baichuan_alibi
                  else "rope"),
        alibi=arch in ("bloom", "mpt", "jina-bert-v2", "jais", "refact")
        or _baichuan_alibi,
        alibi_sym=arch == "jina-bert-v2",
        alibi_max_bias=g("attention.max_alibi_bias", 8.0),
        alibi_style="mpt" if arch == "mpt" else "bloom",
        # default mean everywhere (the historical behavior of this
        # engine's embed paths); GGUF {arch}.pooling_type overrides
        # (bert converter writes CLS)
        pooling={0: "none", 1: "mean", 2: "cls", 3: "last"}.get(
            int(g("pooling_type", 1)), "mean"),
        nope_global=arch == "cohere2",
        swin_norm=bool(g("swin_norm", False)),
        mrope_sections=tuple(
            int(x) for x in np.asarray(
                md.get(f"{arch}.rope.dimension_sections", []))[:3]),
    )
    return hp


def attn_scale_of(hp: HParams) -> float:
    """Attention logit scale: hp.attn_scale override (gemma 27B) or the
    default 1/sqrt(head_dim)."""
    import math as _math
    return hp.attn_scale if hp.attn_scale > 0 else \
        1.0 / _math.sqrt(hp.head_dim)


def layer_window(hp: HParams, li: int) -> int:
    """Per-layer sliding window: 0 = global attention for this layer."""
    if hp.sliding_window <= 0:
        return 0
    if hp.swa_pattern > 1 and (li + 1) % hp.swa_pattern == 0:
        return 0
    return hp.sliding_window
