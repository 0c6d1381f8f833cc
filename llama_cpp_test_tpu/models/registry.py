"""Architecture registry (the llama-arch.{h,cpp} analogue).

Maps GGUF `general.architecture` strings to model-forward families. The
reference enumerates 60 architectures (llama-arch.h:12-72); this registry
lists ONLY architectures whose forward pass is actually implemented and
tested here — loading an unlisted arch raises instead of silently running
the wrong math (models/llama.py load_weights enforces this).

Families:
  "llama"  — pre-norm sequential residual: RMSNorm -> QKV(+bias) -> RoPE ->
             attn -> residual -> RMSNorm -> gated FFN (SwiGLU/GeGLU) or MoE
             -> residual. Quirk axes handled by hparams/LayerWeights: rope
             type (norm/neox), GQA, per-head QK norms (qwen3/gemma3),
             sandwich norms + softcaps + SWA patterns (gemma2/3), embedding
             scale (gemma), attention biases (qwen2), MoE routing (mixtral).
             (reference llm_build_llama, llama-model.cpp:4037-4198)
  "phi2"   — parallel residual: ONE LayerNorm feeds both attention and a
             non-gated GELU FFN, x + attn(ln(x)) + ffn(ln(x)); partial
             rotary (rope_dim < head_dim); biases everywhere incl. the LM
             head. (reference llm_build_phi2, llama-model.cpp)
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ArchSpec:
    name: str
    family: str                  # forward-pass implementation family
    rope_type: str = "norm"      # see hparams.HParams.rope_type
    notes: str = ""


ARCHITECTURES: dict[str, ArchSpec] = {}


def register_arch(spec: ArchSpec) -> ArchSpec:
    ARCHITECTURES[spec.name] = spec
    return spec


# llama family proper (tests: test_engine, test_reference_parity, llama.cpp
# cross-engine parity; mixtral MoE: test_parallel MoE forward + dryrun)
for _name in ("llama", "mistral", "mixtral"):
    register_arch(ArchSpec(_name, family="llama", rope_type="norm"))

# qwen2: llama + attention biases, neox rope (test_arch_quirks)
register_arch(ArchSpec("qwen2", family="llama", rope_type="neox",
                       notes="attn-bias"))

# qwen3: qwen2 + per-head Q/K RMS norms (test_arch_quirks)
register_arch(ArchSpec("qwen3", family="llama", rope_type="neox",
                       notes="qk-norm"))

# qwen2vl: the Qwen2-VL text model. Text M-RoPE with equal t/h/w
# streams reduces exactly to standard NEOX rope; IMAGE tokens rope with
# per-section position streams (hp.mrope_sections + forward_layer's
# apply_mrope), fed by the models/qwen2vl_vision.py tower through
# prefill_embeds(mrope_pos=...) and pos_offset'd text continuation
# (reference llm_build_qwen2vl GGML_ROPE_TYPE_MROPE +
# examples/llava/qwen2vl-cli.cpp; cross-validated end-to-end in
# tests/test_qwen2vl_vision.py).
register_arch(ArchSpec("qwen2vl", family="llama", rope_type="neox",
                       notes="attn-bias, M-RoPE incl. image positions"))

# qwen2moe: mixtral-style routed experts WITHOUT top-k renormalization,
# plus a sigmoid-gated shared expert (reference llm_build_qwen2moe,
# llama-model.cpp:6104-6225; test_arch_quirks qwen2moe suite)
register_arch(ArchSpec("qwen2moe", family="llama", rope_type="neox",
                       notes="moe, shared-expert, no-topk-norm"))

# qwen3moe: qwen3's per-head QK norms + routed experts WITH top-k
# renormalization and no shared expert (reference llm_build_qwen3moe;
# converter test cross-validates logits vs transformers)
register_arch(ArchSpec("qwen3moe", family="llama", rope_type="neox",
                       notes="qk-norm, moe"))

# phi3: plain pre-norm SwiGLU with neox rope and uniform sliding window —
# the converter splits HF's fused qkv_proj/gate_up_proj rows into the
# standard tensors (reference llm_build_phi3; converter test
# cross-validates logits vs transformers)
register_arch(ArchSpec("phi3", family="llama", rope_type="neox",
                       notes="fused-split, uniform swa"))

# granite: llama + mup-style scalar multipliers (embedding / residual /
# attention / logits scales — reference llm_build_granite; converter test
# cross-validates logits vs transformers)
register_arch(ArchSpec("granite", family="llama", rope_type="norm",
                       notes="mup-scales"))

# stablelm: sequential llama-family structure with LayerNorm (+biases),
# partial rotary (rope_dim < head_dim via the rope table length), optional
# qkv biases (stablelm2) — reference llm_build_stablelm; converter test
# cross-validates logits vs transformers
register_arch(ArchSpec("stablelm", family="llama", rope_type="neox",
                       notes="layernorm, partial-rope"))

# olmo2: POST-norm-only sequential structure (x + norm(attn(x)), no
# pre-norms — the existing attn_post_norm/ffn_post_norm fields with
# identity pre-norm) + flat-vector QK RMSNorms — reference
# llm_build_olmo2; converter test cross-validates vs transformers
register_arch(ArchSpec("olmo2", family="llama", rope_type="neox",
                       notes="post-norm-only, flat qk-norm"))

# olmoe: standard pre-norm MoE (64x top-8, UNnormalized routing weights)
# with olmo2-style flat QK RMSNorms — reference llm_build_olmoe;
# converter test cross-validates vs transformers
register_arch(ArchSpec("olmoe", family="llama", rope_type="neox",
                       notes="moe, flat qk-norm, no-topk-norm"))

# gemma family: GeGLU + sqrt(n_embd) embedding scale; gemma2 adds sandwich
# norms, attn/final logit softcapping and alternating SWA; gemma3 adds
# qk-norms and 5:1 local/global SWA with its own local rope base
# (test_arch_quirks gemma2 suite covers the union of these quirk paths)
for _name in ("gemma", "gemma2", "gemma3"):
    register_arch(ArchSpec(_name, family="llama", rope_type="neox",
                           notes="gelu, embd-scale, softcap, swa-pattern"))

# command-r: parallel-residual with ONE LayerNorm feeding both branches,
# a GATED SwiGLU FFN (unlike phi2/falcon's plain GELU), interleaved
# (NORM) rope, and a logit-scale multiplier — reference
# llm_build_command_r; converter test cross-validates vs transformers
register_arch(ArchSpec("command-r", family="phi2", rope_type="norm",
                       notes="parallel-residual, layernorm, gated-ffn, "
                             "logit-scale"))

# starcoder2: sequential LayerNorm family with a NON-gated GELU FFN and
# biases on every projection — reference llm_build_starcoder2; converter
# test cross-validates vs transformers
register_arch(ArchSpec("starcoder2", family="llama", rope_type="neox",
                       notes="layernorm, non-gated-gelu, biases"))

# nemotron: LayerNorm1p (the +1 folded at convert, reference
# NemotronModel:4952-4959) + non-gated squared-ReLU FFN + partial rotary
# (reference llm_build_nemotron, llama-model.cpp:10120-10200)
register_arch(ArchSpec("nemotron", family="llama", rope_type="neox",
                       notes="layernorm1p, relu2 non-gated FFN, "
                             "partial rotary"))

# olmo (v1): llama body with NON-PARAMETRIC LayerNorms (no norm tensors)
# and clip_qkv clamping (reference llm_build_olmo,
# llama-model.cpp:8276-8380)
register_arch(ArchSpec("olmo", family="llama", rope_type="norm",
                       notes="non-parametric LN, clamp_kqv"))

# gptneox / pythia: parallel residual (config-switchable to sequential)
# with a DEDICATED ffn_norm on the layer input, fused deinterleaved qkv,
# non-gated GELU FFN with biases, partial rotary (reference
# llm_build_gptneox, llama-model.cpp:8775-8900)
register_arch(ArchSpec("gptneox", family="phi2", rope_type="neox",
                       notes="parallel residual w/ dedicated ffn_norm, "
                             "qkv fused, partial rotary"))

# phi2: parallel-residual family (test_arch_quirks phi2 suite)
register_arch(ArchSpec("phi2", family="phi2", rope_type="neox",
                       notes="parallel-residual, layernorm, partial-rope"))

# falcon: same parallel-residual family; full-head rope, bias-free
# projections, falcon-40B's attn_norm_2 feeds the FFN branch
# (reference llm_build_falcon, llama-model.cpp:4583-4690;
# test_arch_quirks falcon suite)
register_arch(ArchSpec("falcon", family="phi2", rope_type="neox",
                       notes="parallel-residual, layernorm, attn_norm_2"))


# deepseek2: MLA attention (low-rank q/kv compression: q_a/q_b or wq,
# kv_a_mqa + kv_b; qk head 192 = 128 nope + 64 rope-pe, v head 128) with
# NORM-rope on the pe slices, yarn mscale^2 folded into the attention
# scale; MoE layers after n_layer_dense_lead dense leads, with ungated
# always-on shared experts, routed-weight scale, optional sigmoid gating
# + selection bias (deepseek-v3). Covers DeepSeek-V2/V2.5/V3/R1 and the
# R1 distills' teacher arch. (reference llm_build_deepseek2,
# llama-model.cpp:9212-9420; converter DeepseekV2Model)
register_arch(ArchSpec("deepseek2", family="llama", rope_type="norm",
                       notes="mla, moe shared+dense-lead, yarn-log-mul"))


# bert: POST-norm bidirectional encoder — learned absolute positions +
# token-type row + embedding LayerNorm, biased projections, exact-erf
# GELU FFN, LN over residual sums, no lm head (embeddings/rerank model
# class). nomic-bert: same body with NEOX rope instead of learned
# positions and an unbiased SwiGLU FFN. (reference llm_build_bert,
# llama-model.cpp:5191-5350)
register_arch(ArchSpec("bert", family="bert", rope_type="neox",
                       notes="post-norm encoder, learned positions, "
                             "non-causal"))
register_arch(ArchSpec("nomic-bert", family="bert", rope_type="neox",
                       notes="post-norm encoder, rope, swiglu, non-causal"))


# minicpm: llama body with mup-style scalar multipliers — embeddings x
# scale_emb, residual branches x scale_depth/sqrt(L), logits / logit
# scale — all riding the same hparams fields granite uses (reference
# llm_build_llama via LLM_ARCH_MINICPM scales, llama-model.cpp:11461,
# :3958; longrope factor tensors supported like phi3)
register_arch(ArchSpec("minicpm", family="llama", rope_type="norm",
                       notes="embd/residual/logit scales, longrope"))

# internlm2: llama body; the converter deinterleaves the grouped fused
# wqkv ((g q-heads, 1 k, 1 v) per kv group) into standard tensors with
# the NORM-rope q/k permutation (reference llm_build_internlm2,
# llama-model.cpp:6973; InternLM2Model.modify_tensors)
register_arch(ArchSpec("internlm2", family="llama", rope_type="norm",
                       notes="fused grouped wqkv at convert"))

# baichuan: llama body; the converter splits the fused W_pack into
# permuted q/k + v (reference llm_build_baichuan, llama-model.cpp:4358).
# The 13B class (n_layer >= 40, exactly the reference's detection) runs
# ALiBi with no rope via the attend-path slope bias.
register_arch(ArchSpec("baichuan", family="llama", rope_type="norm",
                       notes="W_pack split at convert; 13B-class alibi"))


# gpt2: sequential LayerNorm decoder with LEARNED absolute positions (no
# rope — position rows added at the embedding like bert), fused
# attn_qkv(+bias), non-gated GELU FFN with biases, tied lm head
# (reference llm_build_gpt2; converter transposes HF's Conv1D weights)
register_arch(ArchSpec("gpt2", family="llama", rope_type="norm",
                       notes="learned positions, layernorm, fused qkv, "
                             "non-gated gelu"))


# starcoder (v1 / santacoder, GPTBigCode): gpt2 body with MULTI-QUERY
# attention (1 kv head) and nn.Linear projections (no Conv1D transpose)
# (reference llm_build_starcoder)
register_arch(ArchSpec("starcoder", family="llama", rope_type="norm",
                       notes="learned positions, layernorm, MQA, "
                             "non-gated gelu"))


# bloom: ALiBi decoder — no positional embedding at all; per-head slope
# bias added to the attention logits (XLA attend paths; the Pallas
# kernels have no bias input), embedding LayerNorm, fused per-head-
# interleaved qkv deinterleaved at convert, non-gated GELU FFN with
# biases, tied head (reference llm_build_bloom, llama-model.cpp:5370+)
register_arch(ArchSpec("bloom", family="llama", rope_type="norm",
                       notes="alibi, embedding-LN, fused qkv, "
                             "non-gated gelu"))


# mpt: ALiBi decoder like bloom but with the MPT slope ordering for
# non-power-of-two head counts, bias-free projections/norms (no_bias),
# contiguous fused Wqkv, non-gated GELU FFN, tied head
# (reference llm_build_mpt)
register_arch(ArchSpec("mpt", family="llama", rope_type="norm",
                       notes="alibi (mpt slopes), fused qkv, "
                             "non-gated gelu, bias-free"))


# mamba: selective state-space (recurrent conv + SSM state instead of a
# KV cache) — served by models/mamba.py MambaModel/MambaContext, NOT the
# paged-KV engine (the reference's recurrent llama-kv-cache mode,
# llama-kv-cache.h:146; builder llm_build_mamba). llama-family
# load_weights refuses it with a pointer.
# chameleon (7B/34B): llama body + per-head qk LayerNorms WITH bias
# (stats over head_dim only, applied before rope) and the 34B's
# swin_norm variant — no pre-norms, branch-output norms, which maps
# exactly onto the engine's gemma2 sandwich post-norm slots at load.
# NOTE: the reference graph hard-codes image-token logit suppression
# (llm_build_chameleon img_token range clamp); this engine matches the
# MODEL (no suppression) — use logit_bias to constrain text-only runs.
register_arch(ArchSpec("chameleon", family="llama", rope_type="norm",
                       notes="per-head qk LN + bias; swin_norm variant"))

# phimoe (Phi-3.5-MoE): phi3 attention (neox rope + longrope) over
# mixtral-stacked experts, TRUE LayerNorms with bias, lm-head bias, and
# HF's sparsemixer inference routing (per-pick masked softmax, weights
# NOT renormalized across picks). The reference routes it through
# llm_build_phi3 with RMS+bias norms and renormalized top-2 softmax —
# both diverge from the original model; this engine follows the model.
register_arch(ArchSpec("phimoe", family="llama", rope_type="neox",
                       notes="sparsemixer moe, true LN, head bias"))

# chatglm (GLM-3/GLM-4): llama body with PARTIAL interleaved rotary
# (rope_dim = head_dim/2, NORM type), qkv biases, fused-swiglu ffn
# (reference llm_build_chatglm; validated vs GlmForCausalLM)
register_arch(ArchSpec("chatglm", family="llama", rope_type="norm",
                       notes="partial norm rope, qkv bias, swiglu"))

# cohere2 (Command R7B): command-r parallel-residual body + 3:1
# sliding/global layer pattern where GLOBAL layers carry no rope at all
# (NoPE; llm_build_cohere2's is_swa rope gate, llama-model.cpp)
register_arch(ArchSpec("cohere2", family="llama", rope_type="norm",
                       notes="parallel-residual LN, swa 4:1, NoPE global"))

# dbrx: 16-expert top-4 MoE; bias-free LayerNorms, fused clamped Wqkv,
# pre-MoE norm stored under the reference's attn_output_norm name
# (reference llm_build_dbrx, llama-model.cpp:4862; test_convert_hf)
register_arch(ArchSpec("dbrx", family="llama", rope_type="neox",
                       notes="fused-qkv clamp, LN, softmax moe"))

# bitnet (BitNet b1.58): llama body whose projection weights are
# TERNARY ({-1,0,1} x per-tensor abs-mean scale, quantized at convert
# exactly like the reference; TQ1_0/TQ2_0 GGUFs also load through the
# quant codecs) with rms sub-norms applied to the attention output
# BEFORE wo and to the swiglu product BEFORE ffn_down. Tied head.
register_arch(ArchSpec("bitnet", family="llama", rope_type="neox",
                       notes="ternary weights, sub-norms"))

# arctic (Snowflake Arctic 480B): every layer runs a dense "residual
# MLP" on the post-attention sum IN PARALLEL with a 128-expert MoE over
# the LAYER INPUT through its own norm (llm_build_arctic FFN_NORM_EXPS)
# — both branches add into the output. Torch-ref validated.
register_arch(ArchSpec("arctic", family="llama", rope_type="norm",
                       notes="parallel dense+moe residuals"))

# grok (Grok-1 314B): neox rope, post-attn/ffn rms norms (gemma2
# sandwich slots via load remap), 8-expert top-2 renormalized GELU MoE,
# hardcoded embd x78.38 and logits x1/sqrt(3) multipliers, tied
# in_out_embed head, and the model's 30*tanh(x/30) attention softcap
# (which the reference graph omits — this engine follows the model).
# Validated against an independent torch reference.
register_arch(ArchSpec("grok", family="llama", rope_type="neox",
                       notes="gelu moe, post norms, softcap"))

# minicpm3 (MiniCPM3-4B): deepseek2-style MLA attention (q-lora +
# kv-lora, pe-only rope — NEOX type, so no load permutation) combined
# with minicpm's mup scales (embd x scale_emb, residual x
# scale_depth/sqrt(L), logits x hidden/dim_model_base). Validated
# against an independent torch MLA reference (remote-code HF class).
register_arch(ArchSpec("minicpm3", family="llama", rope_type="neox",
                       notes="MLA + minicpm scales"))

# codeshell: starcoder body (LayerNorm+bias, fused biased qkv, gelu
# SEQ ffn) with NEOX rope instead of learned positions and
# num_query_groups GQA (llm_build_codeshell; torch-ref validated)
register_arch(ArchSpec("codeshell", family="llama", rope_type="neox",
                       notes="starcoder body + rope"))

# refact (Refact-1.6B): rms/swiglu llama-style body with MQA (one kv
# head from a fused attn.kv plane) and ALiBi positions (max_bias 8
# implied by the arch; llm_build_refact has no rope call). Validated
# against an independent torch reference (remote-code HF class).
register_arch(ArchSpec("refact", family="llama",
                       notes="MQA, alibi, fused kv/gate_up"))

# jais (core42 13B/30B): gpt2 LayerNorm body + ALiBi + BIASED swiglu
# with mup scaled-dot attention (1/d_head) and mup embedding/output
# scales baked in at convert. The c_fc2=gate/c_fc=up assignment follows
# the reference's tensor mapping for GGUF parity. Validated against an
# independent torch reference (remote-code HF class).
register_arch(ArchSpec("jais", family="llama",
                       notes="alibi, biased swiglu, mup scales"))

# orion (Orion-14B): llama body with TRUE LayerNorm+bias norms (the
# config key claims rms), gated silu FFN, no projection biases;
# validated against an independent torch reference. See hparams.py for
# the rope-convention note vs the reference runtime.
register_arch(ArchSpec("orion", family="llama", rope_type="neox",
                       notes="LN+bias norms"))

# qwen v1 (Qwen-7B/14B): MHA with a fused biased c_attn, neox rope,
# swiglu with the w2(gate)/w1(up) naming — math-identical to llama with
# qkv biases, validated by llama-equivalence (llm_build_qwen)
register_arch(ArchSpec("qwen", family="llama", rope_type="neox",
                       notes="fused biased qkv, MHA"))

# exaone (EXAONE-3.5): llm_build_exaone is the llama graph with neox
# rope and transformer.h.* checkpoint naming — validated by
# llama-equivalence (the HF class is remote-code)
register_arch(ArchSpec("exaone", family="llama", rope_type="neox"))

# jina-bert-v2 (jina-embeddings-v2): bert post-norm body with
# SYMMETRIC bidirectional ALiBi (-slope*|i-j|, max_bias 8; no position
# embeddings) and a GELU-gated FFN (llm_build_bert's JINA_BERT_V2
# branches; validated against an independent torch reference — the HF
# class is remote-code)
register_arch(ArchSpec("jina-bert-v2", family="llama",
                       notes="post-norm, symmetric alibi, geglu"))

# xverse: llm_build_xverse is llm_build_llama minus biases/moe/rope
# factors — a strict llama-family member (HF tensor names are llama's,
# so parity follows the llama tests; converter relabels the arch)
register_arch(ArchSpec("xverse", family="llama", rope_type="norm"))

# granitemoe (IBM PowerMoE/granite-3 MoE): granite's mup multipliers
# (embedding/residual/attention/logits scales) + mixtral-routed experts
# whose HF planes are jetmoe-style fused (input_linear gate;up) — split
# at convert (rides llm_build_llama like granite)
register_arch(ArchSpec("granitemoe", family="llama", rope_type="norm",
                       notes="granite scales + moe"))

# deepseek v1: llama attention (NORM rope) + deepseek-MoE — softmax
# top-k WITHOUT renormalization, always-on UNGATED shared experts,
# leading dense layers (llm_build_deepseek; validated against an
# independent torch reference since the HF class is remote-code)
register_arch(ArchSpec("deepseek", family="llama", rope_type="norm",
                       notes="moe no-renorm + ungated shexp"))

# t5 family (encoder-decoder): llm_build_t5_enc/_dec — relative bucket
# position bias, NO attention scale, cross-attention over llama_encode
# output; d_kv decoupled from d_model. models/t5.py provides
# T5Model/T5Context (the engine's paged KV is decoder-only by design).
register_arch(ArchSpec("t5", family="t5",
                       notes="enc-dec, rel buckets, cross-attn"))
register_arch(ArchSpec("t5encoder", family="t5",
                       notes="encoder-only t5 (embeddings)"))

register_arch(ArchSpec("mamba", family="mamba",
                       notes="recurrent ssm; models/mamba.py surface"))

# rwkv6 ("finch" linear-attention RNN): recurrent token-shift + per-head
# wkv matrix states instead of a KV cache (llm_build_rwkv6,
# llama-model.cpp:10340-10647; wkv kernel ggml_compute_forward_rwkv_wkv6)
register_arch(ArchSpec("rwkv6", family="rwkv6",
                       notes="recurrent wkv; models/rwkv6.py surface"))
# QRWKV6 (llm_build_rwkv6qwen2): qwen2.5 distilled onto rwkv6 linear
# attention — rms/swiglu body, gated-linear-attn time mix, GQA kv heads
register_arch(ArchSpec("rwkv6qwen2", family="rwkv6",
                       notes="rwkv6 time mix in a qwen body"))

# wavtokenizer decoder (llm_build_wavtokenizer_dec): audio-codec
# residual-conv/attention decoder — no token KV cache; rides its own
# models/wavtokenizer.py loader + the llama-tts CLI
register_arch(ArchSpec("wavtokenizer-dec", family="wavtokenizer",
                       notes="audio decoder; models/wavtokenizer.py"))

# rwkv7 "goose" (llm_build_rwkv7): DeltaNet-style rank-1 state
# transitions with in-context learning rates; arwkv7 is the
# qwen-distilled hybrid (rms body + swiglu FFN, llm_build_arwkv7)
register_arch(ArchSpec("rwkv7", family="rwkv7",
                       notes="recurrent wkv7; models/rwkv7.py surface"))
register_arch(ArchSpec("arwkv7", family="rwkv7",
                       notes="rwkv7 time mix in a qwen body"))

# openelm (Apple OpenELM 270M-3B): PER-LAYER geometry — num_query_heads /
# num_kv_heads / ffn dims vary by layer (GGUF head_count arrays, reference
# llama-hparams.h n_head_arr; llm_build_openelm) — fused qkv split at the
# layer's head counts, SHARED per-head q/k rms norms ([head_dim] weights)
# applied before rope, neox rope, tied head.
register_arch(ArchSpec("openelm", family="llama", rope_type="neox",
                       notes="per-layer heads/ffn, qk-norm"))

# deci (DeciLM-7B / Llama-3_1-Nemotron-51B): llama body with NAS
# per-layer geometry — per-layer kv head counts (DeciLM-7B), plus
# Nemotron's ATTENTION-FREE layers (n_head 0: the block is just the FFN)
# and LINEAR-ATTENTION layers (n_head_kv 0: attention replaced by a
# single n_embd x n_embd projection of the normed input) — llm_build_deci.
register_arch(ArchSpec("deci", family="llama", rope_type="norm",
                       notes="per-layer kv heads, attn-free/linear layers"))

# plamo (PLaMo-13B): parallel residual with ONE rms norm feeding both
# branches — x + attn(n(x)) + swiglu_ffn(n(x)) (llm_build_plamo) — and
# INTERLEAVED GQA in the HF checkpoint (q head i reads kv head i % n_kv;
# rows regrouped kv-major at convert like the reference's shuffle, but
# derived from the layer shapes instead of hardcoding 5120). The upstream
# converter hardcodes n_head_kv=5 because the HF config's
# num_key_value_heads is wrong; this converter derives it from the k_proj
# plane width.
register_arch(ArchSpec("plamo", family="llama", rope_type="norm",
                       notes="parallel residual, interleaved GQA"))


def get_arch(name: str) -> ArchSpec:
    spec = ARCHITECTURES.get(name)
    if spec is None:
        raise ValueError(
            f"architecture {name!r} has no implemented forward pass; "
            f"implemented: {sorted(ARCHITECTURES)}. (The reference maps 60 "
            "arch names — entries are added here only once their forward "
            "math exists and is tested, llama-arch.h:12-72.)")
    return spec
