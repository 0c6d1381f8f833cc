"""HF checkpoint -> GGUF converter (the convert_hf_to_gguf.py analogue,
reference convert_hf_to_gguf.py LlamaModel/MixtralModel/Qwen2Model).

Reads a HuggingFace model directory (config.json + *.safetensors or
pytorch_model*.bin) and writes a GGUF the engine loads directly. Handles:
  - tensor-name remapping (model.layers.N.self_attn.q_proj -> blk.N.attn_q)
  - the NORM-rope Q/K row permutation (convert_hf_to_gguf.py:1657) for
    llama-family models
  - Mixtral expert stacking (w1/w2/w3 -> ffn_{gate,down,up}_exps)
  - SPM (tokenizer.model) and BPE (tokenizer.json) vocab export
  - output dtype F16/BF16/F32/Q8_0 (quantize further with llama-quantize)
"""
from __future__ import annotations

import json
import math
import os
import re
import sys
from typing import Iterator

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter

ARCH_MAP = {
    "LlamaForCausalLM": "llama",
    "LLaMAForCausalLM": "llama",     # legacy capitalization (reference
    #                                  LlamaModel register list)
    # InternLM3: llama graph + llama tensor names (reference
    # InternLM3Model, model_arch LLAMA, convert_hf_to_gguf.py:2931)
    "InternLM3ForCausalLM": "llama",
    "MistralForCausalLM": "llama",
    "MixtralForCausalLM": "llama",
    "Qwen2ForCausalLM": "qwen2",
    # qwen v1: MHA with fused biased c_attn, w2=gate/w1=up swiglu
    # (reference QwenModel, convert_hf_to_gguf.py:2194)
    "QWenLMHeadModel": "qwen",
    # exaone 3.5: llama graph with transformer.h.* naming (reference
    # ExaoneModel, convert_hf_to_gguf.py:4963)
    "ExaoneForCausalLM": "exaone",
    "Qwen3ForCausalLM": "qwen3",
    "Qwen2MoeForCausalLM": "qwen2moe",
    "Qwen3MoeForCausalLM": "qwen3moe",
    "TinyLlamaForCausalLM": "llama",
    "PhiForCausalLM": "phi2",
    "Phi3ForCausalLM": "phi3",
    # phi3 attention + mixtral experts + TRUE LayerNorms + lm-head bias
    # (reference PhiMoeModel, convert_hf_to_gguf.py:2616)
    "PhiMoEForCausalLM": "phimoe",
    "PhimoeForCausalLM": "phimoe",
    "FalconForCausalLM": "falcon",
    "GemmaForCausalLM": "gemma",
    "Gemma2ForCausalLM": "gemma2",
    "Gemma3ForCausalLM": "gemma3",
    # VL checkpoints: text side converted, vision tower skipped
    # (reference Gemma3Model register list, convert_hf_to_gguf.py:3362)
    "Gemma3ForConditionalGeneration": "gemma3",
    "GraniteForCausalLM": "granite",
    # granite multipliers + jetmoe-style FUSED expert planes split at
    # convert (reference GraniteMoeModel, convert_hf_to_gguf.py:5065)
    "GraniteMoeForCausalLM": "granitemoe",
    "StableLmForCausalLM": "stablelm",
    "Olmo2ForCausalLM": "olmo2",
    "OlmoeForCausalLM": "olmoe",
    "CohereForCausalLM": "command-r",
    "Cohere2ForCausalLM": "cohere2",
    # GLM-4 native class (reference ChatGLMModel also covers the
    # remote-code ChatGLM* classes; convert_hf_to_gguf.py:4766)
    "GlmForCausalLM": "chatglm",
    "Starcoder2ForCausalLM": "starcoder2",
    # text side only, like the reference's Qwen2VLModel (which also drops
    # visual.*, convert_hf_to_gguf.py:2254-2274); text-only M-RoPE with
    # equal position streams reduces to standard NEOX rope
    "Qwen2VLForConditionalGeneration": "qwen2vl",
    "Qwen2_5_VLForConditionalGeneration": "qwen2vl",
    "NemotronForCausalLM": "nemotron",
    "GPTNeoXForCausalLM": "gptneox",
    "OlmoForCausalLM": "olmo",
    # MLA + MoE family (reference DeepseekV2Model covers V2/V2.5/V3/R1,
    # convert_hf_to_gguf.py:4304)
    # deepseek v1 (16B/67B-lite MoE): llama attention + softmax top-k
    # WITHOUT renorm + always-on ungated shared experts + dense lead
    # (reference llm_build_deepseek; the HF class is remote-code, so the
    # test validates against an independent torch reference)
    "DeepseekForCausalLM": "deepseek",
    "DeepseekV2ForCausalLM": "deepseek2",
    "DeepseekV3ForCausalLM": "deepseek2",
    # embedding-class encoders (reference BertModel, convert_hf_to_gguf.py)
    "BertModel": "bert",
    # nomic-bert: bert body with NEOX rope, bias-free fused Wqkv and a
    # gated swiglu mlp (fc11 up / fc12 gate split of the HF fused plane
    # handled per-name; reference NomicBertModel, convert_hf_to_gguf.py:3124)
    "NomicBertModel": "nomic-bert",
    "BertForMaskedLM": "bert",
    "BertForSequenceClassification": "bert",
    # bert body + symmetric ALiBi + geglu (reference JinaBertV2Model,
    # convert_hf_to_gguf.py:3938; remote-code HF class)
    "JinaBertModel": "jina-bert-v2",
    "JinaBertForMaskedLM": "jina-bert-v2",
    # llama-bodied archs with convert-time tensor surgery
    "MiniCPMForCausalLM": "minicpm",
    # minicpm scales + deepseek2-style MLA attention, NEOX pe rope
    # (reference MiniCPM3Model, convert_hf_to_gguf.py:2140)
    "MiniCPM3ForCausalLM": "minicpm3",
    "InternLM2ForCausalLM": "internlm2",
    "BaichuanForCausalLM": "baichuan",
    # MQA + ALiBi + rms/swiglu body with fused kv and gate_up planes
    # (reference RefactModel, convert_hf_to_gguf.py:1443)
    "GPTRefactForCausalLM": "refact",
    # gpt2 body + ALiBi + biased swiglu + mup scales baked at convert
    # (reference JaisModel, convert_hf_to_gguf.py:4683)
    "JAISLMHeadModel": "jais",
    # llama body with TRUE LayerNorm+bias norms (the config key says rms
    # but modeling_orion uses nn.LayerNorm — reference OrionModel note)
    "OrionForCausalLM": "orion",
    # llama graph minus biases/moe/rope-factors (llm_build_xverse is a
    # strict subset of llm_build_llama; HF names are llama's)
    "XverseForCausalLM": "xverse",
    # parallel dense "residual MLP" + moe-over-layer-input (reference
    # ArcticModel; arch-specific norm mapping in tensor_mapping)
    "ArcticForCausalLM": "arctic",
    # ternary b1.58 weights quantized at convert + pre-projection
    # sub-norms (reference BitnetModel, convert_hf_to_gguf.py:1922)
    "BitnetForCausalLM": "bitnet",
    "BaiChuanForCausalLM": "baichuan",
    # learned-position LayerNorm decoder (Conv1D weights transposed)
    "GPT2LMHeadModel": "gpt2",
    "GPT2Model": "gpt2",
    # starcoder1/santacoder: gpt2 body with MQA and nn.Linear projections
    "GPTBigCodeForCausalLM": "starcoder",
    # starcoder body + NEOX rope instead of learned positions
    # (reference CodeShellModel, convert_hf_to_gguf.py:2712)
    "CodeShellForCausalLM": "codeshell",
    # ALiBi decoders (no positional embedding)
    "BloomForCausalLM": "bloom",
    "BloomModel": "bloom",
    "MptForCausalLM": "mpt",
    "MPTForCausalLM": "mpt",
    # selective state-space (recurrent cache, models/mamba.py)
    "MambaForCausalLM": "mamba",
    "MambaLMHeadModel": "mamba",     # state-spaces/mamba checkpoints
    # encoder-decoder family (reference T5Model / T5EncoderModel)
    "T5ForConditionalGeneration": "t5",
    "MT5ForConditionalGeneration": "t5",
    "T5WithLMHeadModel": "t5",
    "T5EncoderModel": "t5encoder",
    # text side only (vqmodel skipped, reference ChameleonModel)
    "ChameleonForConditionalGeneration": "chameleon",
    "ChameleonForCausalLM": "chameleon",
    # 16-expert MoE with fused Wqkv + clamp and bias-free LayerNorms
    # (reference DbrxModel, convert_hf_to_gguf.py:2016)
    "DbrxForCausalLM": "dbrx",
    # Grok-1 (reference GrokModel): 8-expert gelu MoE, post-attn/ffn rms
    # norms, hardcoded embd/logit multipliers, tied in_out_embed head
    "GrokForCausalLM": "grok",
    "Grok1ForCausalLM": "grok",
    # Apple OpenELM: PER-LAYER head counts + ffn widths (GGUF arrays),
    # fused qkv + shared per-head q/k norms, tied head (reference
    # OpenELMModel, convert_hf_to_gguf.py:3986)
    "OpenELMForCausalLM": "openelm",
    # DeciLM NAS llamas: per-layer kv heads (7B) / attention-free +
    # linear-attention layers (Nemotron-51B block_configs) — reference
    # DeciModel, convert_hf_to_gguf.py:1751
    "DeciLMForCausalLM": "deci",
    # PLaMo-13B: parallel residual + INTERLEAVED GQA regrouped kv-major
    # at convert (reference PlamoModel's shuffles, generalized from the
    # layer shapes; its hardcoded n_head_kv=5 is derived from the k_proj
    # plane width instead — the HF config's num_key_value_heads is wrong)
    "PlamoForCausalLM": "plamo",
    # RWKV6 "finch" linear-attention RNN (reference Rwkv6Model,
    # convert_hf_to_gguf.py:3445): recurrent token-shift + wkv states,
    # models/rwkv6.py surface
    "Rwkv6ForCausalLM": "rwkv6",
    # QRWKV6 (qwen2.5 converted to rwkv6 linear attention — reference
    # RWKV6Qwen2Model): rms/swiglu qwen body, gated-linear-attn time mix
    "RWKV6Qwen2ForCausalLM": "rwkv6qwen2",
    # RWKV7 "goose" + the qwen-distilled ARWKV7 hybrid (reference
    # Rwkv7Model / ARwkv7Model, convert_hf_to_gguf.py:3571,3690):
    # DeltaNet-style rank-1 state transitions, models/rwkv7.py surface
    "Rwkv7ForCausalLM": "rwkv7",
    "RWKV7ForCausalLM": "rwkv7",
    "RwkvHybridForCausalLM": "arwkv7",
}

# rwkv6 HF names (reference gguf-py tensor_mapping rwkv6 rows). The five
# time_maa_{w,k,v,r,g} lerps stack into time_mix_lerp_fused in convert()
RWKV6_TOP_MAP = {
    "rwkv.embeddings.weight": "token_embd.weight",
    "rwkv.blocks.0.pre_ln.weight": "token_embd_norm.weight",
    "rwkv.blocks.0.pre_ln.bias": "token_embd_norm.bias",
    "rwkv.ln_out.weight": "output_norm.weight",
    "rwkv.ln_out.bias": "output_norm.bias",
    "head.weight": "output.weight",
}
RWKV6_LAYER_MAP = {
    "ln1.weight": "attn_norm.weight",
    "ln1.bias": "attn_norm.bias",
    "ln2.weight": "attn_norm_2.weight",
    "ln2.bias": "attn_norm_2.bias",
    "attention.time_maa_x": "time_mix_lerp_x.weight",
    "attention.time_maa_w1": "time_mix_w1.weight",
    "attention.time_maa_w2": "time_mix_w2.weight",
    "attention.time_faaaa": "time_mix_first.weight",
    "attention.time_decay": "time_mix_decay.weight",
    "attention.time_decay_w1": "time_mix_decay_w1.weight",
    "attention.time_decay_w2": "time_mix_decay_w2.weight",
    "attention.key.weight": "time_mix_key.weight",
    "attention.value.weight": "time_mix_value.weight",
    "attention.receptance.weight": "time_mix_receptance.weight",
    "attention.gate.weight": "time_mix_gate.weight",
    "attention.ln_x.weight": "time_mix_ln.weight",
    "attention.ln_x.bias": "time_mix_ln.bias",
    "attention.output.weight": "time_mix_output.weight",
    "feed_forward.time_maa_k": "channel_mix_lerp_k.weight",
    "feed_forward.time_maa_r": "channel_mix_lerp_r.weight",
    "feed_forward.key.weight": "channel_mix_key.weight",
    "feed_forward.receptance.weight": "channel_mix_receptance.weight",
    "feed_forward.value.weight": "channel_mix_value.weight",
}


# rwkv7/arwkv7 layer-suffix map AFTER the reference's name-normalization
# replaces (blocks->layers, self_attn/attn->attention, ffn->feed_forward,
# time_mixer.->"", feed_forward_norm->ln2, g_norm->ln_x)
RWKV7_LAYER_MAP = {
    "ln1.weight": "attn_norm.weight",
    "ln1.bias": "attn_norm.bias",
    "ln2.weight": "attn_norm_2.weight",
    "ln2.bias": "attn_norm_2.bias",
    "input_layernorm.weight": "attn_norm.weight",       # arwkv7
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "attention.w0": "time_mix_w0.weight",
    "attention.w1": "time_mix_w1.weight",
    "attention.w2": "time_mix_w2.weight",
    "attention.a0": "time_mix_a0.weight",
    "attention.a1": "time_mix_a1.weight",
    "attention.a2": "time_mix_a2.weight",
    "attention.v0": "time_mix_v0.weight",
    "attention.v1": "time_mix_v1.weight",
    "attention.v2": "time_mix_v2.weight",
    "attention.g1": "time_mix_g1.weight",
    "attention.g2": "time_mix_g2.weight",
    "attention.k_k": "time_mix_k_k.weight",
    "attention.k_a": "time_mix_k_a.weight",
    "attention.r_k": "time_mix_r_k.weight",
    "attention.key.weight": "time_mix_key.weight",
    "attention.k_proj.weight": "time_mix_key.weight",
    "attention.value.weight": "time_mix_value.weight",
    "attention.v_proj.weight": "time_mix_value.weight",
    "attention.receptance.weight": "time_mix_receptance.weight",
    "attention.r_proj.weight": "time_mix_receptance.weight",
    "attention.output.weight": "time_mix_output.weight",
    "attention.o_proj.weight": "time_mix_output.weight",
    "attention.ln_x.weight": "time_mix_ln.weight",
    "attention.ln_x.bias": "time_mix_ln.bias",
    "feed_forward.x_k": "channel_mix_lerp_k.weight",
    "feed_forward.key.weight": "channel_mix_key.weight",
    "feed_forward.value.weight": "channel_mix_value.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",          # arwkv7
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}
RWKV7_TOP_MAP = {
    "model.embeddings.weight": "token_embd.weight",
    "model.embed_tokens.weight": "token_embd.weight",   # arwkv7
    "model.pre_ln.weight": "token_embd_norm.weight",
    "model.pre_ln.bias": "token_embd_norm.bias",
    "model.ln_out.weight": "output_norm.weight",
    "model.ln_out.bias": "output_norm.bias",
    "model.norm.weight": "output_norm.weight",          # arwkv7
    "head.weight": "output.weight",
    "lm_head.weight": "output.weight",
}


def _convert_rwkv7(path: str, out_path: str, cfg: dict, arch: str,
                   dtype: str) -> None:
    """RWKV7 / ARWKV7 converter (reference Rwkv7Model/ARwkv7Model):
    normalizes the HF/fla name variants, transposes the low-rank
    w/a/v/g planes to math layout (skipped for fla's _lora.lora format,
    which is already transposed), fuses the x_r..x_g lerps, and drops
    layer 0's dummy v0/v1/v2 (v_first IS layer 0's value)."""
    C = cfg["hidden_size"]
    L = cfg["num_hidden_layers"]
    head_size = cfg.get("head_size", cfg.get("head_dim", 64))
    has_gate = bool(cfg.get("wkv_has_gate", True))
    lerp_list = "rwkva" + ("g" if has_gate else "")
    ggml_dtype = {"F16": GGMLType.F16, "BF16": GGMLType.BF16,
                  "F32": GGMLType.F32, "Q8_0": GGMLType.Q8_0}[dtype]
    w = GGUFWriter(out_path, arch=arch)
    eps_key = (f"{arch}.attention.layer_norm_rms_epsilon"
               if arch == "arwkv7"
               else f"{arch}.attention.layer_norm_epsilon")
    md = {
        "general.architecture": arch,
        "general.name": cfg.get("_name_or_path", os.path.basename(path)),
        f"{arch}.context_length": 1048576,
        f"{arch}.embedding_length": C,
        f"{arch}.block_count": L,
        eps_key: cfg.get("layer_norm_epsilon",
                         cfg.get("norm_eps",
                                 cfg.get("rms_norm_eps", 1e-5))),
        f"{arch}.wkv.head_size": head_size,
        f"{arch}.feed_forward_length": (cfg.get("intermediate_size")
                                        or C * 4),
        f"{arch}.vocab_size": cfg["vocab_size"],
        f"{arch}.attention.head_count": 0,
    }
    if arch == "arwkv7":
        md[f"{arch}.token_shift_count"] = 1
    world = os.path.join(path, "rwkv_vocab_v20230424.txt")
    if os.path.exists(world):
        import ast
        tokens, types = ["<s>"], [3]
        with open(world, encoding="utf-8") as f:
            for line in f:
                parts = line.split(" ")
                tok = ast.literal_eval(" ".join(parts[1:-1]))
                tok = tok.encode("utf-8") if isinstance(tok, str) else tok
                tokens.append(repr(tok)[2:-1])
                types.append(1)
        for i in range(len(tokens), cfg["vocab_size"]):
            tokens.append(f"[PAD{i}]")
            types.append(5)
        md.update({"tokenizer.ggml.model": "rwkv",
                   "tokenizer.ggml.tokens": tokens,
                   "tokenizer.ggml.token_type": np.asarray(types,
                                                           np.int32)})
    else:
        md.update(_vocab_metadata(path, cfg))
    # lora ranks recorded for reference parity (the loader derives them
    # from the tensor shapes); filled in after the tensor pass
    lerps: dict[int, dict[str, np.ndarray]] = {}
    ranks: dict[str, int] = {}
    tensors: list[tuple[str, np.ndarray]] = []
    for name, arr in iter_hf_tensors(path):
        fla_lora = "_lora.lora" in name
        name = name.replace("blocks", "layers") \
                   .replace("ffn", "feed_forward") \
                   .replace("self_attn", "attention") \
                   .replace("attn", "attention") \
                   .replace("time_mixer.", "") \
                   .replace("_lora.lora.0.weight", "1.weight") \
                   .replace("_lora.lora.2.weight", "2.weight") \
                   .replace("_lora.lora.2.bias", "0.weight") \
                   .replace("feed_forward_norm", "ln2") \
                   .replace("g_norm", "ln_x")
        a = np.asarray(arr, np.float32)
        if name in RWKV7_TOP_MAP:
            tensors.append((RWKV7_TOP_MAP[name], a))
            continue
        if name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            li_s, _, suffix = rest.partition(".")
            li = int(li_s)
            if suffix in ("pre_norm.weight", "pre_norm.bias"):
                tensors.append((
                    "token_embd_norm." + suffix.split(".")[-1], a))
                continue
            m = re.match(r"attention\.x_([rwkvag])$", suffix)
            if m:
                lerps.setdefault(li, {})[m.group(1)] = a.reshape(-1)
                if len(lerps[li]) == len(lerp_list):
                    d = lerps.pop(li)
                    tensors.append((
                        f"blk.{li}.time_mix_lerp_fused.weight",
                        np.stack([d[s] for s in lerp_list])))
                continue
            if suffix == "attention.x_x":      # pre-fused variant
                tensors.append((f"blk.{li}.time_mix_lerp_fused.weight",
                                a.reshape(len(lerp_list), C)))
                continue
            mapped = RWKV7_LAYER_MAP.get(suffix)
            if mapped is None:
                continue
            if li == 0 and mapped.startswith(("time_mix_v0",
                                              "time_mix_v1",
                                              "time_mix_v2")):
                continue    # dummy first-layer value-residual planes
            if mapped.endswith(("_w0.weight", "_a0.weight",
                                "_v0.weight", "_k_k.weight",
                                "_k_a.weight", "_r_k.weight")):
                a = a.reshape(-1)
            elif mapped[-9:-7] in ("w1", "a1", "v1", "g1", "w2",
                                   "a2", "v2", "g2") and not fla_lora:
                a = np.ascontiguousarray(a.T)
            if mapped.endswith(("w1.weight", "a1.weight", "v1.weight",
                                "g1.weight")):
                ranks[mapped[-9:-7]] = a.shape[0]
            tensors.append((f"blk.{li}.{mapped}", a))
            continue
    md[f"{arch}.attention.decay_lora_rank"] = ranks.get("w1", 64)
    md[f"{arch}.attention.iclr_lora_rank"] = ranks.get("a1", 64)
    md[f"{arch}.attention.value_residual_mix_lora_rank"] = \
        ranks.get("v1", 32)
    md[f"{arch}.attention.gate_lora_rank"] = \
        ranks.get("g1", 128 if has_gate else 0)
    for key, val in md.items():
        w.add_kv(key, val)
    for gname, a in tensors:
        tgt = ggml_dtype if a.ndim == 2 and "norm" not in gname \
            and "lerp" not in gname else GGMLType.F32
        w.add_tensor(gname, a, ggml_type=tgt)
    w.write()


def _convert_rwkv6(path: str, out_path: str, cfg: dict, arch: str,
                   dtype: str) -> None:
    """RWKV6 / RWKV6Qwen2 converter (reference Rwkv6Model /
    RWKV6Qwen2Model): math-layout transposes for the low-rank lerp/decay
    planes, the five time_maa lerps fused into one [5, C] stack, and the
    fp16 rescale trick baked in — time_mix_output / channel_mix_value
    divided by 2^(il//rescale_every) (the runtime halves activations
    every rescale_every layers; the composition equals the unscaled
    model since LayerNorm is scale-invariant). The qwen2 variant maps
    q/k/v/o/gate projections (with biases) onto the time-mix slots, the
    qwen mlp + norms, GQA head_count_kv, and permutes the low-rank lerp
    planes' 5-axis from the checkpoint's rkvwg order to wkvrg."""
    C = cfg["hidden_size"]
    L = cfg["num_hidden_layers"]
    qrwkv = arch == "rwkv6qwen2"
    rescale = 0 if qrwkv else int(cfg.get("rescale_every", 6) or 0)
    head_size = (C // cfg["num_attention_heads"] if qrwkv
                 else cfg.get("head_size", 64))
    ggml_dtype = {"F16": GGMLType.F16, "BF16": GGMLType.BF16,
                  "F32": GGMLType.F32, "Q8_0": GGMLType.Q8_0}[dtype]
    w = GGUFWriter(out_path, arch=arch)
    eps_key = (f"{arch}.attention.layer_norm_rms_epsilon" if qrwkv
               else f"{arch}.attention.layer_norm_epsilon")
    md = {
        "general.architecture": arch,
        "general.name": cfg.get("_name_or_path", os.path.basename(path)),
        f"{arch}.context_length": 1048576,   # not context limited
        f"{arch}.embedding_length": C,
        f"{arch}.block_count": L,
        eps_key: cfg.get("rms_norm_eps" if qrwkv else "layer_norm_epsilon",
                         1e-5),
        f"{arch}.rescale_every_n_layers": rescale,
        f"{arch}.wkv.head_size": head_size,
        f"{arch}.feed_forward_length": (
            cfg.get("intermediate_size")
            or int((C * 3.5) // 32 * 32)),
        f"{arch}.vocab_size": cfg["vocab_size"],
        f"{arch}.attention.head_count": 0,
    }
    if qrwkv:
        md[f"{arch}.token_shift_count"] = 1
        md[f"{arch}.attention.head_count_kv"] = \
            cfg["num_key_value_heads"]
    world = os.path.join(path, "rwkv_vocab_v20230424.txt")
    if os.path.exists(world):
        # reference _set_vocab_rwkv_world: byte-repr token texts, <s> at
        # id 0, [PADn] to vocab_size; rides the trie tokenizer
        tokens = ["<s>"]
        types = [3]   # CONTROL
        with open(world, encoding="utf-8") as f:
            for line in f:
                parts = line.split(" ")
                import ast
                tok = ast.literal_eval(" ".join(parts[1:-1]))
                tok = tok.encode("utf-8") if isinstance(tok, str) else tok
                tokens.append(repr(tok)[2:-1])
                types.append(1)
        for i in range(len(tokens), cfg["vocab_size"]):
            tokens.append(f"[PAD{i}]")
            types.append(5)
        md.update({"tokenizer.ggml.model": "rwkv",
                   "tokenizer.ggml.tokens": tokens,
                   "tokenizer.ggml.token_type": np.asarray(types,
                                                           np.int32)})
    else:
        md.update(_vocab_metadata(path, cfg))
    for key, val in md.items():
        w.add_kv(key, val)

    lerps: dict[int, dict[str, np.ndarray]] = {}
    qmap = {   # qwen-projection -> time-mix slots (tensor_mapping rows)
        "self_attn.q_proj.weight": "time_mix_receptance.weight",
        "self_attn.q_proj.bias": "time_mix_receptance.bias",
        "self_attn.k_proj.weight": "time_mix_key.weight",
        "self_attn.k_proj.bias": "time_mix_key.bias",
        "self_attn.v_proj.weight": "time_mix_value.weight",
        "self_attn.v_proj.bias": "time_mix_value.bias",
        "self_attn.o_proj.weight": "time_mix_output.weight",
        "self_attn.gate.weight": "time_mix_gate.weight",
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }
    qtop = {"model.embed_tokens.weight": "token_embd.weight",
            "model.norm.weight": "output_norm.weight",
            "lm_head.weight": "output.weight"}
    for name, arr in iter_hf_tensors(path):
        a = np.asarray(arr, np.float32)
        if qrwkv:
            if name in qtop:
                w.add_tensor(qtop[name], a,
                             ggml_type=ggml_dtype if a.ndim == 2
                             else GGMLType.F32)
                continue
            if name.startswith("model.layers."):
                rest = name[len("model.layers."):]
                li_s, _, suffix = rest.partition(".")
                if suffix in qmap:
                    gname = f"blk.{li_s}.{qmap[suffix]}"
                    tgt = ggml_dtype if a.ndim == 2 and \
                        "norm" not in gname else GGMLType.F32
                    w.add_tensor(gname, a, ggml_type=tgt)
                    continue
                # time_maa_* / time_decay* ride the rwkv6 branch below
                name = f"rwkv.blocks.{li_s}.attention." + \
                    suffix.partition(".")[2] \
                    if suffix.startswith("self_attn.") else name
        if name in RWKV6_TOP_MAP:
            gname = RWKV6_TOP_MAP[name]
        elif name.startswith("rwkv.blocks."):
            rest = name[len("rwkv.blocks."):]
            li_s, _, suffix = rest.partition(".")
            li = int(li_s)
            m = re.match(r"attention\.time_maa_([wkvrg])$", suffix)
            if m:
                lerps.setdefault(li, {})[m.group(1)] = a.reshape(-1)
                if len(lerps[li]) == 5:
                    d = lerps.pop(li)
                    w.add_tensor(
                        f"blk.{li}.time_mix_lerp_fused.weight",
                        np.stack([d[s] for s in "wkvrg"]),
                        ggml_type=GGMLType.F32)
                continue
            mapped = RWKV6_LAYER_MAP.get(suffix)
            if mapped is None:
                continue
            gname = f"blk.{li}.{mapped}"
            if mapped in ("time_mix_w1.weight",
                          "time_mix_decay_w1.weight",
                          "time_mix_decay_w2.weight"):
                a = np.ascontiguousarray(a.T)
            elif mapped == "time_mix_w2.weight":
                a = np.ascontiguousarray(a.transpose(0, 2, 1))
            if qrwkv and mapped in ("time_mix_w1.weight",
                                    "time_mix_w2.weight"):
                # checkpoint lerp order rkvwg -> wkvrg (reference
                # RWKV6Qwen2Model.modify_tensors permute)
                v = a.reshape(5, -1, *a.shape[1:]) if a.ndim == 2 \
                    else a
                a = np.ascontiguousarray(
                    v[[3, 1, 2, 0, 4]]).reshape(a.shape)
            elif mapped in ("time_mix_decay.weight",
                            "time_mix_lerp_x.weight",
                            "channel_mix_lerp_k.weight",
                            "channel_mix_lerp_r.weight"):
                a = a.reshape(-1)
            if rescale > 0 and mapped in ("time_mix_output.weight",
                                          "channel_mix_value.weight"):
                a = a / (2 ** (li // rescale))
        else:
            continue
        tgt = ggml_dtype if a.ndim == 2 and "norm" not in gname \
            and "lerp" not in gname else GGMLType.F32
        w.add_tensor(gname, a, ggml_type=tgt)
    w.write()

# openelm HF names (reference gguf-py tensor_mapping openelm rows);
# ffn.proj_1 (fused gate;up at the layer's ffn width) split in convert()
OPENELM_TOP_MAP = {
    "transformer.token_embeddings.weight": "token_embd.weight",
    "transformer.norm.weight": "output_norm.weight",
}
OPENELM_LAYER_MAP = {
    "attn_norm.weight": "attn_norm.weight",
    "attn.qkv_proj.weight": "attn_qkv.weight",
    "attn.q_norm.weight": "attn_q_norm.weight",
    "attn.k_norm.weight": "attn_k_norm.weight",
    "attn.out_proj.weight": "attn_output.weight",
    "ffn_norm.weight": "ffn_norm.weight",
    "ffn.proj_2.weight": "ffn_down.weight",
}


def _make_divisible(v, divisor: int) -> int:
    """OpenELM ffn width rounding (reference OpenELMModel._make_divisible,
    convert_hf_to_gguf.py:3989-3996)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _peek_shapes(path: str) -> dict[str, tuple]:
    """Tensor name -> shape without loading data (safetensors headers;
    .bin fallback loads the shards)."""
    shapes: dict[str, tuple] = {}
    st_files = sorted(f for f in os.listdir(path)
                      if f.endswith(".safetensors"))
    if st_files:
        from safetensors import safe_open
        for f in st_files:
            with safe_open(os.path.join(path, f), framework="np") as sf:
                for n in sf.keys():
                    shapes[n] = tuple(sf.get_slice(n).get_shape())
        return shapes
    for n, a in iter_hf_tensors(path):
        shapes[n] = tuple(a.shape)
    return shapes

# mamba (reference MambaModel converter): A_log -> -exp(A_log) at
# convert; depthwise conv taps [d_inner, 1, d_conv] -> [d_inner, d_conv]
MAMBA_TOP_MAP = {
    "backbone.embeddings.weight": "token_embd.weight",
    "backbone.embedding.weight": "token_embd.weight",
    "backbone.norm_f.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
}
MAMBA_LAYER_MAP = {
    "norm.weight": "attn_norm.weight",
    "mixer.in_proj.weight": "ssm_in.weight",
    "mixer.conv1d.weight": "ssm_conv1d.weight",
    "mixer.conv1d.bias": "ssm_conv1d.bias",
    "mixer.x_proj.weight": "ssm_x.weight",
    "mixer.dt_proj.weight": "ssm_dt.weight",
    "mixer.dt_proj.bias": "ssm_dt.bias",
    "mixer.A_log": "ssm_a.weight",
    "mixer.D": "ssm_d.weight",
    "mixer.out_proj.weight": "ssm_out.weight",
}

# mpt (reference MPTModel converter): contiguous fused Wqkv, bias-free
MPT_TOP_MAP = {
    "wte.weight": "token_embd.weight",
    "norm_f.weight": "output_norm.weight",
    "norm_f.bias": "output_norm.bias",
}
MPT_LAYER_MAP = {
    "norm_1.weight": "attn_norm.weight",
    "norm_1.bias": "attn_norm.bias",
    "attn.Wqkv.weight": "attn_qkv.weight",
    "attn.Wqkv.bias": "attn_qkv.bias",
    "attn.out_proj.weight": "attn_output.weight",
    "attn.out_proj.bias": "attn_output.bias",
    "norm_2.weight": "ffn_norm.weight",
    "norm_2.bias": "ffn_norm.bias",
    "ffn.up_proj.weight": "ffn_up.weight",
    "ffn.up_proj.bias": "ffn_up.bias",
    "ffn.down_proj.weight": "ffn_down.weight",
    "ffn.down_proj.bias": "ffn_down.bias",
}

# bloom (reference BloomModel converter): per-head-interleaved fused qkv
# deinterleaved in the convert loop; embedding LayerNorm kept
BLOOM_TOP_MAP = {
    "word_embeddings.weight": "token_embd.weight",
    "word_embeddings_layernorm.weight": "token_embd_norm.weight",
    "word_embeddings_layernorm.bias": "token_embd_norm.bias",
    "ln_f.weight": "output_norm.weight",
    "ln_f.bias": "output_norm.bias",
}
BLOOM_LAYER_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "self_attention.query_key_value.weight": "attn_qkv.weight",
    "self_attention.query_key_value.bias": "attn_qkv.bias",
    "self_attention.dense.weight": "attn_output.weight",
    "self_attention.dense.bias": "attn_output.bias",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.bias": "ffn_norm.bias",
    "mlp.dense_h_to_4h.weight": "ffn_up.weight",
    "mlp.dense_h_to_4h.bias": "ffn_up.bias",
    "mlp.dense_4h_to_h.weight": "ffn_down.weight",
    "mlp.dense_4h_to_h.bias": "ffn_down.bias",
}

# gpt2 (reference GPT2Model converter): Conv1D projections transpose at
# convert; learned positions ride position_embd like bert
GPT2_TOP_MAP = {
    "transformer.wte.weight": "token_embd.weight",
    "transformer.wpe.weight": "position_embd.weight",
    "transformer.ln_f.weight": "output_norm.weight",
    "transformer.ln_f.bias": "output_norm.bias",
    "lm_head.weight": "output.weight",   # untied variants (codeshell)
}
GPT2_LAYER_MAP = {
    "ln_1.weight": "attn_norm.weight",
    "ln_1.bias": "attn_norm.bias",
    "attn.c_attn.weight": "attn_qkv.weight",
    "attn.c_attn.bias": "attn_qkv.bias",
    "attn.c_proj.weight": "attn_output.weight",
    "attn.c_proj.bias": "attn_output.bias",
    "ln_2.weight": "ffn_norm.weight",
    "ln_2.bias": "ffn_norm.bias",
    "mlp.c_fc.weight": "ffn_up.weight",
    "mlp.c_fc.bias": "ffn_up.bias",
    "mlp.c_proj.weight": "ffn_down.weight",
    "mlp.c_proj.bias": "ffn_down.bias",
}
# HF Conv1D stores [in, out]; GGUF wants [out, in]
GPT2_TRANSPOSE = ("attn_qkv.weight", "attn_output.weight",
                  "ffn_up.weight", "ffn_down.weight")

# internlm2 HF names (reference InternLM2Model; wqkv handled separately)
INTERNLM2_TOP_MAP = {
    "model.tok_embeddings.weight": "token_embd.weight",
    "model.norm.weight": "output_norm.weight",
    "output.weight": "output.weight",
}
INTERNLM2_LAYER_MAP = {
    "attention.wo.weight": "attn_output.weight",
    "feed_forward.w1.weight": "ffn_gate.weight",
    "feed_forward.w3.weight": "ffn_up.weight",
    "feed_forward.w2.weight": "ffn_down.weight",
    "attention_norm.weight": "attn_norm.weight",
    "ffn_norm.weight": "ffn_norm.weight",
}

# bert: HF encoder.layer.N.* names (reference gguf-py tensor_mapping bert
# entries); biased projections + post-norm LayerNorms
BERT_TOP_MAP = {
    "embeddings.word_embeddings.weight": "token_embd.weight",
    "embeddings.position_embeddings.weight": "position_embd.weight",
    "embeddings.token_type_embeddings.weight": "token_types.weight",
    "embeddings.LayerNorm.weight": "token_embd_norm.weight",
    "embeddings.LayerNorm.bias": "token_embd_norm.bias",
}
BERT_LAYER_MAP = {
    "attention.self.query.weight": "attn_q.weight",
    "attention.self.query.bias": "attn_q.bias",
    "attention.self.key.weight": "attn_k.weight",
    "attention.self.key.bias": "attn_k.bias",
    "attention.self.value.weight": "attn_v.weight",
    "attention.self.value.bias": "attn_v.bias",
    "attention.output.dense.weight": "attn_output.weight",
    "attention.output.dense.bias": "attn_output.bias",
    "attention.output.LayerNorm.weight": "attn_output_norm.weight",
    "attention.output.LayerNorm.bias": "attn_output_norm.bias",
    "intermediate.dense.weight": "ffn_up.weight",
    "intermediate.dense.bias": "ffn_up.bias",
    "output.dense.weight": "ffn_down.weight",
    "output.dense.bias": "ffn_down.bias",
    "output.LayerNorm.weight": "layer_output_norm.weight",
    "output.LayerNorm.bias": "layer_output_norm.bias",
}

# nomic-bert HF names (reference tensor_mapping nomic rows): encoder
# layers with fused bias-free Wqkv, post-attn norm1 / post-mlp norm2,
# swiglu mlp planes fc11 (up) / fc12 (gate) / fc2 (down)
NOMIC_TOP_MAP = {
    "embeddings.word_embeddings.weight": "token_embd.weight",
    "embeddings.token_type_embeddings.weight": "token_types.weight",
    "emb_ln.weight": "token_embd_norm.weight",
    "emb_ln.bias": "token_embd_norm.bias",
}
NOMIC_LAYER_MAP = {
    "attn.Wqkv.weight": "attn_qkv.weight",
    "attn.out_proj.weight": "attn_output.weight",
    "norm1.weight": "attn_output_norm.weight",
    "norm1.bias": "attn_output_norm.bias",
    "mlp.fc11.weight": "ffn_up.weight",
    "mlp.fc12.weight": "ffn_gate.weight",
    "mlp.fc2.weight": "ffn_down.weight",
    "norm2.weight": "layer_output_norm.weight",
    "norm2.bias": "layer_output_norm.bias",
}

# grok (reference GrokModel + tensor_mapping Grok rows): rms_norm_1/3
# are POST-branch norms (the engine's gemma2 sandwich slots, remapped
# at load); per-expert moe planes linear(gate)/linear_v(up)/
# linear_1(down) are stacked in convert()
GROK_TOP_MAP = {
    "transformer.in_out_embed.weight": "token_embd.weight",
    "transformer.rms_norm.weight": "output_norm.weight",
}
GROK_LAYER_MAP = {
    "rms_norm.weight": "attn_norm.weight",
    "multi_head_attention.query.weight": "attn_q.weight",
    "multi_head_attention.key.weight": "attn_k.weight",
    "multi_head_attention.value.weight": "attn_v.weight",
    "multi_head_attention.linear.weight": "attn_output.weight",
    "rms_norm_1.weight": "attn_output_norm.weight",
    "rms_norm_2.weight": "ffn_norm.weight",
    "router.weight": "ffn_gate_inp.weight",
    "rms_norm_3.weight": "layer_output_norm.weight",
}

# refact (reference RefactModel + tensor_mapping refact rows)
REFACT_LAYER_MAP = {
    "ln_1.weight": "attn_norm.weight",
    "attn.q.weight": "attn_q.weight",
    "attn.c_proj.weight": "attn_output.weight",
    "ln_2.weight": "ffn_norm.weight",
    "mlp.linear_1.weight": "ffn_gate.weight",
    "mlp.linear_3.weight": "ffn_up.weight",
    "mlp.c_proj.weight": "ffn_down.weight",
}

# jais (reference JaisModel + tensor_mapping jais rows): gpt2-style
# Conv1D tensors (transposed at convert); c_fc2 is the GATE (silu side),
# c_fc the up projection — the reference's mapping choice, followed here
# for GGUF parity
JAIS_LAYER_MAP = {
    "ln_1.weight": "attn_norm.weight",
    "ln_1.bias": "attn_norm.bias",
    "attn.c_attn.weight": "attn_qkv.weight",
    "attn.c_attn.bias": "attn_qkv.bias",
    "attn.c_proj.weight": "attn_output.weight",
    "attn.c_proj.bias": "attn_output.bias",
    "ln_2.weight": "ffn_norm.weight",
    "ln_2.bias": "ffn_norm.bias",
    "mlp.c_fc.weight": "ffn_up.weight",
    "mlp.c_fc.bias": "ffn_up.bias",
    "mlp.c_fc2.weight": "ffn_gate.weight",
    "mlp.c_fc2.bias": "ffn_gate.bias",
    "mlp.c_proj.weight": "ffn_down.weight",
    "mlp.c_proj.bias": "ffn_down.bias",
}

# qwen v1 (reference tensor_mapping qwen rows): gpt2-style prefixes,
# fused biased c_attn, and the w2(gate)/w1(up) swiglu naming
QWEN1_TOP_MAP = {
    "transformer.wte.weight": "token_embd.weight",
    "transformer.ln_f.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
}
QWEN1_LAYER_MAP = {
    "ln_1.weight": "attn_norm.weight",
    "attn.c_attn.weight": "attn_qkv.weight",
    "attn.c_attn.bias": "attn_qkv.bias",
    "attn.c_proj.weight": "attn_output.weight",
    "ln_2.weight": "ffn_norm.weight",
    "mlp.w2.weight": "ffn_gate.weight",   # silu(w2(x)) * w1(x)
    "mlp.w1.weight": "ffn_up.weight",
    "mlp.c_proj.weight": "ffn_down.weight",
}

# exaone 3.5 (reference tensor_mapping exaone rows)
EXAONE_TOP_MAP = {
    "transformer.wte.weight": "token_embd.weight",
    "transformer.ln_f.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
}
EXAONE_LAYER_MAP = {
    "ln_1.weight": "attn_norm.weight",
    "attn.attention.q_proj.weight": "attn_q.weight",
    "attn.attention.k_proj.weight": "attn_k.weight",
    "attn.attention.v_proj.weight": "attn_v.weight",
    "attn.attention.out_proj.weight": "attn_output.weight",
    "ln_2.weight": "ffn_norm.weight",
    "mlp.c_fc_0.weight": "ffn_gate.weight",
    "mlp.c_fc_1.weight": "ffn_up.weight",
    "mlp.c_proj.weight": "ffn_down.weight",
}

# jina-bert-v2 extras over the bert names (reference tensor_mapping
# jina rows: mlp.wo / mlp.layernorm; gated_layers split in convert())
JINA_EXTRA_MAP = {
    "mlp.wo.weight": "ffn_down.weight",
    "mlp.wo.bias": "ffn_down.bias",
    "mlp.layernorm.weight": "layer_output_norm.weight",
    "mlp.layernorm.bias": "layer_output_norm.bias",
}

# HF suffix -> GGUF suffix (per-layer), mirroring gguf-py tensor_mapping
LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.o_proj.bias": "attn_output.bias",   # phimoe attention_bias
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.bias": "attn_v.bias",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.bias": "ffn_norm.bias",
    # deci Nemotron linear-attention layers: attention replaced by one
    # n_embd x n_embd projection stored under the wo slot (reference
    # tensor_mapping ATTN_OUT "self_attn.linear_attn" row)
    "self_attn.linear_attn.weight": "attn_output.weight",
    # plamo layer norm (model.layers.layers.{i}.norm, renamed in the
    # convert loop to ride this map)
    "norm.weight": "attn_norm.weight",
    "block_sparse_moe.gate.weight": "ffn_gate_inp.weight",
    # qwen3 per-head q/k norms
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    # bitnet pre-projection sub-norms
    "self_attn.inner_attn_ln.weight": "attn_sub_norm.weight",
    "mlp.ffn_layernorm.weight": "ffn_sub_norm.weight",
    # qwen2moe router + shared expert (Qwen2MoeSparseMoeBlock)
    "mlp.gate.weight": "ffn_gate_inp.weight",
    "mlp.shared_expert.gate_proj.weight": "ffn_gate_shexp.weight",
    "mlp.shared_expert.up_proj.weight": "ffn_up_shexp.weight",
    "mlp.shared_expert.down_proj.weight": "ffn_down_shexp.weight",
    "mlp.shared_expert_gate.weight": "ffn_gate_inp_shexp.weight",
    # deepseek2 MLA attention + shared experts (note the plural
    # 'shared_experts' vs qwen2moe's singular; reference gguf-py
    # tensor_mapping.py ATTN_Q_A/ATTN_KV_A_MQA/... entries)
    "self_attn.q_a_proj.weight": "attn_q_a.weight",
    "self_attn.q_a_layernorm.weight": "attn_q_a_norm.weight",
    "self_attn.q_b_proj.weight": "attn_q_b.weight",
    "self_attn.kv_a_proj_with_mqa.weight": "attn_kv_a_mqa.weight",
    "self_attn.kv_a_layernorm.weight": "attn_kv_a_norm.weight",
    "self_attn.kv_b_proj.weight": "attn_kv_b.weight",
    "mlp.shared_experts.gate_proj.weight": "ffn_gate_shexp.weight",
    "mlp.shared_experts.up_proj.weight": "ffn_up_shexp.weight",
    "mlp.shared_experts.down_proj.weight": "ffn_down_shexp.weight",
    "mlp.gate.e_score_correction_bias": "exp_probs_b.bias",
}

# starcoder2: c_fc/c_proj non-gated MLP with biases everywhere
STARCODER2_LAYER_MAP = dict(LAYER_MAP)
STARCODER2_LAYER_MAP.update({
    "self_attn.o_proj.bias": "attn_output.bias",
    "mlp.c_fc.weight": "ffn_up.weight",
    "mlp.c_fc.bias": "ffn_up.bias",
    "mlp.c_proj.weight": "ffn_down.weight",
    "mlp.c_proj.bias": "ffn_down.bias",
})

# olmo2: post-norm-only — post_attention/post_feedforward norms map to the
# POST-norm tensors; there are no pre-norm tensors at all
OLMO2_LAYER_MAP = dict(LAYER_MAP)
del OLMO2_LAYER_MAP["input_layernorm.weight"]
del OLMO2_LAYER_MAP["input_layernorm.bias"]
OLMO2_LAYER_MAP.update({
    "post_attention_layernorm.weight": "post_attention_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
})

# gemma2/gemma3 sandwich norms (reference Gemma2Model/Gemma3Model
# modify_tensors): post_attention_layernorm is the attention POST-norm,
# pre_feedforward_layernorm is the actual FFN pre-norm
GEMMA2_LAYER_MAP = dict(LAYER_MAP)
GEMMA2_LAYER_MAP.update({
    "post_attention_layernorm.weight": "post_attention_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
})

# phi3: fused qkv_proj / gate_up_proj rows are SPLIT into the standard
# llama-style tensors at convert time (the forward is plain pre-norm
# SwiGLU with neox rope — reference llm_build_phi3)
PHI3_LAYER_MAP = {
    "self_attn.o_proj.weight": "attn_output.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
}

# phi2 (HF PhiForCausalLM): dense attn out, fc1/fc2 MLP, LayerNorm biases
PHI2_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.dense.weight": "attn_output.weight",
    "self_attn.dense.bias": "attn_output.bias",
    "mlp.fc1.weight": "ffn_up.weight",
    "mlp.fc1.bias": "ffn_up.bias",
    "mlp.fc2.weight": "ffn_down.weight",
    "mlp.fc2.bias": "ffn_down.bias",
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
}
PHI2_TOP_MAP = {
    "model.embed_tokens.weight": "token_embd.weight",
    "model.final_layernorm.weight": "output_norm.weight",
    "model.final_layernorm.bias": "output_norm.bias",
    "lm_head.weight": "output.weight",
    "lm_head.bias": "output.bias",
}

# falcon (HF FalconForCausalLM, transformer.h.N. prefix)
FALCON_LAYER_MAP = {
    "self_attention.query_key_value.weight": "attn_qkv.weight",
    "self_attention.dense.weight": "attn_output.weight",
    "mlp.dense_h_to_4h.weight": "ffn_up.weight",
    "mlp.dense_4h_to_h.weight": "ffn_down.weight",
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "ln_attn.weight": "attn_norm.weight",
    "ln_attn.bias": "attn_norm.bias",
    "ln_mlp.weight": "attn_norm_2.weight",
    "ln_mlp.bias": "attn_norm_2.bias",
}
FALCON_TOP_MAP = {
    "transformer.word_embeddings.weight": "token_embd.weight",
    "transformer.ln_f.weight": "output_norm.weight",
    "transformer.ln_f.bias": "output_norm.bias",
    "lm_head.weight": "output.weight",
}

# gptneox / pythia (HF GPTNeoXForCausalLM, gpt_neox.layers.N. prefix);
# qkv is deinterleaved [H,3,d] -> [q;k;v] in the convert loop (reference
# GPTNeoXModel.modify_tensors, convert_hf_to_gguf.py:1017-1041)
GPTNEOX_LAYER_MAP = {
    "attention.query_key_value.weight": "attn_qkv.weight",
    "attention.query_key_value.bias": "attn_qkv.bias",
    "attention.dense.weight": "attn_output.weight",
    "attention.dense.bias": "attn_output.bias",
    "mlp.dense_h_to_4h.weight": "ffn_up.weight",
    "mlp.dense_h_to_4h.bias": "ffn_up.bias",
    "mlp.dense_4h_to_h.weight": "ffn_down.weight",
    "mlp.dense_4h_to_h.bias": "ffn_down.bias",
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.bias": "ffn_norm.bias",
}
GPTNEOX_TOP_MAP = {
    "gpt_neox.embed_in.weight": "token_embd.weight",
    "gpt_neox.final_layer_norm.weight": "output_norm.weight",
    "gpt_neox.final_layer_norm.bias": "output_norm.bias",
    "embed_out.weight": "output.weight",
}

TOP_MAP = {
    "model.embed_tokens.weight": "token_embd.weight",
    "model.norm.weight": "output_norm.weight",
    "model.norm.bias": "output_norm.bias",
    "lm_head.weight": "output.weight",
    "lm_head.bias": "output.bias",       # phimoe lm_head_bias
}


def iter_hf_tensors(path: str) -> Iterator[tuple[str, np.ndarray]]:
    """Yields (name, array) from safetensors or torch .bin shards."""
    st_files = sorted(f for f in os.listdir(path)
                      if f.endswith(".safetensors"))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(os.path.join(path, f), framework="np") as sf:
                for name in sf.keys():
                    yield name, sf.get_tensor(name)
        return
    bins = sorted(f for f in os.listdir(path)
                  if f.startswith("pytorch_model") and f.endswith(".bin"))
    if not bins:
        raise FileNotFoundError(f"no safetensors/bin weights in {path}")
    import torch

    for f in bins:
        sd = torch.load(os.path.join(path, f), map_location="cpu",
                        weights_only=True)
        for name, t in sd.items():
            yield name, t.float().numpy()


def permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF half-split -> GGUF NORM interleaved rows (convert_hf_to_gguf:1657)."""
    d = w.shape[0] // n_head
    return (w.reshape(n_head, 2, d // 2, *w.shape[1:])
             .swapaxes(1, 2).reshape(w.shape))


# dbrx (reference DbrxModel + llm_build_dbrx): attention nested inside
# norm_attn_norm; norm_2 is the pre-MoE norm, stored under the
# reference's "attn_output_norm" name; expert planes are single fused
# parameters handled in convert()
DBRX_TOP_MAP = {
    "transformer.wte.weight": "token_embd.weight",
    "transformer.norm_f.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
}
DBRX_LAYER_MAP = {
    "norm_attn_norm.norm_1.weight": "attn_norm.weight",
    "norm_attn_norm.attn.Wqkv.weight": "attn_qkv.weight",
    "norm_attn_norm.attn.out_proj.weight": "attn_output.weight",
    "norm_attn_norm.norm_2.weight": "attn_output_norm.weight",
    "ffn.router.layer.weight": "ffn_gate_inp.weight",
}


# chatglm / GLM-4 (reference ChatGLMModel): llama-shaped names except
# the FUSED gate_up mlp projection, split at convert into ffn_gate +
# ffn_up (rows [gate; up]) so quantized planes stay per-tensor; q/k rows
# keep HF's native INTERLEAVED layout (GLM's rotate_half interleaves, so
# no permute — same convention the NORM-rope loader unpermutes)
CHATGLM_LAYER_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.weight": "attn_output.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}


def map_name(name: str, arch: str = "llama") -> str | None:
    if arch == "chatglm":
        if name in ("model.embed_tokens.weight",):
            return "token_embd.weight"
        if name == "model.norm.weight":
            return "output_norm.weight"
        if name == "lm_head.weight":
            return "output.weight"
        if name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx, _, suffix = rest.partition(".")
            mapped = CHATGLM_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch == "dbrx":
        if name in DBRX_TOP_MAP:
            return DBRX_TOP_MAP[name]
        if name.startswith("transformer.blocks."):
            rest = name[len("transformer.blocks."):]
            idx, _, suffix = rest.partition(".")
            mapped = DBRX_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch == "mamba":
        if name in MAMBA_TOP_MAP:
            return MAMBA_TOP_MAP[name]
        if name.startswith("backbone.layers."):
            rest = name[len("backbone.layers."):]
            idx, _, suffix = rest.partition(".")
            mapped = MAMBA_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch == "mpt":
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name in MPT_TOP_MAP:
            return MPT_TOP_MAP[name]
        if name.startswith("blocks."):
            rest = name[len("blocks."):]
            idx, _, suffix = rest.partition(".")
            mapped = MPT_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch == "bloom":
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name in BLOOM_TOP_MAP:
            return BLOOM_TOP_MAP[name]
        if name.startswith("h."):
            rest = name[len("h."):]
            idx, _, suffix = rest.partition(".")
            mapped = BLOOM_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch in ("gpt2", "starcoder", "codeshell"):  # transformer.h.* names
        if name.startswith("transformer.h."):
            rest = name[len("transformer.h."):]
            idx, _, suffix = rest.partition(".")
            mapped = GPT2_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return GPT2_TOP_MAP.get(name)
    if arch == "internlm2":
        if name in INTERNLM2_TOP_MAP:
            return INTERNLM2_TOP_MAP[name]
        if name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx, _, suffix = rest.partition(".")
            mapped = INTERNLM2_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch == "grok":
        if name in GROK_TOP_MAP:
            return GROK_TOP_MAP[name]
        if name.startswith("transformer.decoder_layer."):
            rest = name[len("transformer.decoder_layer."):]
            idx, _, suffix = rest.partition(".")
            mapped = GROK_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch == "refact":
        if name == "transformer.wte.weight":
            return "token_embd.weight"
        if name == "ln_f.weight":
            return "output_norm.weight"
        if name == "lm_head.weight":
            return "output.weight"
        if name.startswith("transformer.h."):
            rest = name[len("transformer.h."):]
            idx, _, suffix = rest.partition(".")
            mapped = REFACT_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch == "jais":
        if name == "transformer.ln_f.weight":
            return "output_norm.weight"
        if name == "transformer.ln_f.bias":
            return "output_norm.bias"
        if name.startswith("transformer.h."):
            rest = name[len("transformer.h."):]
            idx, _, suffix = rest.partition(".")
            mapped = JAIS_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch in ("qwen", "exaone"):
        top = QWEN1_TOP_MAP if arch == "qwen" else EXAONE_TOP_MAP
        lay = QWEN1_LAYER_MAP if arch == "qwen" else EXAONE_LAYER_MAP
        if name in top:
            return top[name]
        if name.startswith("transformer.h."):
            rest = name[len("transformer.h."):]
            idx, _, suffix = rest.partition(".")
            mapped = lay.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch == "openelm":
        if name in OPENELM_TOP_MAP:
            return OPENELM_TOP_MAP[name]
        if name.startswith("transformer.layers."):
            rest = name[len("transformer.layers."):]
            idx, _, suffix = rest.partition(".")
            mapped = OPENELM_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch == "nomic-bert":
        if name in NOMIC_TOP_MAP:
            return NOMIC_TOP_MAP[name]
        if name.startswith("encoder.layers."):
            rest = name[len("encoder.layers."):]
            idx, _, suffix = rest.partition(".")
            mapped = NOMIC_LAYER_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    if arch in ("bert", "jina-bert-v2"):
        if name.startswith("bert."):  # BertForMaskedLM prefix
            name = name[len("bert."):]
        if name in BERT_TOP_MAP:
            return BERT_TOP_MAP[name]
        if name.startswith("encoder.layer."):
            rest = name[len("encoder.layer."):]
            idx, _, suffix = rest.partition(".")
            mapped = BERT_LAYER_MAP.get(suffix)
            if mapped is None and arch == "jina-bert-v2":
                mapped = JINA_EXTRA_MAP.get(suffix)
            return f"blk.{idx}.{mapped}" if mapped else None
        return None
    top = {"phi2": PHI2_TOP_MAP, "falcon": FALCON_TOP_MAP,
           "gptneox": GPTNEOX_TOP_MAP}.get(arch, TOP_MAP)
    lay = {"phi2": PHI2_LAYER_MAP, "falcon": FALCON_LAYER_MAP,
           "gptneox": GPTNEOX_LAYER_MAP,
           "phi3": PHI3_LAYER_MAP, "gemma2": GEMMA2_LAYER_MAP,
           "gemma3": GEMMA2_LAYER_MAP,
           "olmo2": OLMO2_LAYER_MAP,
           "starcoder2": STARCODER2_LAYER_MAP}.get(arch, LAYER_MAP)
    if name in top:
        return top[name]
    prefix = {"falcon": "transformer.h.",
              "gptneox": "gpt_neox.layers."}.get(arch, "model.layers.")
    if name.startswith(prefix):
        rest = name[len(prefix):]
        idx, _, suffix = rest.partition(".")
        # expert stacks: mixtral block_sparse_moe.experts.E.w{1,2,3},
        # qwen2moe/qwen3moe mlp.experts.E.{gate,up,down}_proj
        if suffix.startswith(("block_sparse_moe.experts.", "mlp.experts.")):
            return None  # handled by the expert stacker
        mapped = lay.get(suffix)
        if mapped is None:
            return None
        return f"blk.{idx}.{mapped}"
    return None


def deinterleave_falcon_qkv(w: np.ndarray, n_head: int, n_kv: int,
                            head_dim: int) -> np.ndarray:
    """Falcon's fused query_key_value stores heads interleaved per kv group
    ((g q-heads, 1 k, 1 v) x n_kv); the GGUF layout is [all q; all k; all v]
    (reference convert_hf_to_gguf.py FalconModel.modify_tensors)."""
    g = n_head // n_kv
    rows = w.reshape(n_kv, g + 2, head_dim, *w.shape[1:])
    q = rows[:, :g].reshape(n_head * head_dim, *w.shape[1:])
    k = rows[:, g].reshape(n_kv * head_dim, *w.shape[1:])
    v = rows[:, g + 1].reshape(n_kv * head_dim, *w.shape[1:])
    return np.concatenate([q, k, v], axis=0)


def _vocab_metadata(path: str, cfg: dict) -> dict:
    """Tokenizer metadata from tokenizer.model (SPM) or tokenizer.json (BPE)."""
    md: dict = {}
    spm_path = os.path.join(path, "tokenizer.model")
    tok_json = os.path.join(path, "tokenizer.json")
    if os.path.exists(tok_json):
        with open(tok_json, encoding="utf-8") as f:
            tj = json.load(f)
        model = tj.get("model", {})
        if model.get("type") == "BPE":
            vocab = model["vocab"]
            tokens = [None] * len(vocab)
            for tok, i in vocab.items():
                if i < len(tokens):
                    tokens[i] = tok
            added = tj.get("added_tokens", [])
            max_id = max([len(tokens) - 1] + [a["id"] for a in added])
            if max_id >= len(tokens):
                tokens.extend([None] * (max_id + 1 - len(tokens)))
            types = [1] * len(tokens)
            for a in added:
                tokens[a["id"]] = a["content"]
                types[a["id"]] = 3 if a.get("special") else 4
            tokens = [t if t is not None else f"[UNUSED_{i}]"
                      for i, t in enumerate(tokens)]
            merges = model.get("merges", [])
            merges = [m if isinstance(m, str) else " ".join(m) for m in merges]
            md.update({
                "tokenizer.ggml.model": "gpt2",
                "tokenizer.ggml.pre": "llama-bpe",
                "tokenizer.ggml.tokens": tokens,
                "tokenizer.ggml.token_type": np.asarray(types, np.int32),
                "tokenizer.ggml.merges": merges,
            })
        elif model.get("type") == "WordPiece":
            # bert-family WPM vocab (reference BertModel set_vocab)
            vocab = model["vocab"]
            tokens = [None] * len(vocab)
            for tok, i in vocab.items():
                if i < len(tokens):
                    tokens[i] = tok
            types = [1] * len(tokens)
            for a in tj.get("added_tokens", []):
                if a["id"] < len(tokens):
                    types[a["id"]] = 3 if a.get("special") else 4
            tokens = [t if t is not None else f"[UNUSED_{i}]"
                      for i, t in enumerate(tokens)]
            md.update({
                "tokenizer.ggml.model": "bert",
                "tokenizer.ggml.tokens": tokens,
                "tokenizer.ggml.token_type": np.asarray(types, np.int32),
            })
            unk = vocab.get("[UNK]")
            if unk is not None:
                md["tokenizer.ggml.unknown_token_id"] = int(unk)
        elif model.get("type") in ("Unigram",) or os.path.exists(spm_path):
            pass  # fall through to SPM below
    if "tokenizer.ggml.model" not in md and os.path.exists(spm_path):
        from . import spm_reader

        tokens, scores, types = spm_reader.read_spm_vocab(spm_path)
        md.update({
            "tokenizer.ggml.model": "llama",
            "tokenizer.ggml.tokens": tokens,
            "tokenizer.ggml.scores": np.asarray(scores, np.float32),
            "tokenizer.ggml.token_type": np.asarray(types, np.int32),
        })
    if md:
        md["tokenizer.ggml.bos_token_id"] = int(cfg.get("bos_token_id") or 1)
        md["tokenizer.ggml.eos_token_id"] = int(cfg.get("eos_token_id") or 2)
        md["tokenizer.ggml.add_bos_token"] = True
    return md




# T5 layer-suffix -> GGUF name (reference llama-arch.cpp T5 table:
# enc.blk.* / dec.blk.*; attention output is attn_o, not attn_output)
_T5_SELF = {
    "SelfAttention.q.weight": "attn_q.weight",
    "SelfAttention.k.weight": "attn_k.weight",
    "SelfAttention.v.weight": "attn_v.weight",
    "SelfAttention.o.weight": "attn_o.weight",
    "SelfAttention.relative_attention_bias.weight": "attn_rel_b.weight",
    "layer_norm.weight": "attn_norm.weight",
}
_T5_CROSS = {
    "EncDecAttention.q.weight": "cross_attn_q.weight",
    "EncDecAttention.k.weight": "cross_attn_k.weight",
    "EncDecAttention.v.weight": "cross_attn_v.weight",
    "EncDecAttention.o.weight": "cross_attn_o.weight",
    "layer_norm.weight": "cross_attn_norm.weight",
}
_T5_FFN = {
    "DenseReluDense.wi.weight": "ffn_up.weight",
    "DenseReluDense.wi_0.weight": "ffn_gate.weight",
    "DenseReluDense.wi_1.weight": "ffn_up.weight",
    "DenseReluDense.wo.weight": "ffn_down.weight",
    "layer_norm.weight": "ffn_norm.weight",
}


def _convert_t5(path: str, out_path: str, cfg: dict, arch: str,
                dtype: str) -> None:
    """t5 / t5encoder GGUF (reference T5Model & T5EncoderModel,
    convert_hf_to_gguf.py:4405/4544: shared embeddings deduped to
    token_embd, enc./dec. block prefixes, d_kv key/value lengths,
    relative bucket count, decoder_start_token_id)."""
    ggml_dtype = {"F16": GGMLType.F16, "BF16": GGMLType.BF16,
                  "F32": GGMLType.F32, "Q8_0": GGMLType.Q8_0}[dtype]
    w = GGUFWriter(out_path, arch=arch)
    md = {
        "general.architecture": arch,
        "general.name": cfg.get("_name_or_path", os.path.basename(path)),
        f"{arch}.context_length": cfg.get("n_positions", 512),
        f"{arch}.embedding_length": cfg["d_model"],
        f"{arch}.block_count": cfg["num_layers"],
        f"{arch}.feed_forward_length": cfg["d_ff"],
        f"{arch}.attention.head_count": cfg["num_heads"],
        f"{arch}.attention.key_length": cfg["d_kv"],
        f"{arch}.attention.value_length": cfg["d_kv"],
        f"{arch}.attention.layer_norm_rms_epsilon": cfg.get(
            "layer_norm_epsilon", 1e-6),
        f"{arch}.attention.relative_buckets_count": cfg.get(
            "relative_attention_num_buckets", 32),
        f"{arch}.decoder_start_token_id": cfg.get(
            "decoder_start_token_id", 0),
    }
    md.update(_vocab_metadata(path, cfg))
    for key, val in md.items():
        w.add_kv(key, val)

    def emit(gname, arr):
        a = np.asarray(arr, np.float32)
        tgt = ggml_dtype if a.ndim >= 2 else GGMLType.F32
        if "norm" in gname or "rel_b" in gname:
            tgt = GGMLType.F32
        if tgt not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16) and \
                a.shape[-1] % 32:
            tgt = GGMLType.F16
        w.add_tensor(gname, a, ggml_type=tgt)

    seen_embd = False
    tied = bool(cfg.get("tie_word_embeddings", True))
    for name, arr in iter_hf_tensors(path):
        if name in ("shared.weight", "encoder.embed_tokens.weight",
                    "decoder.embed_tokens.weight"):
            # stored under any (or several) of these names; first wins
            if not seen_embd:
                emit("token_embd.weight", arr)
                seen_embd = True
            continue
        if name == "lm_head.weight" and not tied:
            emit("output.weight", arr)
            continue
        if name == "encoder.final_layer_norm.weight":
            emit("enc.output_norm.weight", arr)
            continue
        if name == "decoder.final_layer_norm.weight":
            emit("dec.output_norm.weight", arr)
            continue
        for side, prefix in (("encoder", "enc"), ("decoder", "dec")):
            lead = f"{side}.block."
            if not name.startswith(lead):
                continue
            rest = name[len(lead):]
            idx, _, sub = rest.partition(".")
            # sub = "layer.<j>.<suffix>"; j=0 self-attn; encoder j=1 ffn;
            # decoder j=1 cross-attn, j=2 ffn
            _, _, tail = sub.partition(".")
            j, _, suffix = tail.partition(".")
            table = _T5_SELF if j == "0" else (
                _T5_FFN if (side == "encoder" or j == "2")
                else _T5_CROSS)
            mapped = table.get(suffix)
            if mapped:
                emit(f"{prefix}.blk.{idx}.{mapped}", arr)
            break
    w.write()


def convert(path: str, out_path: str, dtype: str = "F16") -> None:
    with open(os.path.join(path, "config.json"), encoding="utf-8") as f:
        cfg = json.load(f)
    archs = cfg.get("architectures", ["LlamaForCausalLM"])
    arch = ARCH_MAP.get(archs[0])
    if arch is None:
        raise ValueError(f"unsupported architecture {archs[0]}; "
                         f"known: {sorted(ARCH_MAP)}")
    if arch in ("t5", "t5encoder"):
        return _convert_t5(path, out_path, cfg, arch, dtype)
    if arch in ("rwkv6", "rwkv6qwen2"):
        return _convert_rwkv6(path, out_path, cfg, arch, dtype)
    if arch in ("rwkv7", "arwkv7"):
        return _convert_rwkv7(path, out_path, cfg, arch, dtype)
    if arch in ("qwen2vl", "gemma3") and \
            isinstance(cfg.get("text_config"), dict):
        # VL configs nest the language-model hparams (transformers >= 4.52)
        cfg = {**cfg, **cfg["text_config"]}
    if arch == "codeshell":
        # CodeShellConfig: gpt2-style keys + num_query_groups GQA
        cfg = {**cfg,
               "num_attention_heads": cfg.get("n_head", 12),
               "num_key_value_heads": cfg.get("num_query_groups", 1),
               "hidden_size": cfg.get("n_embd", 768),
               "num_hidden_layers": cfg.get("n_layer", 12),
               "max_position_embeddings": cfg.get("n_positions", 8192),
               "intermediate_size": (cfg.get("n_inner") or
                                     4 * cfg.get("n_embd", 768)),
               "rope_theta": 10000.0}
    if arch in ("gpt2", "starcoder"):
        # GPT2Config/GPTBigCodeConfig use their own key names; starcoder
        # is multi-query (1 kv head) unless the flag is off
        cfg = {**cfg,
               "num_attention_heads": cfg.get("n_head", 12),
               "hidden_size": cfg.get("n_embd", 768),
               "num_hidden_layers": cfg.get("n_layer", 12),
               "max_position_embeddings": cfg.get("n_positions", 1024),
               "intermediate_size": (cfg.get("n_inner") or
                                     4 * cfg.get("n_embd", 768))}
        if arch == "starcoder":
            cfg = {**cfg, "num_key_value_heads":
                   1 if cfg.get("multi_query", True)
                   else cfg["num_attention_heads"]}
    if arch == "bloom":
        # BloomConfig key names; no positional embedding (ALiBi)
        hs = cfg.get("hidden_size") or cfg.get("n_embed", 768)
        cfg = {**cfg,
               "num_attention_heads": cfg.get("n_head", 12),
               "hidden_size": hs,
               "num_hidden_layers": cfg.get("n_layer", 12),
               "max_position_embeddings": 2048,
               "intermediate_size": 4 * hs}
    if arch == "mamba":
        # MambaConfig keys; attention-centric header fields are unused
        hs = cfg.get("hidden_size") or cfg.get("d_model", 768)
        cfg = {**cfg,
               "num_attention_heads": 1,
               "hidden_size": hs,
               "num_hidden_layers": (cfg.get("num_hidden_layers")
                                     or cfg.get("n_layer", 12)),
               "max_position_embeddings": 2 ** 20,
               "intermediate_size": (cfg.get("intermediate_size")
                                     or cfg.get("d_inner") or 2 * hs)}
    if arch == "dbrx":
        # DbrxConfig nests ffn/attn hparams (reference DbrxModel
        # set_gguf_parameters, convert_hf_to_gguf.py:2020-2042)
        fc = cfg.get("ffn_config") or {}
        ac = cfg.get("attn_config") or {}
        hs = cfg.get("d_model", 1024)
        cfg = {**cfg,
               "num_attention_heads": cfg.get("n_heads", 16),
               "hidden_size": hs,
               "num_hidden_layers": cfg.get("n_layers", 12),
               "max_position_embeddings": cfg.get("max_seq_len", 2048),
               "intermediate_size": fc.get("ffn_hidden_size", 4 * hs),
               "num_key_value_heads": ac.get("kv_n_heads",
                                             cfg.get("n_heads", 16)),
               "rope_theta": ac.get("rope_theta", 10000.0),
               "num_local_experts": fc.get("moe_num_experts", 16),
               "num_experts_per_tok": fc.get("moe_top_k", 4)}
    if arch == "nomic-bert":
        # NomicBertConfig: gpt2-style key names + rotary_emb_base; the
        # config claims n_ctx 8192 but trains rope at 2048 (reference
        # NomicBertModel.__init__ override)
        cfg = {**cfg,
               "num_attention_heads": cfg.get("n_head", 12),
               "num_key_value_heads": cfg.get("n_head", 12),
               "hidden_size": cfg.get("n_embd", 768),
               "num_hidden_layers": cfg.get("n_layer", 12),
               "max_position_embeddings": 2048,
               "intermediate_size": (cfg.get("n_inner")
                                     or 4 * cfg.get("n_embd", 768)),
               "rope_theta": cfg.get("rotary_emb_base", 1000.0),
               "rms_norm_eps": cfg.get("layer_norm_epsilon", 1e-12)}
    if arch == "qwen":
        # QWenConfig: rotary_emb_base + layer_norm_epsilon keys; MHA
        cfg = {**cfg,
               "num_key_value_heads": cfg.get("num_attention_heads", 32),
               "rope_theta": cfg.get("rotary_emb_base", 10000.0),
               "rms_norm_eps": cfg.get("layer_norm_epsilon", 1e-6)}
    if arch == "exaone":
        cfg = {**cfg,
               "num_hidden_layers": (cfg.get("num_hidden_layers")
                                     or cfg.get("num_layers", 32)),
               "rms_norm_eps": cfg.get("layer_norm_epsilon",
                                       cfg.get("rms_norm_eps", 1e-5))}
    if arch == "refact":
        # RefactModel: MQA (kv=1), llama-style 2/3-rounded ffn width
        hs = cfg.get("n_embd", 768)
        inner = 4 * hs
        ffd = 256 * ((int(2 * inner / 3) + 255) // 256)
        cfg = {**cfg,
               "num_attention_heads": cfg.get("n_head", 12),
               "num_key_value_heads": 1,
               "hidden_size": hs,
               "num_hidden_layers": cfg.get("n_layer", 12),
               "max_position_embeddings": cfg.get("n_positions", 2048),
               "intermediate_size": ffd,
               "rms_norm_eps": cfg.get("layer_norm_epsilon", 1e-5)}
    if arch == "jais":
        # gpt2-style config keys (reference JaisModel set_gguf_parameters)
        cfg = {**cfg,
               "num_attention_heads": cfg.get("n_head", 12),
               "num_key_value_heads": cfg.get("n_head", 12),
               "hidden_size": cfg.get("n_embd", 768),
               "num_hidden_layers": cfg.get("n_layer", 12),
               "max_position_embeddings": cfg.get("n_positions", 2048),
               "intermediate_size": (cfg.get("n_inner") or
                                     4 * cfg.get("n_embd", 768))}
    if arch == "mpt":
        hs = cfg.get("d_model", 768)
        cfg = {**cfg,
               "num_attention_heads": cfg.get("n_heads", 12),
               "hidden_size": hs,
               "num_hidden_layers": cfg.get("n_layers", 12),
               "max_position_embeddings": cfg.get("max_seq_len", 2048),
               "intermediate_size": int(
                   cfg.get("expansion_ratio", 4) * hs)}
    per_layer: dict[str, list[int]] = {}  # openelm/deci GGUF array keys
    if arch == "openelm":
        # OpenELMConfig keys (reference OpenELMModel set_gguf_parameters)
        nq = [int(x) for x in cfg["num_query_heads"]]
        nkv = [int(x) for x in cfg["num_kv_heads"]]
        ffd = [_make_divisible(m * cfg["model_dim"], cfg["ffn_dim_divisor"])
               for m in cfg["ffn_multipliers"]]
        per_layer = {"head_count": nq, "head_count_kv": nkv,
                     "feed_forward_length": ffd}
        cfg = {**cfg,
               "num_attention_heads": max(nq),
               "num_key_value_heads": max(nkv),
               "hidden_size": cfg["model_dim"],
               "num_hidden_layers": cfg["num_transformer_layers"],
               "max_position_embeddings": cfg["max_context_length"],
               "intermediate_size": max(ffd),
               "head_dim": cfg["head_dim"],
               "rope_theta": cfg.get("rope_freq_constant", 10000.0),
               "rms_norm_eps": 1e-6}
    if arch == "deci":
        if "block_configs" in cfg:   # Llama-3_1-Nemotron-51B
            nh, nkv, ffd = [], [], []
            for bc in cfg["block_configs"]:
                grp = bc["attention"]["n_heads_in_group"]
                if grp is None:
                    # linear attention (replace_with_linear) keeps n_head,
                    # attention-free zeroes it; both have no kv heads
                    nh.append(cfg["num_attention_heads"]
                              if bc["attention"].get("replace_with_linear")
                              else 0)
                    nkv.append(0)
                else:
                    nh.append(cfg["num_attention_heads"])
                    nkv.append(cfg["num_attention_heads"] // grp)
                # _ffn_mult_to_intermediate_size (reference DeciModel)
                size = int(2 * bc["ffn"]["ffn_mult"] * cfg["hidden_size"]
                           / 3)
                ffd.append(size + (-size) % 256)
            per_layer = {"head_count": nh, "head_count_kv": nkv,
                         "feed_forward_length": ffd}
            cfg = {**cfg, "intermediate_size": max(ffd),
                   "num_key_value_heads": max(nkv)}
        elif "num_key_value_heads_per_layer" in cfg:   # DeciLM-7B
            nkv = [int(x) for x in cfg["num_key_value_heads_per_layer"]]
            per_layer = {"head_count_kv": nkv}
            cfg = {**cfg, "num_key_value_heads": max(nkv)}
    plamo_kv = 0
    if arch == "plamo":
        # derive the TRUE kv head count from the k_proj plane width (the
        # config's num_key_value_heads is wrong — see PlamoModel note)
        shapes = _peek_shapes(path)
        hd = cfg["hidden_size"] // cfg["num_attention_heads"]
        plamo_kv = shapes[
            "model.layers.layers.0.self_attn.k_proj.weight"][0] // hd
        cfg = {**cfg, "num_key_value_heads": plamo_kv,
               "max_position_embeddings": cfg.get(
                   "max_position_embeddings", 4096)}
    n_head = cfg["num_attention_heads"]
    if arch == "falcon":
        # old (7B) arch: multi-query unless new_decoder_architecture
        if cfg.get("new_decoder_architecture"):
            n_kv = cfg.get("num_kv_heads", n_head)
        else:
            n_kv = 1 if cfg.get("multi_query", True) else n_head
    else:
        n_kv = cfg.get("num_key_value_heads", n_head)
    n_embd = cfg["hidden_size"]
    head_dim = cfg.get("head_dim", n_embd // n_head)
    ggml_dtype = {"F16": GGMLType.F16, "BF16": GGMLType.BF16,
                  "F32": GGMLType.F32, "Q8_0": GGMLType.Q8_0}[dtype]

    w = GGUFWriter(out_path, arch=arch)
    md = {
        "general.architecture": arch,
        "general.name": cfg.get("_name_or_path", os.path.basename(path)),
        f"{arch}.context_length": cfg.get("max_position_embeddings", 4096),
        f"{arch}.embedding_length": n_embd,
        f"{arch}.block_count": cfg["num_hidden_layers"],
        f"{arch}.attention.head_count": n_head,
        f"{arch}.attention.head_count_kv": n_kv,
        f"{arch}.attention.key_length": head_dim,
        f"{arch}.attention.value_length": head_dim,
        f"{arch}.feed_forward_length": cfg.get("intermediate_size",
                                               4 * n_embd),
        f"{arch}.rope.dimension_count": head_dim,
        f"{arch}.rope.freq_base": cfg.get("rope_theta", 10000.0),
        f"{arch}.attention.layer_norm_rms_epsilon": cfg.get("rms_norm_eps", 1e-5),
        f"{arch}.vocab_size": cfg["vocab_size"],
    }
    if per_layer:
        # per-layer geometry as GGUF ARRAY values (reference
        # gguf_writer.add_head_count(list) for openelm/deci; the loader's
        # hparams_from_metadata reads them into n_*_layers tuples)
        if "head_count" in per_layer:
            md[f"{arch}.attention.head_count"] = per_layer["head_count"]
        if "head_count_kv" in per_layer:
            md[f"{arch}.attention.head_count_kv"] = \
                per_layer["head_count_kv"]
        if "feed_forward_length" in per_layer:
            md[f"{arch}.feed_forward_length"] = \
                per_layer["feed_forward_length"]
    if arch == "phi3":
        # Phi-4-mini class sets partial_rotary_factor (reference
        # Phi3MiniModel: rope_dims = rot_pct * n_embd // n_head)
        md[f"{arch}.rope.dimension_count"] = int(
            head_dim * cfg.get("partial_rotary_factor", 1.0))
    if arch == "phi2":
        # partial rotary + plain LayerNorm epsilon (PhiConfig)
        md[f"{arch}.rope.dimension_count"] = int(
            head_dim * cfg.get("partial_rotary_factor", 0.5))
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_eps", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
    if arch == "falcon":
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_epsilon", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
    n_expert_cfg = (cfg.get("num_local_experts") or cfg.get("num_experts")
                    or cfg.get("n_routed_experts"))
    if n_expert_cfg:
        md[f"{arch}.expert_count"] = n_expert_cfg
        md[f"{arch}.expert_used_count"] = cfg.get("num_experts_per_tok", 2)
        if cfg.get("moe_intermediate_size"):
            md[f"{arch}.expert_feed_forward_length"] = \
                cfg["moe_intermediate_size"]
        if cfg.get("shared_expert_intermediate_size"):
            md[f"{arch}.expert_shared_feed_forward_length"] = \
                cfg["shared_expert_intermediate_size"]
    if arch in ("gemma2", "gemma3") or cfg.get("sliding_window"):
        if cfg.get("sliding_window"):
            md[f"{arch}.attention.sliding_window"] = cfg["sliding_window"]
    if arch == "gemma2":
        md[f"{arch}.attn_logit_softcapping"] = cfg.get(
            "attn_logit_softcapping", 50.0)
        md[f"{arch}.final_logit_softcapping"] = cfg.get(
            "final_logit_softcapping", 30.0)
    if arch == "starcoder2":
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "norm_epsilon", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
    if arch == "nemotron":
        # LayerNorm eps + partial rotary (reference NemotronModel
        # set_gguf_parameters, convert_hf_to_gguf.py:4930-4942)
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "norm_eps", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
        md[f"{arch}.rope.dimension_count"] = int(
            head_dim * cfg.get("partial_rotary_factor", 0.5))
    if arch == "grok":
        # the reference graph hardcodes both multipliers
        # (llm_build_grok); stored as metadata here so hparams carry them
        md[f"{arch}.embedding_scale"] = 78.38367176906169
        # logits are MULTIPLIED by 1/sqrt(3); logits_scale is a divisor
        md[f"{arch}.logit_scale"] = 3.0 ** 0.5
    if arch == "jais":
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_epsilon", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
    if arch == "codeshell":
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_epsilon", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
    if arch == "orion":
        # the config key is rms_norm_eps but the norm is TRUE LayerNorm
        # (reference OrionModel set_gguf_parameters note)
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "rms_norm_eps", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
    if arch == "chameleon":
        # reference ChameleonModel set_gguf_parameters
        md[f"{arch}.swin_norm"] = bool(cfg.get("swin_norm", False))
    if arch == "phimoe":
        # TRUE LayerNorm eps (HF reuses the rms_norm_eps config key) +
        # the sparsemixer threshold (our extension key; the reference
        # has no GGUF key for it)
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "rms_norm_eps", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
        md[f"{arch}.router_jitter"] = float(
            cfg.get("router_jitter_noise", 0.01))
    if arch == "chatglm":
        # reference ChatGLMModel set_gguf_parameters: PARTIAL interleaved
        # rotary (rope_dim = head_dim * partial_rotary_factor, NORM type)
        # and 10000 * rope_ratio frequency base
        md[f"{arch}.rope.dimension_count"] = int(
            head_dim * cfg.get("partial_rotary_factor", 0.5))
        if cfg.get("rope_ratio"):
            md[f"{arch}.rope.freq_base"] = 10000.0 * cfg["rope_ratio"]
    if arch == "cohere2":
        # reference Cohere2Model set_gguf_parameters: logit_scale +
        # sliding window + rotary_pct-scaled rope dims; LayerNorm eps
        md[f"{arch}.logit_scale"] = float(cfg.get("logit_scale", 1.0))
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_eps", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
        md[f"{arch}.rope.dimension_count"] = int(
            cfg.get("rotary_pct", 1.0) * head_dim)
    if arch == "dbrx":
        md[f"{arch}.attention.layer_norm_epsilon"] = 1e-5
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
        clip = (cfg.get("attn_config") or {}).get("clip_qkv")
        if clip is not None:
            md[f"{arch}.attention.clamp_kqv"] = float(clip)
    if arch == "olmo":
        # non-parametric LayerNorm (no norm tensors at all) + clip_qkv
        # (reference OlmoModel set_gguf_parameters,
        # convert_hf_to_gguf.py:3850-3855)
        md[f"{arch}.attention.layer_norm_epsilon"] = 1e-5
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
        if cfg.get("clip_qkv") is not None:
            md[f"{arch}.attention.clamp_kqv"] = float(cfg["clip_qkv"])
    if arch == "jina-bert-v2":
        # symmetric-ALiBi encoder: LayerNorm eps + MEAN pooling (jina
        # sentence embeddings); max_alibi_bias 8.0 is implied by the
        # arch (reference llama-model.cpp JINA_BERT_V2 hparams)
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_eps", 1e-12)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
        md[f"{arch}.pooling_type"] = 1  # mean
    if arch == "bert":
        # post-norm encoder (reference BertModel set_gguf_parameters):
        # LayerNorm eps + CLS pooling; non-causal is implied by the arch
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_eps", 1e-12)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
        md[f"{arch}.pooling_type"] = 2  # CLS
    if arch == "nomic-bert":
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_epsilon", 1e-12)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
        md[f"{arch}.pooling_type"] = 1  # mean (nomic embed models)
    if arch in ("gpt2", "starcoder", "bloom", "mpt"):
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_epsilon", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
    if arch == "bloom":
        md[f"{arch}.attention.max_alibi_bias"] = 8.0
    if arch == "mamba":
        # reference MambaModel set_gguf_parameters keys (find_hparam
        # accepts both transformers and state-spaces/mamba names)
        hs = cfg["hidden_size"]
        d_inner = (cfg.get("intermediate_size") or cfg.get("d_inner")
                   or 2 * hs)
        md[f"{arch}.ssm.conv_kernel"] = (cfg.get("conv_kernel")
                                         or cfg.get("d_conv", 4))
        md[f"{arch}.ssm.inner_size"] = d_inner
        md[f"{arch}.ssm.state_size"] = (cfg.get("state_size")
                                        or cfg.get("d_state", 16))
        md[f"{arch}.ssm.time_step_rank"] = (cfg.get("time_step_rank")
                                            or cfg.get("dt_rank")
                                            or -(hs // -16))
    if arch == "mpt":
        md[f"{arch}.attention.max_alibi_bias"] = float(
            (cfg.get("attn_config") or {}).get("alibi_bias_max", 8.0))
    if arch == "minicpm3":
        # MLA dims (reference MiniCPM3Model set_gguf_parameters) —
        # value_length is OUR addition (the reference omits it and relies
        # on the n_embd/n_head default equaling v_head_dim)
        qk_rope = cfg["qk_rope_head_dim"]
        qk_nope = cfg["qk_nope_head_dim"]
        md[f"{arch}.attention.key_length"] = qk_nope + qk_rope
        md[f"{arch}.attention.value_length"] = cfg.get(
            "v_head_dim", cfg["hidden_size"] // n_head)
        md[f"{arch}.rope.dimension_count"] = qk_rope
        md[f"{arch}.attention.head_count_kv"] = n_head
        if cfg.get("q_lora_rank"):
            md[f"{arch}.attention.q_lora_rank"] = cfg["q_lora_rank"]
        md[f"{arch}.attention.kv_lora_rank"] = cfg["kv_lora_rank"]
    if arch in ("minicpm", "minicpm3"):
        # mup-style scalar multipliers (reference MiniCPMModel
        # set_gguf_parameters, convert_hf_to_gguf.py)
        md[f"{arch}.embedding_scale"] = float(cfg["scale_emb"])
        md[f"{arch}.residual_scale"] = (
            cfg["scale_depth"] / cfg["num_hidden_layers"] ** 0.5)
        md[f"{arch}.logit_scale"] = (
            cfg["hidden_size"] / cfg["dim_model_base"])
    if arch == "baichuan" and (cfg.get("position_embedding") == "alibi"
                               or cfg.get("num_hidden_layers", 0) >= 40):
        # 13B-class: ALiBi, no rope (the reference keys the same way off
        # n_layer == 40, llama-model.cpp baichuan LLM_TYPE_13B; alibi
        # rides soft_max_ext max_bias there and the attend-path slope
        # bias here)
        md[f"{arch}.attention.max_alibi_bias"] = 8.0
    if arch == "gptneox":
        # pythia family (reference GPTNeoXModel set_gguf_parameters,
        # convert_hf_to_gguf.py:995-1007)
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_eps", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
        md[f"{arch}.rope.dimension_count"] = int(
            head_dim * cfg.get("rotary_pct", 0.25))
        md[f"{arch}.rope.freq_base"] = cfg.get(
            "rope_theta", cfg.get("rotary_emb_base", 10000.0))
        md[f"{arch}.use_parallel_residual"] = bool(
            cfg.get("use_parallel_residual", True))
    if arch == "stablelm":
        # reference StableLMModel (convert_hf_to_gguf.py:1536) defaults the
        # flag to TRUE for configs that omit it — that covers legacy
        # StableLM-Epoch checkpoints, which this converter does not accept
        # (only StableLmForCausalLM, whose HF default is False); so default
        # to the HF default instead
        md[f"{arch}.use_parallel_residual"] = bool(
            cfg.get("use_parallel_residual", False))
    if arch == "command-r":
        md[f"{arch}.logit_scale"] = cfg.get("logit_scale", 0.0625)
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_eps", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
    if arch == "stablelm":
        # LayerNorm arch with partial rotary (StableLmConfig)
        md[f"{arch}.rope.dimension_count"] = int(
            head_dim * cfg.get("partial_rotary_factor", 0.25))
        md[f"{arch}.attention.layer_norm_epsilon"] = cfg.get(
            "layer_norm_eps", 1e-5)
        del md[f"{arch}.attention.layer_norm_rms_epsilon"]
    if arch in ("granite", "granitemoe"):
        # mup-style multipliers (GraniteConfig -> llama.cpp granite keys)
        md[f"{arch}.attention.scale"] = cfg.get("attention_multiplier", 1.0)
        md[f"{arch}.embedding_scale"] = cfg.get("embedding_multiplier", 1.0)
        md[f"{arch}.residual_scale"] = cfg.get("residual_multiplier", 1.0)
        md[f"{arch}.logit_scale"] = cfg.get("logits_scaling", 1.0)
    if arch == "gemma3":
        md[f"{arch}.attention.sliding_window_pattern"] = cfg.get(
            "sliding_window_pattern", 6)
        md[f"{arch}.rope.local_freq_base"] = cfg.get(
            "rope_local_base_freq", 10000.0)
    if arch == "deepseek":
        md[f"{arch}.leading_dense_block_count"] = cfg.get(
            "first_k_dense_replace", 0)
        if cfg.get("n_routed_experts"):
            md[f"{arch}.expert_shared_count"] = cfg.get(
                "n_shared_experts", 0)
            md[f"{arch}.expert_weights_scale"] = float(
                cfg.get("routed_scaling_factor", 1.0))
    if arch == "deepseek2":
        # MLA + deepseek-MoE keys (reference DeepseekV2Model
        # set_gguf_parameters, convert_hf_to_gguf.py:4310-4341)
        qk_rope = cfg["qk_rope_head_dim"]
        qk_nope = cfg["qk_nope_head_dim"]
        md[f"{arch}.attention.key_length"] = qk_nope + qk_rope
        md[f"{arch}.attention.value_length"] = cfg["v_head_dim"]
        md[f"{arch}.rope.dimension_count"] = qk_rope
        # MLA's kv_b always fans out to n_head k/v heads; the cache is MHA
        md[f"{arch}.attention.head_count_kv"] = n_head
        md[f"{arch}.leading_dense_block_count"] = cfg.get(
            "first_k_dense_replace", 0)
        if cfg.get("q_lora_rank"):
            md[f"{arch}.attention.q_lora_rank"] = cfg["q_lora_rank"]
        md[f"{arch}.attention.kv_lora_rank"] = cfg["kv_lora_rank"]
        if cfg.get("n_routed_experts"):
            # expert_count/used/ffe ride the generic MoE block below
            md[f"{arch}.expert_shared_count"] = cfg.get(
                "n_shared_experts", 0)
            md[f"{arch}.expert_weights_scale"] = float(
                cfg.get("routed_scaling_factor", 1.0))
            md[f"{arch}.expert_weights_norm"] = bool(
                cfg.get("norm_topk_prob", False))
            md[f"{arch}.expert_gating_func"] = \
                2 if cfg.get("scoring_func") == "sigmoid" else 1
        ds_scaling = cfg.get("rope_scaling") or {}
        if (ds_scaling.get("type") or ds_scaling.get("rope_type")) == "yarn":
            md[f"{arch}.rope.scaling.original_context_length"] = int(
                ds_scaling.get("original_max_position_embeddings",
                               cfg.get("max_position_embeddings", 4096)))
            md[f"{arch}.rope.scaling.yarn_log_multiplier"] = \
                0.1 * float(ds_scaling.get("mscale_all_dim", 1.0))
    rope_scaling = cfg.get("rope_scaling") or {}
    scaling_type = rope_scaling.get("type") or rope_scaling.get("rope_type")
    rope_factor_tensors: list[tuple[str, np.ndarray]] = []
    if scaling_type in ("linear", "yarn"):
        md[f"{arch}.rope.scaling.type"] = scaling_type
        md[f"{arch}.rope.scaling.factor"] = float(rope_scaling.get("factor", 1.0))
    elif scaling_type in ("su", "longrope"):
        # phi3 longrope (reference convert_hf_to_gguf.py Phi3MiniModel
        # set_gguf_parameters / generate_extra_tensors :2550-2612): per-pair
        # factor tensors become rope_factors_{long,short}.weight [dims/2],
        # attn factor = sqrt(1 + ln(scale)/ln(orig_ctx)) for scale > 1.
        orig = cfg["original_max_position_embeddings"]
        scale = cfg.get("max_position_embeddings", orig) / orig
        rope_dims = int(head_dim * cfg.get("partial_rotary_factor", 1.0))
        long_f = np.asarray(rope_scaling["long_factor"], np.float32)
        short_f = np.asarray(rope_scaling["short_factor"], np.float32)
        if long_f.shape != (rope_dims // 2,) or \
                short_f.shape != (rope_dims // 2,):
            raise ValueError(
                f"longrope factors must be [{rope_dims // 2}]; got "
                f"long {long_f.shape} short {short_f.shape}")
        md[f"{arch}.rope.scaling.type"] = "longrope"
        md[f"{arch}.rope.scaling.original_context_length"] = int(orig)
        md[f"{arch}.rope.scaling.attn_factor"] = float(
            math.sqrt(1.0 + math.log(scale) / math.log(orig))
            if scale > 1.0 else 1.0)
        rope_factor_tensors = [("rope_factors_long.weight", long_f),
                               ("rope_factors_short.weight", short_f)]
    elif rope_scaling.get("mrope_section"):
        # qwen2vl M-RoPE (reference Qwen2VLModel set_gguf_parameters,
        # convert_hf_to_gguf.py:2258-2262): sections recorded for parity;
        # text-only positions feed every section the same stream, which
        # equals standard NEOX rope (the only mode this engine runs)
        sections = list(rope_scaling["mrope_section"])
        sections += [0] * max(0, 4 - len(sections))
        md[f"{arch}.rope.dimension_sections"] = [int(s) for s in sections]
    md.update(_vocab_metadata(path, cfg))
    for key, val in md.items():
        w.add_kv(key, val)
    for tname, tarr in rope_factor_tensors:
        w.add_tensor(tname, tarr, ggml_type=GGMLType.F32)

    is_norm_rope = arch in ("llama", "granite", "granitemoe", "olmo",
                            "minicpm", "chameleon", "deepseek", "xverse",
                            "arctic")
    experts: dict[tuple[int, str], dict[int, np.ndarray]] = {}
    n_expert = n_expert_cfg or 0
    seen_output = False

    def emit(gname: str, arr: np.ndarray) -> None:
        tgt = ggml_dtype if arr.ndim >= 2 else GGMLType.F32
        if "norm" in gname:
            tgt = GGMLType.F32  # norm weights stay exact regardless of rank
        if tgt not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16) and \
                arr.shape[-1] % 32:
            tgt = GGMLType.F16
        w.add_tensor(gname, arr, ggml_type=tgt)

    # stablelm qk_layernorm: H (resp. KV) distinct per-head LayerNorms,
    # stacked to one [H, d] tensor (reference StableLMModel._stack_qk_norm,
    # convert_hf_to_gguf.py:1575-1587)
    qk_norms: dict[tuple[int, str], dict[int, np.ndarray]] = {}

    n_visual_skipped = 0
    for name, arr in iter_hf_tensors(path):
        if arch == "qwen2vl":
            if name.startswith(("visual.", "model.visual.")):
                # vision tower not converted (mirrors the reference's
                # Qwen2VLModel.get_tensors visual.* skip) — text-only GGUF
                n_visual_skipped += 1
                continue
            if name.startswith("model.language_model."):
                name = "model." + name[len("model.language_model."):]
        if arch == "gemma3":
            if name.startswith(("vision_tower.", "multi_modal_projector.",
                                "model.vision_tower.",
                                "model.multi_modal_projector.")):
                n_visual_skipped += 1
                continue
            if name.startswith("language_model."):
                name = name[len("language_model."):]
            elif name.startswith("model.language_model."):
                name = "model." + name[len("model.language_model."):]
        if arch == "chameleon" and name.startswith("model.vqmodel"):
            continue  # image tokenizer not converted (reference skip)
        if arch == "chameleon" and (
                ".self_attn.q_norm." in name or ".self_attn.k_norm." in name):
            # per-head qk LayerNorm [H, d] (+bias). Rows were permuted
            # half-split -> interleaved like q/k, so the norm's d-axis
            # gets the SAME within-head map (reference ChameleonModel
            # _reverse_hf_permute); the loader's NORM-rope unpermute
            # restores HF order at load
            li = name.split(".")[2]
            a = np.asarray(arr, np.float32)      # [H, d] or [KV, d]
            h, dd = a.shape
            a = a.reshape(h, 2, dd // 2).transpose(0, 2, 1).reshape(h, dd)
            which = "attn_q_norm" if ".q_norm." in name else "attn_k_norm"
            kind = "bias" if name.endswith(".bias") else "weight"
            emit(f"blk.{li}.{which}.{kind}", a)
            continue
        if ".q_layernorm.norms." in name or ".k_layernorm.norms." in name:
            parts = name.split(".")
            li, which, hi = int(parts[2]), parts[4], int(parts[6])
            gn = "attn_q_norm" if which == "q_layernorm" else "attn_k_norm"
            want = n_head if gn == "attn_q_norm" else n_kv
            key = (li, gn)
            qk_norms.setdefault(key, {})[hi] = np.asarray(arr, np.float32)
            if len(qk_norms[key]) == want:
                heads = qk_norms.pop(key)
                emit(f"blk.{li}.{gn}.weight",
                     np.stack([heads[h] for h in range(want)]))
            continue
        # refact fused planes: attn.kv rows [k; v] (single kv head) and
        # mlp.gate_up_proj rows [gate; up] at the 2/3-rounded width
        if arch == "refact" and name.endswith(".attn.kv.weight"):
            li = name.split(".")[2]
            a = np.asarray(arr, np.float32)
            hd = cfg["hidden_size"] // cfg["num_attention_heads"]
            emit(f"blk.{li}.attn_k.weight", a[:hd])
            emit(f"blk.{li}.attn_v.weight", a[hd:])
            continue
        if arch == "refact" and name.endswith(".mlp.gate_up_proj.weight"):
            li = name.split(".")[2]
            a = np.asarray(arr, np.float32)
            ffd = cfg["intermediate_size"]
            emit(f"blk.{li}.ffn_gate.weight", a[:ffd])
            emit(f"blk.{li}.ffn_up.weight", a[ffd:])
            continue
        # jais: Conv1D transposes, mup scales baked into embd/head, and
        # max_alibi_bias recovered from the precomputed slopes tensor
        # (reference JaisModel modify_tensors/prepare_tensors)
        if arch == "jais":
            if name.endswith(".attn.bias"):
                continue          # causal-mask buffer, not a weight
            if name.endswith("relative_pe.slopes"):
                import math as _m
                nh2 = 2 ** int(_m.floor(_m.log2(
                    cfg["num_attention_heads"])))
                w.add_kv(f"{arch}.attention.max_alibi_bias",
                         -round(_m.log2(float(np.asarray(arr)[0])) * nh2))
                continue
            if name.endswith((".attn.c_attn.weight", ".attn.c_proj.weight",
                              ".mlp.c_fc.weight", ".mlp.c_fc2.weight",
                              ".mlp.c_proj.weight")):
                arr = np.asarray(arr, np.float32).T
            if name == "transformer.wte.weight":
                emb_scale = float(cfg.get("mup_embeddings_scale")
                                  or cfg.get("embeddings_scale") or 1.0)
                if cfg.get("mup_output_alpha") is not None:
                    width = float(cfg["mup_output_alpha"]) * \
                        float(cfg.get("mup_width_scale", 1.0))
                else:
                    width = float(cfg.get("width_scale", 1.0))
                a = np.asarray(arr, np.float32)
                emit("token_embd.weight", a * emb_scale)
                # tied head with its own mup width scale
                emit("output.weight", a * width)
                continue
        # jina-bert-v2 fused gated FFN: gated_layers [2F, C] rows are
        # [gate; up]; the up_gated_layer variant stores [up; gate]
        # (reference JinaBertV2Model.get_tensors)
        if arch == "jina-bert-v2" and (
                name.endswith("mlp.gated_layers.weight") or
                name.endswith("mlp.up_gated_layer.weight")):
            li = name.split(".")[2]
            a = np.asarray(arr, np.float32)
            half = a.shape[0] // 2
            first, second = ("ffn_gate", "ffn_up") \
                if name.endswith("gated_layers.weight") \
                else ("ffn_up", "ffn_gate")
            emit(f"blk.{li}.{first}.weight", a[:half])
            emit(f"blk.{li}.{second}.weight", a[half:])
            continue
        # bitnet: ternary-quantize the projection planes at convert
        # (reference BitnetModel.weight_quant: scale = mean|w|, round to
        # {-1,0,1} * scale)
        if arch == "bitnet" and name.endswith((
                "q_proj.weight", "k_proj.weight", "v_proj.weight",
                "o_proj.weight", "gate_proj.weight", "up_proj.weight",
                "down_proj.weight")):
            a = np.asarray(arr, np.float32)
            scale = max(float(np.abs(a).mean()), 1e-5)
            arr = np.clip(np.round(a / scale), -1, 1) * scale
        # arctic: arch-specific norm targets + the dense residual MLP
        # (reference tensor_mapping ARCTIC block overrides:
        # residual_layernorm -> ffn_norm, post_attention_layernorm ->
        # ffn_norm_exps — NOT the usual ffn_norm)
        if arch == "arctic" and ".residual_layernorm.weight" in name:
            emit(f"blk.{name.split('.')[2]}.ffn_norm.weight", arr)
            continue
        if arch == "arctic" and ".post_attention_layernorm.weight" in name:
            emit(f"blk.{name.split('.')[2]}.ffn_norm_exps.weight", arr)
            continue
        if arch == "arctic" and ".residual_mlp." in name:
            li = name.split(".")[2]
            wn = name.split(".")[4]
            gname = {"w1": "ffn_gate", "w3": "ffn_up",
                     "w2": "ffn_down"}[wn]
            emit(f"blk.{li}.{gname}.weight", arr)
            continue
        # grok per-expert planes: linear=gate, linear_v=up, linear_1=down
        if arch == "grok" and ".moe." in name:
            parts = name.split(".")
            li, ei, wn = int(parts[2]), int(parts[4]), parts[5]
            key = (li, {"linear": "ffn_gate_exps",
                        "linear_v": "ffn_up_exps",
                        "linear_1": "ffn_down_exps"}[wn])
            experts.setdefault(key, {})[ei] = np.asarray(arr, np.float32)
            if len(experts[key]) == n_expert:
                stacked = np.stack([experts[key][e]
                                    for e in range(n_expert)])
                w.add_tensor(f"blk.{key[0]}.{key[1]}.weight", stacked,
                             ggml_type=ggml_dtype)
                del experts[key]
            continue
        # granitemoe jetmoe-style experts: input_linear [E, 2F, C] holds
        # gate;up stacked on the row axis, output_linear [E, C, F] is the
        # down plane directly (reference GraniteMoeModel.modify_tensors)
        if arch == "granitemoe" and name.endswith(
                "block_sparse_moe.input_linear.weight"):
            li = name.split(".")[2]
            a = np.asarray(arr, np.float32)
            ffd = a.shape[1] // 2
            emit(f"blk.{li}.ffn_gate_exps.weight", a[:, :ffd, :])
            emit(f"blk.{li}.ffn_up_exps.weight", a[:, ffd:, :])
            continue
        if arch == "granitemoe" and name.endswith(
                "block_sparse_moe.output_linear.weight"):
            li = name.split(".")[2]
            emit(f"blk.{li}.ffn_down_exps.weight",
                 np.asarray(arr, np.float32))
            continue
        if arch == "granitemoe" and name.endswith(
                "block_sparse_moe.router.layer.weight"):
            li = name.split(".")[2]
            emit(f"blk.{li}.ffn_gate_inp.weight",
                 np.asarray(arr, np.float32))
            continue
        # dbrx fused expert planes: one [E*F, C] parameter per plane
        # (reference DbrxModel modify_tensors view/permute); w2 rows are
        # per-expert [F, C] used untransposed in HF, so down = [E, C, F]
        if arch == "dbrx" and ".ffn.experts.mlp." in name:
            li = int(name.split(".")[2])
            which = name.rsplit(".", 1)[1]
            ff = cfg["intermediate_size"]
            a = np.asarray(arr, np.float32).reshape(n_expert, ff, n_embd)
            gname = {"w1": "ffn_gate_exps", "v1": "ffn_up_exps",
                     "w2": "ffn_down_exps"}[which]
            if which == "w2":
                a = a.transpose(0, 2, 1)
            w.add_tensor(f"blk.{li}.{gname}.weight", a,
                         ggml_type=ggml_dtype)
            continue
        # expert stacking: mixtral w1/w2/w3, qwen-moe {gate,up,down}_proj
        if ".block_sparse_moe.experts." in name or ".mlp.experts." in name:
            parts = name.split(".")
            li, ei, wn = int(parts[2]), int(parts[5]), parts[6]
            key = (li, {"w1": "ffn_gate_exps", "w3": "ffn_up_exps",
                        "w2": "ffn_down_exps",
                        "gate_proj": "ffn_gate_exps",
                        "up_proj": "ffn_up_exps",
                        "down_proj": "ffn_down_exps"}[wn])
            experts.setdefault(key, {})[ei] = arr.astype(np.float32)
            if len(experts[key]) == n_expert:
                stacked = np.stack([experts[key][e] for e in range(n_expert)])
                w.add_tensor(f"blk.{key[0]}.{key[1]}.weight", stacked,
                             ggml_type=ggml_dtype)
                del experts[key]
            continue
        # internlm2 grouped fused wqkv: ((q_per_kv q-heads, 1 k, 1 v) per
        # kv group) rows deinterleave into standard q/k/v with the
        # NORM-rope permutation (reference InternLM2Model.modify_tensors)
        if arch == "internlm2" and name.endswith("attention.wqkv.weight"):
            idx = name.split(".")[2]
            a = np.asarray(arr, np.float32)
            qpk = n_head // n_kv
            g = a.reshape(n_kv, qpk + 2, head_dim, a.shape[-1])
            q = g[:, :qpk].reshape(n_head * head_dim, -1)
            k = g[:, -2].reshape(n_kv * head_dim, -1)
            v = g[:, -1].reshape(n_kv * head_dim, -1)
            emit(f"blk.{idx}.attn_q.weight", permute_qk(q, n_head))
            emit(f"blk.{idx}.attn_k.weight", permute_qk(k, n_kv))
            emit(f"blk.{idx}.attn_v.weight", v)
            continue
        # baichuan-7B fused W_pack: three equal stacked blocks [q; k; v]
        # (reference BaichuanModel._reverse_hf_permute_part)
        if arch == "baichuan" and name.endswith("self_attn.W_pack.weight"):
            idx = name.split(".")[2]
            a = np.asarray(arr, np.float32)
            part = a.shape[0] // 3
            emit(f"blk.{idx}.attn_q.weight",
                 permute_qk(a[:part], n_head))
            emit(f"blk.{idx}.attn_k.weight",
                 permute_qk(a[part:2 * part], n_kv))
            emit(f"blk.{idx}.attn_v.weight", a[2 * part:])
            continue
        # chatglm fused gate_up -> split gate/up rows (GLM chunks the
        # projection in half: act(gate) * up)
        if arch == "chatglm" and name.endswith("mlp.gate_up_proj.weight"):
            idx = name.split(".")[2]
            a = np.asarray(arr, np.float32)
            half = a.shape[0] // 2
            emit(f"blk.{idx}.ffn_gate.weight", a[:half])
            emit(f"blk.{idx}.ffn_up.weight", a[half:])
            continue
        # phi3 fused rows split into standard tensors (Phi3Model
        # modify_tensors does the same split in the reference)
        if arch == "phi3" and name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx, _, suffix = rest.partition(".")
            if suffix == "self_attn.qkv_proj.weight":
                a = np.asarray(arr, np.float32)
                nq = n_head * head_dim
                nkv = n_kv * head_dim
                emit(f"blk.{idx}.attn_q.weight", a[:nq])
                emit(f"blk.{idx}.attn_k.weight", a[nq:nq + nkv])
                emit(f"blk.{idx}.attn_v.weight", a[nq + nkv:nq + 2 * nkv])
                continue
            if suffix == "mlp.gate_up_proj.weight":
                a = np.asarray(arr, np.float32)
                half = a.shape[0] // 2
                emit(f"blk.{idx}.ffn_gate.weight", a[:half])
                emit(f"blk.{idx}.ffn_up.weight", a[half:])
                continue
        # openelm fused ffn.proj_1 rows [gate; up] at the LAYER's width
        # (reference OpenELMModel.modify_tensors split)
        if arch == "openelm" and name.endswith(".ffn.proj_1.weight"):
            li = int(name.split(".")[2])
            ff = per_layer["feed_forward_length"][li]
            a = np.asarray(arr, np.float32)
            emit(f"blk.{li}.ffn_gate.weight", a[:ff])
            emit(f"blk.{li}.ffn_up.weight", a[ff:])
            continue
        # plamo: q/o regrouped from the HF interleaved GQA order (q head i
        # reads kv head i % n_kv) to the kv-major llama layout, + the
        # NORM-rope row permute (generalizes the reference PlamoModel
        # shuffle_attn_{q,output}_weight 5120-hardcoded reshapes)
        if arch == "plamo" and name.startswith("model.layers.layers."):
            if name.endswith("rotary_emb.inv_freq"):
                continue
            sub = name[len("model.layers.layers."):]
            li, _, suffix = sub.partition(".")
            ns = n_head // plamo_kv
            if suffix == "self_attn.q_proj.weight":
                a = np.asarray(arr, np.float32)
                a = a.reshape(ns, plamo_kv, head_dim, -1) \
                     .transpose(1, 0, 2, 3) \
                     .reshape(n_head * head_dim, a.shape[-1])
                emit(f"blk.{li}.attn_q.weight", permute_qk(a, n_head))
                continue
            if suffix == "self_attn.k_proj.weight":
                emit(f"blk.{li}.attn_k.weight",
                     permute_qk(np.asarray(arr, np.float32), plamo_kv))
                continue
            if suffix == "self_attn.o_proj.weight":
                a = np.asarray(arr, np.float32)
                a = a.reshape(a.shape[0], ns, plamo_kv, head_dim) \
                     .transpose(0, 2, 1, 3).reshape(a.shape[0], -1)
                emit(f"blk.{li}.attn_output.weight", a)
                continue
            name = "model.layers." + sub   # v/norm/ffn: generic map
        gname = map_name(name, arch)
        if gname is None:
            continue
        arr = np.asarray(arr)
        if arr.dtype != np.float32:
            arr = arr.astype(np.float32)
        if arch == "deci" and gname.endswith(("attn_q.weight",
                                              "attn_k.weight")):
            # NORM-rope permute at the LAYER's head count (per-layer kv
            # heads — reference DeciModel.modify_tensors per-bid permute)
            arr = permute_qk(arr, arr.shape[0] // head_dim)
        if arch == "gpt2" and gname.endswith(GPT2_TRANSPOSE):
            arr = np.ascontiguousarray(arr.T)  # Conv1D [in,out] -> [out,in]
        if arch == "bloom" and gname.endswith("attn_qkv.weight"):
            # HF bloom fuses qkv per-head-interleaved [H, 3, d, C] ->
            # contiguous [q; k; v] rows (reference BloomModel
            # modify_tensors reshape)
            arr = arr.reshape(
                n_head, 3, head_dim, arr.shape[-1]).transpose(
                1, 0, 2, 3).reshape(3 * n_head * head_dim, arr.shape[-1])
        if arch == "bloom" and gname.endswith("attn_qkv.bias"):
            arr = arr.reshape(n_head, 3, head_dim).transpose(
                1, 0, 2).reshape(-1)
        if arch == "mamba":
            if gname.endswith("ssm_a.weight"):
                arr = -np.exp(arr)  # A_log -> A (reference MambaModel)
            elif gname.endswith("ssm_conv1d.weight") and arr.ndim == 3:
                # [d_inner, 1, d_conv] depthwise taps -> [d_inner, d_conv]
                arr = np.ascontiguousarray(arr[:, 0, :])
        if is_norm_rope and gname.endswith("attn_q.weight"):
            arr = permute_qk(arr, n_head)
        elif is_norm_rope and gname.endswith("attn_k.weight"):
            arr = permute_qk(arr, n_kv)
        if arch == "falcon" and gname.endswith("attn_qkv.weight") and \
                cfg.get("new_decoder_architecture"):
            arr = deinterleave_falcon_qkv(arr, n_head, n_kv, head_dim)
        if arch == "gptneox" and gname.endswith("attn_qkv.weight"):
            # per-head [q|k|v] interleave -> contiguous [q; k; v] rows
            # (reference GPTNeoXModel.modify_tensors reshape)
            arr = arr.reshape(n_head, 3, head_dim, arr.shape[-1]) \
                     .transpose(1, 0, 2, 3).reshape(3 * n_head * head_dim,
                                                    arr.shape[-1])
        if arch == "gptneox" and gname.endswith("attn_qkv.bias"):
            arr = arr.reshape(n_head, 3, head_dim) \
                     .transpose(1, 0, 2).reshape(-1)
        if arch in ("gemma", "gemma2", "gemma3") and (
                gname.endswith("_norm.weight") or
                gname.endswith("post_attention_norm.weight") or
                gname.endswith("post_ffw_norm.weight") or
                gname == "output_norm.weight"):
            arr = arr + 1.0   # HF gemma stores (w - 1); GGUF stores w
        if arch == "nemotron" and (gname.endswith("norm.weight")):
            # layernorm1p: the +1 is folded into the weights at convert so
            # the engine runs a plain LayerNorm (reference
            # NemotronModel.modify_tensors, convert_hf_to_gguf.py:4952-4959)
            arr = arr + 1.0
        if gname.endswith("ffn_gate_inp_shexp.weight"):
            arr = arr.reshape(-1)  # HF [1, C] -> GGUF [n_embd]
        if gname == "output.weight":
            seen_output = True
        emit(gname, arr)
    if qk_norms:
        raise ValueError(f"unprocessed per-head qk norms: "
                         f"{sorted(qk_norms)}")
    if n_visual_skipped:
        print(f"note: skipped {n_visual_skipped} visual.* tensors "
              "(text GGUF; write the vision tower separately with "
              "--mmproj)", file=sys.stderr)
    w.write()


def convert_qwen2vl_mmproj(path: str, out_path: str) -> None:
    """Qwen2-VL vision tower + merger -> mmproj GGUF with the reference
    surgery script's naming (examples/llava/qwen2_vl_surgery.py), so files
    from either converter load interchangeably: fused qkv split into
    q/k/v, the Conv3d patch embed split into two per-frame conv2d
    tensors, merger ln_q -> v.post_ln, merger.mlp.{0,2} -> mm.{0,2}, and
    the surgery's SWAPPED mlp names (fc1 -> ffn_down, fc2 -> ffn_up)."""
    with open(os.path.join(path, "config.json"), encoding="utf-8") as f:
        cfg = json.load(f)
    vcfg = cfg.get("vision_config") or {}
    if not vcfg:
        raise ValueError("config.json has no vision_config "
                         "(not a Qwen2-VL checkpoint)")
    embed = vcfg.get("embed_dim", 1280)
    w = GGUFWriter(out_path, arch="clip")
    md = {
        "clip.has_text_encoder": False,
        "clip.has_vision_encoder": True,
        "clip.has_qwen2vl_merger": True,
        "clip.projector_type": "qwen2vl_merger",
        "clip.use_silu": "silu" in vcfg.get("hidden_act", "quick_gelu"),
        "clip.use_gelu": ("gelu" in vcfg.get("hidden_act", "quick_gelu")
                          and "quick" not in vcfg.get("hidden_act", "")),
        "clip.vision.patch_size": vcfg.get("patch_size", 14),
        "clip.vision.image_size": 14 * 40,
        "clip.vision.embedding_length": embed,
        "clip.vision.projection_dim": vcfg.get(
            "hidden_size", cfg.get("hidden_size", 0)),
        "clip.vision.attention.head_count": vcfg.get("num_heads", 16),
        "clip.vision.attention.layer_norm_epsilon": 1e-6,
        "clip.vision.block_count": vcfg.get("depth", 32),
        "clip.vision.feed_forward_length": 0,
    }
    for k, v in md.items():
        w.add_kv(k, v)

    def emit(gname, arr):
        w.add_tensor(gname, np.asarray(arr, np.float32),
                     ggml_type=GGMLType.F32)

    n_emitted = 0
    for name, arr in iter_hf_tensors(path):
        for pre in ("model.visual.", "visual."):
            if name.startswith(pre):
                name = name[len(pre):]
                break
        else:
            continue
        n_emitted += 1
        if name == "patch_embed.proj.weight":
            a = np.asarray(arr, np.float32).reshape(
                embed, 3, 2, vcfg.get("patch_size", 14), -1)
            emit("v.patch_embd.weight", a[:, :, 0])
            emit("v.patch_embd.weight.1", a[:, :, 1])
        elif ".attn.qkv." in name:
            li = name.split(".")[1]
            a = np.asarray(arr, np.float32)
            c = a.shape[0] // 3
            kind = "weight" if name.endswith("weight") else "bias"
            emit(f"v.blk.{li}.attn_q.{kind}", a[:c])
            emit(f"v.blk.{li}.attn_k.{kind}", a[c:2 * c])
            emit(f"v.blk.{li}.attn_v.{kind}", a[2 * c:])
        elif name.startswith("merger.ln_q."):
            emit("v.post_ln." + name.rsplit(".", 1)[1], arr)
        elif name.startswith("merger.mlp."):
            _, _, idx, kind = name.split(".")
            emit(f"mm.{idx}.{kind}", arr)
        elif name.startswith("blocks."):
            _, li, rest = name.split(".", 2)
            rest = (rest.replace("norm1", "ln1").replace("norm2", "ln2")
                        .replace("attn.proj", "attn_out")
                        .replace("mlp.fc1", "ffn_down")   # surgery quirk
                        .replace("mlp.fc2", "ffn_up")
                        .replace("attn.", "attn_"))
            emit(f"v.blk.{li}.{rest}", arr)
        else:
            n_emitted -= 1
    if not n_emitted:
        raise ValueError("no visual.* tensors found in checkpoint")
    w.write()


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser("convert-hf-to-gguf (tpu)")
    ap.add_argument("model_dir")
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--outtype", default="F16",
                    choices=["F16", "BF16", "F32", "Q8_0"])
    ap.add_argument("--mmproj", action="store_true",
                    help="write the Qwen2-VL vision tower mmproj GGUF "
                         "instead of the text model")
    args = ap.parse_args(argv)
    if args.mmproj:
        convert_qwen2vl_mmproj(args.model_dir, args.outfile)
    else:
        convert(args.model_dir, args.outfile, args.outtype)
    print(f"wrote {args.outfile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
