"""llama_cpp_test_tpu — a TPU-native quantized-inference framework.

A from-scratch JAX/XLA/Pallas re-imagination of llama.cpp (+ its paged-KV fork,
reference at /root/reference): GGUF block-quantized LLaMA-family model serving with

  * fused Pallas dequant-matmul kernels reading packed super-blocks from HBM
    (the TPU-native equivalent of ggml's CUDA mmq/mmvq and CPU vec_dot kernels),
  * a JAX-native paged KV cache (block tables, slot mappings, copy-on-write)
    with Pallas paged-attention kernels,
  * continuous batching, sampler chain, speculative decoding,
  * GSPMD mesh sharding (tensor/data/expert parallel) for multi-chip scaling.

Layer map (mirrors SURVEY.md §1; reference layer → this package):

  ggml tensor/op core + backends  →  ops/       (Pallas kernels + XLA ops)
  ggml-quants codecs              →  quant/     (numpy codecs + TPU repack)
  gguf container                  →  gguf/      (reader/writer, mmap)
  libllama model runtime          →  models/ + runtime/
  KV cache (+ fork's paged KV)    →  runtime/kv_cache.py, ops/paged_attention.py
  samplers / grammar              →  runtime/sampling.py, runtime/grammar.py
  tokenizers                      →  tokenizer/
  common + examples (cli/server)  →  cli/ + server/
  multi-GPU split / RPC           →  parallel/  (jax.sharding Mesh + GSPMD)
"""

__version__ = "0.1.0"
