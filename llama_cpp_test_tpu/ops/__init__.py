"""Device compute ops: Pallas TPU kernels + XLA reference implementations.

This is the TPU-native replacement for ggml's backend kernel layer
(ggml-cuda/mmq+mmvq, ggml-cpu vec_dot): fused dequant-matmuls, paged
attention, RoPE, norms, sampling ops. Every Pallas kernel has an XLA
reference twin; conformance tests compare the two (the analogue of
tests/test-backend-ops.cpp's CPU-vs-backend harness).
"""
