"""Multi-chip / multi-host parallelism.

The TPU-native replacement for the reference's multi-device machinery
(SPLIT_MODE_LAYER/ROW, ggml-rpc, backend scheduler — SURVEY.md §2.4):
a jax.sharding.Mesh with named axes

  dp — data parallel (batch / sequence slots)
  tp — tensor parallel (attention heads + FFN columns, Megatron-style)

and shard_map'ed step functions with explicit lax.psum/all_gather where the
reference used NCCL-style reductions inside its split-buffer matmuls.
"""
from .mesh import make_mesh, local_mesh  # noqa: F401
from .sharding import repack_sharded, shard_qtensor_cols  # noqa: F401
