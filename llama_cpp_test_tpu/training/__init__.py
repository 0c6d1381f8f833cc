"""Training — the ggml-opt analogue (reference ggml/src/ggml-opt.cpp,
GGML_OP_OPT_STEP_ADAMW), rebuilt TPU-native: optax AdamW over jitted
jax.value_and_grad of the teacher-forced forward pass, with per-layer
rematerialization (jax.checkpoint) instead of ggml's graph re-allocation."""
from .finetune import (LoraTrainer, TrainConfig, export_lora_gguf,  # noqa
                       init_lora_params)
