"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no TPU needed) so sharding paths
compile and execute everywhere; the driver separately validates multi-chip
via __graft_entry__.dryrun_multichip.
"""
import os

# Force CPU. The image's sitecustomize imports jax and registers the axon
# TPU-tunnel platform (with remote compilation) before conftest runs, so env
# vars are too late — use jax.config, which takes effect at (lazy) backend
# initialization. Tests must be hermetic, CPU-only, and run on a virtual
# 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "gguf-py"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference gguf-py oracle not available"
)
