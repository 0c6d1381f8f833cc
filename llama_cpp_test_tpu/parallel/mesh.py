"""Device mesh construction (single-host and multi-host)."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    """Mesh with ('dp', 'tp') axes. tp should map to the fastest (ICI-adjacent)
    axis, so it is the minor mesh dimension."""
    if devices is None:
        devices = jax.devices()
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def local_mesh(tp: int | None = None) -> Mesh:
    """All local devices as a 1×tp mesh (decode tensor-parallel default)."""
    devs = jax.devices()
    if tp is None:
        tp = len(devs)
    return make_mesh(1, tp, devs)


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host runtime init (the ggml-rpc replacement): one JAX process per
    host, ICI within slice, DCN across. No-op when already initialized."""
    import jax

    try:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    except RuntimeError:
        pass  # already initialized
