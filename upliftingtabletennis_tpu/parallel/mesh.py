"""Device-mesh construction and sharding strategies.

The reference's only (dormant) parallelism is DDP over NCCL
(ref: vit_pose/vit_utils/dist_util.py:47-118, train_valid_fn.py:48-68).
The TPU-native equivalent is jit-partitioned data parallelism over an ICI
mesh: batches sharded over the 'dp' axis, parameters replicated, gradient
reduction emitted by XLA as psum over ICI. Multi-host (DCN) extends the same
mesh with an outer axis — `make_mesh` accepts an explicit device list so the
driver can lay DCN-connected slices on a separate axis.

All models here are small (<10M params), so tensor/pipeline sharding would
only add latency; 'dp' (+ optional 'mp' axis reserved for the detection
models' activation sharding at very large batch) is the right decomposition.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_dp: Optional[int] = None,
    n_mp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('dp', 'mp') mesh. Defaults to all devices on the dp axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_mp
    if n_dp * n_mp > len(devices):
        raise ValueError(
            f"mesh {n_dp}x{n_mp} needs {n_dp * n_mp} devices, have {len(devices)}"
        )
    # object array built explicitly: np.asarray may mis-coerce Device lists
    devs = np.empty(n_dp * n_mp, dtype=object)
    for i, d in enumerate(devices[: n_dp * n_mp]):
        devs[i] = d
    return Mesh(devs.reshape(n_dp, n_mp), axis_names=("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of arrays with the batch axis sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
