"""Device mesh + sharding helpers.

The reference's parallelism is DDP over NCCL (scripts/submit_slurm.sh:34) with
FSDP/ZeRO config passthrough (training_args.py:213-251). The TPU-native
equivalents here (SURVEY.md §2c):

- DP: batch sharded over a 1-D ``data`` mesh axis; XLA inserts the gradient
  psum (riding ICI) when the jitted step closes over replicated params and a
  data-sharded batch;
- ZeRO-like param/optimizer sharding (``shard_params=True``): every leaf
  whose leading axis divides the mesh is sharded on axis 0 (layer-stacked
  weights shard cleanly: L=32 over 8 chips), the rest stay replicated —
  XLA all-gathers just-in-time per layer, reduce-scatters grads;
- multi-host: ``jax.distributed.initialize`` before mesh creation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    needed = int(np.prod(shape))
    if needed > len(devices):
        raise ValueError(f"mesh shape {shape} needs {needed} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices[:needed]).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params, mesh: Mesh, shard_params: bool = False,
                    axis: str = "data"):
    """Replicated by default; with ``shard_params`` each leaf with a leading
    axis divisible by the mesh size is sharded on axis 0 (ZeRO-ish)."""
    n = mesh.shape[axis]

    def leaf_sharding(leaf):
        if (shard_params and hasattr(leaf, "shape") and leaf.ndim >= 2
                and leaf.shape[0] % n == 0 and leaf.shape[0] >= n):
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf_sharding, params)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded on the leading dim."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
