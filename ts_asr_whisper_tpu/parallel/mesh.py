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


# Megatron-style tensor-parallel placement by parameter name: column-shard
# the projections whose outputs are head-/ffn-parallel, row-shard the ones
# that contract back to the model dim (XLA GSPMD inserts the psum). The
# reference has no TP (SURVEY.md §2c: DDP only); this is the TPU-native
# scaling axis for models whose layer weights outgrow one chip's HBM.
_TP_COL = ("q_proj/kernel", "k_proj/kernel", "v_proj/kernel", "fc1/kernel",
           "q_proj/bias", "v_proj/bias", "fc1/bias")
_TP_ROW = ("out_proj/kernel", "fc2/kernel")


def param_shardings(params, mesh: Mesh, shard_params: bool = False,
                    axis: str = "data", tp_axis: Optional[str] = None):
    """Replicated by default; with ``shard_params`` each leaf with a leading
    axis divisible by the mesh size is sharded on axis 0 (ZeRO-ish). With
    ``tp_axis`` (an axis name present in the mesh) attention/MLP projections
    are additionally tensor-sharded Megatron-style — both compose, e.g.
    stacked layer weights (L, d_in, d_out) can carry P('data', None,
    'model')."""
    n = mesh.shape[axis]
    tp = mesh.shape[tp_axis] if tp_axis and tp_axis in mesh.shape else 0

    def leaf_sharding(path, leaf):
        if not hasattr(leaf, "shape"):
            return NamedSharding(mesh, P())
        dims = [None] * leaf.ndim
        if (shard_params and leaf.ndim >= 2
                and leaf.shape[0] % n == 0 and leaf.shape[0] >= n):
            dims[0] = axis
        if tp > 1:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if name.endswith(_TP_COL) and leaf.shape[-1] % tp == 0:
                dims[-1] = tp_axis
            elif (name.endswith(_TP_ROW) and leaf.ndim >= 2
                    and leaf.shape[-2] % tp == 0):
                dims[-2] = tp_axis
        while dims and dims[-1] is None:
            dims.pop()
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded on the leading dim.

    Single-process meshes take the full global batch. When the mesh spans
    processes (multi-host SPMD), ``batch`` must be this process's LOCAL
    rows of the global batch — global_batch[rank*local : (rank+1)*local]
    in mesh device order — and the global array is assembled without any
    cross-host data movement (each host's rows land on its own chips)."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1 and any(
            d.process_index != jax.process_index()
            for d in mesh.devices.flat):
        n_proc = len({d.process_index for d in mesh.devices.flat})
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x),
                (x.shape[0] * n_proc,) + x.shape[1:]),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
