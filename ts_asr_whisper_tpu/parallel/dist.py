"""Multi-host process helpers — the TPU equivalents of the reference's
torch.distributed helpers (wer_utils.py:185-202) and metric/object broadcast
(evaluation.py:290 ``broadcast_object_list``).

Execution model (reference: torchrun DDP, scripts/submit_slurm.sh:34):

- training runs SPMD over the GLOBAL mesh — every process feeds its local
  rows of each global batch (parallel/mesh.py::shard_batch uses
  ``jax.make_array_from_process_local_data`` when the mesh spans
  processes) and XLA's collectives ride ICI/DCN;
- long-form eval shards the DATASET by process (the reference's DDP eval
  sampler), each process decodes on its local devices, predictions are
  gathered with ``gather_from_processes`` and rank 0 scores + broadcasts
  the metric dict (``broadcast_from_main``) exactly like
  evaluation.py:239-291.

Arbitrary Python objects (metric dicts with string keys, prediction
lists) travel pickled through fixed-shape uint8 collectives, since
``multihost_utils`` only moves same-shape array pytrees.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize from args or JAX_* env vars; no-op for
    single-process runs."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def get_rank() -> int:
    return jax.process_index()


def is_zero_rank() -> bool:
    return jax.process_index() == 0


def world_size() -> int:
    return jax.process_count()


def barrier(name: str = "barrier") -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def broadcast_from_main(obj: Any) -> Any:
    """Metric dict broadcast (evaluation.py:290 equivalent): process 0's
    value wins everywhere. Arbitrary picklable objects — non-zero ranks'
    ``obj`` is ignored (they may pass None)."""
    if jax.process_count() <= 1:
        return obj
    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        pickle.dumps(obj) if jax.process_index() == 0 else b"",
        dtype=np.uint8)
    # two rounds: every process must present same-shape arrays, so the
    # length travels first and non-zero ranks size a dummy buffer
    n = int(multihost_utils.broadcast_one_to_all(
        np.asarray(payload.size, dtype=np.int64)))
    buf = payload if jax.process_index() == 0 else np.zeros(n, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return pickle.loads(out.tobytes())


def gather_from_processes(obj: Any) -> List[Any]:
    """All-gather one picklable object per process; returns the list
    indexed by process id on EVERY process (the reference's eval
    prediction gather inside HF Trainer's evaluation_loop)."""
    if jax.process_count() <= 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = np.asarray(multihost_utils.process_allgather(
        np.asarray(payload.size, dtype=np.int64)))
    width = int(sizes.max())
    buf = np.zeros(width, np.uint8)
    buf[: payload.size] = payload
    rows = np.asarray(multihost_utils.process_allgather(buf))
    return [pickle.loads(rows[i, : int(sizes[i])].tobytes())
            for i in range(jax.process_count())]


def shard_indices_by_process(n: int) -> List[int]:
    """Round-robin item shard for this process (the DDP eval sampler:
    item i belongs to rank i % world). Every process gets ceil-ish equal
    work; duplicate-free, union covers [0, n)."""
    return list(range(jax.process_index(), n, jax.process_count()))
