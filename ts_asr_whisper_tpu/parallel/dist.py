"""Multi-host process helpers — the TPU equivalents of the reference's
torch.distributed helpers (wer_utils.py:185-202) and metric broadcast
(evaluation.py:290)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


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
    value wins everywhere."""
    if jax.process_count() <= 1:
        return obj
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(obj)
