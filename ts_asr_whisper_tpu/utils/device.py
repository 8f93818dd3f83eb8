"""Device-synchronization helpers for benchmarking/timing code."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def force_execution(tree) -> None:
    """True device barrier for timing: on the remoted-TPU backend
    ``jax.block_until_ready`` can return before execution finishes, so the
    only reliable barrier is fetching a leaf (all prior dispatches on the
    stream must complete first). Used by bench.py and
    scripts/profile_decode.py."""
    leaf = jax.tree.leaves(tree)[0]
    jax.device_get(jnp.ravel(leaf)[:1])
