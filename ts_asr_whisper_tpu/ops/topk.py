"""Exact top-k over huge rows without XLA's top-k sort.

``jax.lax.top_k`` over beam search's (B, n*V ~ 260k) candidate rows lowers
to a partial-sort pipeline that costs ~0.34 ms/step on v5e (trace:
fusion.971/982 of the beam while body) even for k = 10. For k << V the
TPU-friendly formulation is threshold selection: find the k-th largest
value by a 32-step binary search on the monotone uint32 encoding of the
floats (ops/ctc_prefix.py::kth_largest_keys — ~32 cheap masked reductions),
compact the members' indices with a cumsum scatter, and sort only the k
survivors.

Tie semantics match ``lax.top_k`` exactly: equal values are admitted in
index order (the first ``m_needed`` ties at the threshold), and the final
k-element sort is stable over the index-ordered members, so the returned
(values, indices) pairs are identical — pinned by tests/test_topk.py
against tie-heavy random inputs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .ctc_prefix import kth_largest_keys

_IMPL = "lax"  # 'lax' | 'thresholded' — trace-time switch (see set_topk_impl)


def set_topk_impl(impl: str) -> None:
    """Select the beam candidate top-k implementation. 'thresholded' is
    exact-equivalent (tests/test_topk.py) but its TPU win must be measured
    per generation — a scatter-based first cut was 6x SLOWER end-to-end
    (scatters serialize on TPU), so the known-good 'lax' stays the default
    until the driver bench proves the replacement. Trace-time state: clear
    jit caches (beam_search.clear_cache()) after switching."""
    global _IMPL
    assert impl in ("lax", "thresholded"), impl
    _IMPL = impl


def get_topk_impl() -> str:
    return _IMPL


def topk_large(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """top_k for huge rows, dispatching on the configured impl."""
    if _IMPL == "thresholded":
        return topk_thresholded(x, k)
    return jax.lax.top_k(x, k)


def topk_thresholded(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for ``jax.lax.top_k(x, k)`` on 2-D float32 inputs, exact
    including tie order. Efficient when k << x.shape[1]."""
    b, v = x.shape
    x = x.astype(jnp.float32)
    keys, kth = kth_largest_keys(x, k)

    greater = keys > kth[:, None]
    ties = keys == kth[:, None]
    m_needed = (k - greater.sum(axis=1))[:, None]
    tie_rank = jnp.cumsum(ties, axis=1)
    member = greater | (ties & (tie_rank <= m_needed))      # exactly k set

    # compact member indices in index order WITHOUT a scatter (TPU
    # scatters serialize — a first version cost ~3 ms/step at (8, 260k)):
    # member j+1's index is the first position where cumsum(member) == j+1,
    # found by a vectorized argmax over the row
    cs = jnp.cumsum(member, axis=1)                         # (B, V)
    hit = (cs[:, None, :] == jnp.arange(1, k + 1)[None, :, None]) \
        & member[:, None, :]                                # (B, k, V)
    idx = jnp.argmax(hit, axis=2).astype(jnp.int32)         # first True
    vals = jnp.take_along_axis(x, idx, axis=1)              # index order

    # rank the k members by value; ties keep index order (members are
    # already index-ordered, and lax.top_k on the small array breaks equal
    # values by position) — identical ordering to the full-size top_k
    vals_sorted, order = jax.lax.top_k(vals, k)
    idx_sorted = jnp.take_along_axis(idx, order, axis=1)
    return vals_sorted, idx_sorted
