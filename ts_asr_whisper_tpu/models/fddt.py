"""FDDT — Frame-level Diarization-Dependent Transformations, TPU-first.

Semantics of the reference module (/root/reference/src/models/dicow/FDDT.py):
per STNO class c in (silence, target, non-target, overlap),
``h' = sum_c mask_c * (W_c h + b_c)`` (full), ``h' = sum_c mask_c * (w_c ⊙ h + b_c)``
(diagonal), or ``h' = h + sum_c mask_c * b_c`` (bias-only).

TPU design: instead of 4 gated branches, the diagonal case is computed as two
tiny matmuls ``scale = m @ W  (T,4)x(4,D)``, ``shift = m @ B`` followed by one
fused elementwise ``h*scale + shift`` — one pass over HBM, vmappable over any
leading dims. Disabled classes contribute the identity transform, encoded as
constant identity rows (no parameters, matching the reference's absent
submodules).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

STNO_CLASSES = ("silence", "target", "non_target", "overlap")

Params = Dict[str, Any]


def init_fddt(
    key,
    d_model: int,
    non_target_rate: float = 0.01,
    fddt_init: Optional[str] = "suppressive",
    is_diagonal: bool = True,
    bias_only: bool = False,
    use_silence: bool = True,
    use_target: bool = True,
    use_overlap: bool = True,
    use_non_target: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Init matching the reference (FDDT.py:7-39, layers.py:49-77):
    target/overlap eye value 1.0; silence/non-target eye value
    ``non_target_rate``; 'suppressive' fills the (diagonal of the) weight with
    the eye value, 'non-disturbing' with 1.0/identity, 'random' keeps the
    uniform fan-in init. Bias always zero-init."""
    use = {"silence": use_silence, "target": use_target,
           "non_target": use_non_target, "overlap": use_overlap}
    eye_vals = {"silence": non_target_rate, "target": 1.0,
                "non_target": non_target_rate, "overlap": 1.0}
    params: Params = {}
    keys = jax.random.split(key, 4)
    for i, cls in enumerate(STNO_CLASSES):
        if not use[cls]:
            continue
        if bias_only:
            params[cls] = {"bias": jnp.zeros((d_model,), dtype)}
            continue
        if is_diagonal:
            bound = (3.0 / d_model) ** 0.5
            w = jax.random.uniform(keys[i], (d_model,), dtype, -bound, bound)
            if fddt_init == "non-disturbing":
                w = jnp.ones((d_model,), dtype)
            elif fddt_init == "suppressive":
                w = jnp.full((d_model,), eye_vals[cls], dtype)
            params[cls] = {"weight": w, "bias": jnp.zeros((d_model,), dtype)}
        else:
            # xavier-uniform default, overwritten by scaled identity for the
            # suppressive / non-disturbing modes (layers.py:27-47)
            bound = (6.0 / (d_model + d_model)) ** 0.5
            w = jax.random.uniform(keys[i], (d_model, d_model), dtype, -bound, bound)
            if fddt_init == "non-disturbing":
                w = jnp.eye(d_model, dtype=dtype)
            elif fddt_init == "suppressive":
                w = eye_vals[cls] * jnp.eye(d_model, dtype=dtype)
            params[cls] = {"weight": w, "bias": jnp.zeros((d_model,), dtype)}
    return params


def apply_fddt(
    params: Params,
    hidden: jax.Array,      # (..., T, D)
    stno_mask: jax.Array,   # (..., 4, T)
    is_diagonal: bool = True,
    bias_only: bool = False,
) -> jax.Array:
    """Apply the STNO-conditioned affine mix. ``params`` may carry a leading
    stacked-layer axis on every leaf when used inside a layer scan."""
    dtype = hidden.dtype
    d = hidden.shape[-1]
    m = jnp.swapaxes(stno_mask, -1, -2).astype(dtype)  # (..., T, 4)

    def stack_rows(field: str, default_row):
        rows = []
        for cls in STNO_CLASSES:
            p = params.get(cls)
            if p is None or field not in p:
                rows.append(jnp.asarray(default_row, dtype))
            else:
                rows.append(p[field].astype(dtype))
        return jnp.stack(rows, axis=-2)  # (4, D)

    if bias_only:
        bias = stack_rows("bias", jnp.zeros((d,)))
        return hidden + m @ bias

    if is_diagonal:
        weight = stack_rows("weight", jnp.ones((d,)))  # identity scale default
        bias = stack_rows("bias", jnp.zeros((d,)))
        scale = m @ weight   # (..., T, D)
        shift = m @ bias
        return hidden * scale + shift

    # full linear per class: h' = sum_c m_c * (h @ W_c^T + b_c)
    out = jnp.zeros_like(hidden)
    for ci, cls in enumerate(STNO_CLASSES):
        p = params.get(cls)
        if p is None:
            y = hidden
        else:
            # torch Linear computes x @ W.T + b with W (out, in); we keep the
            # torch (out, in) layout for checkpoint parity.
            w = p["weight"].astype(dtype)
            y = hidden @ jnp.swapaxes(w, -1, -2) + p["bias"].astype(dtype)
        out = out + m[..., ci : ci + 1] * y
    return out
