"""LoRA fine-tuning (reference containers.py:69-78 wraps the decoder with
peft LoRA; here it is a parallel low-rank param tree merged into the dense
weights inside the jitted loss).

Default targets mirror peft's Whisper defaults: decoder q_proj / v_proj.
Training only the LoRA tree = optax mask ('lora' label) — the Trainer's
optimizer machinery handles that via path prefixes ('lora/...').
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp


def init_lora(
    key,
    params: Dict[str, Any],
    rank: int = 8,
    targets: Sequence[str] = ("q_proj", "v_proj"),
    scope: str = "decoder",
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Build a LoRA tree mirroring the structure of targeted linears.

    Each targeted kernel (..., in, out) (stacked-layer leaves keep their
    leading L axis) gets A ~ N(0, 1/r) (..., in, r) and B = 0 (..., r, out).
    """
    lora: Dict[str, Any] = {}
    keys = iter(jax.random.split(key, 256))

    def visit(node, out_node):
        for name, child in node.items():
            if isinstance(child, dict) and name in targets and "kernel" in child:
                kshape = child["kernel"].shape
                *lead, d_in, d_out = kshape
                a = jax.random.normal(next(keys), (*lead, d_in, rank),
                                      dtype) * (1.0 / rank)
                b = jnp.zeros((*lead, rank, d_out), dtype)
                out_node[name] = {"lora_A": a, "lora_B": b}
            elif isinstance(child, dict):
                sub: Dict[str, Any] = {}
                visit(child, sub)
                if sub:
                    out_node[name] = sub

    scoped: Dict[str, Any] = {}
    visit(params[scope], scoped)
    if scoped:
        lora[scope] = scoped
    return lora


def merge_lora(params: Dict[str, Any], lora: Dict[str, Any],
               alpha: float = 16.0, rank: int = 8) -> Dict[str, Any]:
    """Return params with kernel += (alpha/rank) * A @ B on targeted leaves.
    Differentiable wrt the lora tree; cheap (rank-r matmuls) under jit."""
    scale = alpha / rank

    def visit(p_node, l_node):
        out = dict(p_node)
        for name, l_child in l_node.items():
            if "lora_A" in l_child:
                delta = jnp.einsum("...ir,...ro->...io", l_child["lora_A"],
                                   l_child["lora_B"]) * scale
                target = dict(p_node[name])
                target["kernel"] = p_node[name]["kernel"] + delta.astype(
                    p_node[name]["kernel"].dtype)
                out[name] = target
            else:
                out[name] = visit(p_node[name], l_child)
        return out

    out = dict(params)
    for scope, l_node in lora.items():
        out[scope] = visit(params[scope], l_node)
    return out
