"""Fused Pallas kernel for beam-search decoder self-attention over an
APPEND-ONLY KV cache with ancestry-mask row selection.

Why this kernel exists (the 'ancestry' strategy end-state promised in
docs/PERFORMANCE.md "Beam-step roofline"): every pure-XLA formulation of
the beam KV-cache permutation pays ~1.3-1.6 ms/step of layout handling at
large-v3-turbo beam-5 batch-8 — a standalone permute forces
layout-conversion copies around the decoder scan's carry, an in-scan
gather re-materializes the carry, and the v2 ancestry formulation
(models/whisper.py::decoder_cached_ancestry, XLA path) degrades the cache
append into a full-tensor rewrite. Moving the ancestry-masked attention
read into a Pallas kernel removes every XLA op that expresses a layout
preference on the cache: the only remaining cache consumers in the step
are this kernel (default layout) and the trailing
``lax.dynamic_update_slice`` append (layout-agnostic), so XLA keeps one
layout end-to-end — no copies, no permute, and the append stays an
in-place slab write.

Mosaic layout note (v5e-validated): a first cut blocked the new-token
tensors as (n, 1, 1, hd) and stored via ``o_ref[:, 0, 0] = acc``; Mosaic
rejects the implied interior-singleton shape cast
(``vector<5x64> -> vector<5x1x1x64>``, "infer-vector-layout: unsupported
shape cast"). The rule this module now follows everywhere: every 2-D
working view inside the kernel is obtained by indexing LEADING block dims
only, so each block's trailing two dims ARE the 2-D tile Mosaic lays out
— (n, hd) for q/k_new/v_new/out (host-side transpose to (B, H, n, hd)),
(t, hd) for the cache (free leading-dim split to (B, n, H, T, hd)), and
(n, t) for hist. All reductions keep dims to avoid 1-D vectors.

Semantics (exactly decoder_cached_ancestry's XLA path): hypothesis row b
of a beam group attends, at cache position t < pos, to the K/V written by
group row ``hist[b, t]`` (its ancestor at that step); at t == pos to this
step's fresh k_new/v_new (the cache slot is written AFTER attention); and
nowhere at t > pos. Each group's n query rows all need the same n cache
rows, so the kernel loads the group block once — HBM traffic equals one
full cache read (the same as non-beam attention), and the n-fold extra
MXU work is noise at decode shapes.

Reference behavior being accelerated: HF beam search's
``_reorder_cache``/beam_idx gather as driven by
/root/reference/src/models/dicow/generation.py:1087-1088.

Hardware validation: the CPU test suite runs this kernel in interpret
mode only; ``scripts/tpu_kernel_check.py`` asserts the Mosaic-COMPILED
path (tokens identical, scores within 2e-5 of the pure-XLA beam) on a
real chip — last verified on TPU v5e.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kernel(pos_ref, hist_ref, q_ref, kn_ref, vn_ref, ck_ref, cv_ref, o_ref,
            *, n: int):
    """One (beam group, head): ancestry-masked attention in VMEM.

    Block shapes: hist (1, n, T) int32; q/k_new/v_new/out (1, 1, n, hd);
    cache_k/cache_v (1, n, 1, T, hd) — the layer row selected by the
    BlockSpec index map. ``pos_ref`` is the scalar-prefetch [pos, layer]
    pair; the kernel reads only pos (layer is consumed by the index maps).
    All views below index leading dims only, keeping Mosaic's tiled
    trailing-2D layout intact.
    """
    pos = pos_ref[0]
    q = q_ref[0, 0]                        # (n, hd)
    k_new = kn_ref[0, 0]
    v_new = vn_ref[0, 0]
    hist = hist_ref[0]                     # (n, T)
    t = hist.shape[-1]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (n, t), 1)
    visible = t_idx < pos                  # history positions only
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.full((n, t), neg, jnp.float32)
    # exactly one c matches per (row, t<pos): a select-accumulate over the
    # group's n cache rows IS the ancestry permutation, with zero data
    # movement beyond the one block load
    for c in range(n):
        k_c = ck_ref[0, c, 0]              # (T, hd)
        s_c = jax.lax.dot_general(
            q, k_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (n, T)
        scores = jnp.where((hist == c) & visible, s_c, scores)
    # the new token's self term, spliced at t == pos (the cache there is
    # stale: the append happens after attention)
    s_self = jnp.sum(q.astype(jnp.float32) * k_new.astype(jnp.float32),
                     axis=-1, keepdims=True)           # (n, 1)
    at_pos = t_idx == pos
    scores = jnp.where(at_pos, s_self, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)     # (n, T) fp32
    acc = jnp.zeros((n, q.shape[-1]), jnp.float32)
    for c in range(n):
        v_c = cv_ref[0, c, 0]              # (T, hd)
        w_c = jnp.where((hist == c) & visible, probs, 0.0).astype(v_c.dtype)
        acc = acc + jax.lax.dot_general(
            w_c, v_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    p_self = jnp.sum(jnp.where(at_pos, probs, 0.0),
                     axis=-1, keepdims=True)           # (n, 1)
    acc = acc + p_self * v_new.astype(jnp.float32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def ancestry_attention(q, k_new, v_new, cache_k, cache_v, hist, pos,
                       layer, n: int, interpret: bool = False):
    """Fused beam-decode self-attention over a stacked append-only cache.

    q/k_new/v_new: (Bb, H, 1, hd) this step's projections (q pre-scaled);
    cache_k/cache_v: (L, Bb, H, T, hd) the FULL layer-stacked PRE-update
    caches ('bhtd' layout) — the kernel reads only rows of ``layer`` via
    its BlockSpec index map, so passing the whole stack is free;
    hist: (Bb, T) int32 group-local ancestor row per position;
    pos/layer: scalar int32 cache position / decoder layer; n: beams per
    group. Returns attention output (Bb, H, 1, hd) in q's dtype.

    Why the full stack: with per-layer (Bb, H, T, hd) slices the decoder
    layer scan must route the caches as scan xs/ys, and XLA materializes
    the stacked ys through a ConcatBitcast plus TWO full-cache copies per
    step (~0.5 ms at beam-5 batch-8 turbo — trace: copy.656/657). With the
    stack passed whole and ``layer`` in the scalar-prefetch index map, the
    caches ride the scan CARRY, the append is one in-place slab
    dynamic_update_slice, and no stacking or copying ever happens.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bb, h, _, hd = q.shape
    n_layers, _, _, t, _ = cache_k.shape
    assert bb % n == 0, f"beam batch {bb} not divisible by beams {n}"
    assert cache_k.shape[1] == bb, (
        f"cache rows {cache_k.shape[1]} != beam batch {bb}")
    assert hist.shape == (bb, t), (
        f"hist shape {hist.shape} != (Bb, T) = {(bb, t)}")
    b = bb // n
    # host-side relayout: tiny new-token tensors go beams-trailing
    # (B, H, n, hd) so the kernel's 2-D views are leading-dim indexes; the
    # cache split (L, Bb, ...) -> (L*B, n, ...) is a free row-major
    # reshape (no copy)
    q4, kn4, vn4 = (
        x.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        for x in (q, k_new, v_new))
    ck5 = cache_k.reshape(n_layers * b, n, h, t, hd)
    cv5 = cache_v.reshape(n_layers * b, n, h, t, hd)
    hist3 = hist.reshape(b, n, t)
    idx = jnp.stack([jnp.asarray(pos, jnp.int32),
                     jnp.asarray(layer, jnp.int32)])
    new_spec = pl.BlockSpec((1, 1, n, hd), lambda g, hh, p: (g, hh, 0, 0))
    cache_spec = pl.BlockSpec(
        (1, n, 1, t, hd), lambda g, hh, p: (p[1] * b + g, 0, hh, 0, 0))
    hist_spec = pl.BlockSpec((1, n, t), lambda g, hh, p: (g, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, n=n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h),
            in_specs=[hist_spec, new_spec, new_spec, new_spec,
                      cache_spec, cache_spec],
            out_specs=new_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, n, hd), q.dtype),
        interpret=interpret,
    )(idx, hist3, q4, kn4, vn4, ck5, cv5)
    return out.transpose(0, 2, 1, 3).reshape(bb, h, 1, hd)
