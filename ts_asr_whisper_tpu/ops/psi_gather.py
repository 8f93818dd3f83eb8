"""Candidate-restricted CTC psi: pure-DMA Pallas row gather + compact dot.

The beam-mode joint-CTC rescorer needs log(psi) only for the ~500
top-by-attention candidate tokens per hypothesis (the reference scores
exactly that set, /root/reference/src/models/dicow/decoding.py:309-313),
yet the full-vocab formulation (ops/ctc_prefix.py::ctc_psi_matmul) reads
the whole (B, T, V) posterior every decode step — 1.24 GB bf16, 1.68 ms at
HBM roofline on v5e, the single largest op of the beam step (r04 trace).

This module computes the SAME closed-form psi (shared weights from
ops/ctc_prefix.py::psi_weights) restricted to the candidate set:

1. ``extract_topk_ids``  — candidate ids from the membership mask via a
   two-level cumulative-count search (0.47 ms; a sort-free positional
   decode of exactly the mask's set bits, in index order).
2. ``gather_rows``       — a Pallas kernel that DMAs each candidate's
   posterior T-row HBM->HBM into a compact (Bb, K, 8, T8) tensor. No
   vector compute at all: the scalar core issues one copy descriptor per
   (hypothesis, candidate). Measured 51.9 rows/us issue rate — 0.39 ms for
   the 20,480 rows of the beam-5 batch-8 envelope, where XLA's gather
   lowering takes 5.04 ms (probed r05, scripts/probe_psi_gather.py).
3. a compact einsum      — (Bb, K, 8, T8) x (Bb, 8, T8) -> (Bb, K) psi
   partial sums in fp32 (0.11 ms), then the shared log/shift/last-label
   correction and a dense scatter back over the vocab.

Total ~1.1 ms vs 1.68 ms for the matmul, in EXACT math (the matmul's
effective read precision is already bf16 — XLA hoists a bf16 convert of
the fp32 posterior out of the decode loop, docs/PERFORMANCE.md — so a
bf16-stored folded posterior with fp32 accumulation matches it).

Layout: DMA slices need 8x128-aligned trailing dims ("Slice shape along
dimension 3 must be aligned to tiling (128)", probed r05), so the time
axis folds to (8, ceil(T/1024)*128) — T=1500 pads to 2048. The +36% pad
bytes still total ~20x less traffic than the full-vocab read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ctc_prefix import LOG_ZERO, psi_match_scores, psi_weights

S = 8  # sublane fold of the time axis


def folded_len(t: int) -> int:
    """Padded time length whose (S, t8) fold satisfies DMA tiling."""
    return -(-t // (S * 128)) * S * 128


def fold_posterior(p_vt: jax.Array, dtype=None) -> jax.Array:
    """(B, V, T) posterior -> (B, V, S, Tp/S) time-folded copy (zero pad:
    padded frames contribute exp-domain zeros to the psi dot)."""
    b, v, t = p_vt.shape
    tp = folded_len(t)
    p = jnp.pad(p_vt, ((0, 0), (0, 0), (0, tp - t)))
    p = p.reshape(b, v, S, tp // S)
    return p.astype(dtype) if dtype is not None else p


def fold_weights(w: jax.Array, t8: int) -> jax.Array:
    """(Bb, T) psi weights -> (Bb, S, t8) matching fold_posterior."""
    bb, t = w.shape
    return jnp.pad(w, ((0, 0), (0, S * t8 - t))).reshape(bb, S, t8)


def extract_topk_ids(mask: jax.Array, k_pad: int,
                     block: int = 512) -> jax.Array:
    """ids[b, j] = index of the (j+1)-th set bit of mask[b] in ascending
    order, clamped to V-1 for j >= popcount (pad slots then duplicate a
    real row; duplicate scatter writes carry identical values so the
    result is unaffected). Two-level search: coarse pass over per-block
    cumulative counts, then one gathered 512-wide local-cumsum block per
    query — no sort, no serial dependence."""
    bb, v = mask.shape
    nb = (v + block - 1) // block
    pad = nb * block - v
    m = jnp.pad(mask, ((0, 0), (0, pad))).astype(jnp.int32)
    local = jnp.cumsum(m.reshape(bb, nb, block), axis=2)    # (Bb, nb, blk)
    coarse = jnp.cumsum(local[:, :, -1], axis=1)            # (Bb, nb)
    targets = jnp.arange(1, k_pad + 1, dtype=jnp.int32)     # (K,)
    # first block whose cumulative count reaches the target
    blk_idx = (coarse[:, :, None] < targets[None, None, :]) \
        .sum(axis=1).astype(jnp.int32)                      # (Bb, K)
    blk_idx = jnp.minimum(blk_idx, nb - 1)
    base = jnp.where(
        blk_idx > 0,
        jnp.take_along_axis(coarse, jnp.maximum(blk_idx - 1, 0), axis=1),
        0)
    rows = jnp.take_along_axis(local, blk_idx[:, :, None], axis=1)
    local_t = (targets[None, :] - base)[:, :, None]         # (Bb, K, 1)
    off = (rows < local_t).sum(axis=2).astype(jnp.int32)    # (Bb, K)
    return jnp.minimum(blk_idx * block + off, v - 1).astype(jnp.int32)


def _gather_rows_kernel(cand_ref, aidx_ref, p_hbm, out_hbm, sem):
    """One grid step per hypothesis: issue all K candidate-row copies
    (HBM->HBM, fully async), then drain the semaphore."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    a = aidx_ref[b]
    k = cand_ref.shape[1]

    def issue(j, _):
        pltpu.make_async_copy(
            p_hbm.at[a, cand_ref[b, j]], out_hbm.at[b, j], sem).start()
        return 0

    jax.lax.fori_loop(0, k, issue, 0)

    def drain(j, _):
        pltpu.make_async_copy(
            p_hbm.at[a, cand_ref[b, j]], out_hbm.at[b, j], sem).wait()
        return 0

    jax.lax.fori_loop(0, k, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(cand: jax.Array, audio_idx: jax.Array, p4: jax.Array,
                interpret: bool = False) -> jax.Array:
    """(Bb, K, S, T8) compacted candidate rows of the folded posterior.
    Everything stays in HBM end to end; the kernel is pure DMA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bb, k = cand.shape
    s, t8 = p4.shape[-2:]
    return pl.pallas_call(
        _gather_rows_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((bb, k, s, t8), p4.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(cand.astype(jnp.int32), audio_idx.astype(jnp.int32), p4)


def ctc_psi_candidates(
    p4: jax.Array,           # (B_audio, V, S, T8) folded posterior
    cand_mask: jax.Array,    # (Bb, V_dec) candidate membership (exactly k
    #                          set bits; V_dec = V - 1, blank excluded)
    audio_idx: jax.Array,    # (Bb,)
    x_last: jax.Array,       # (Bb, T) log-probs of each hyp's last label
    r_prev: jax.Array,       # (Bb, T, 2)
    decoded_len: jax.Array,  # (Bb,)
    last_label: jax.Array,   # (Bb,)
    eos: int,
    k_pad: int,
    interpret: bool = False,
) -> jax.Array:
    """log(psi) scattered over (Bb, V_dec): candidate columns carry the
    exact closed form, everything else LOG_ZERO — the same tensor
    ``where(cand_mask, ctc_psi_matmul(...)[:, :v_dec], LOG_ZERO)``
    produces, at ~20x less HBM traffic. eos takes the full-prefix
    probability exactly as in the matmul path."""
    bb, v_dec = cand_mask.shape
    t8 = p4.shape[-1]

    ids = extract_topk_ids(cand_mask, k_pad)                # (Bb, K)
    rows = gather_rows(ids, audio_idx, p4, interpret=interpret)

    w, m, r_sum = psi_weights(r_prev, decoded_len)
    w4 = fold_weights(w, t8)                                # (Bb, S, T8)
    vals = jnp.einsum("bkst,bst->bk", rows, w4.astype(rows.dtype),
                      preferred_element_type=jnp.float32)
    psi_c = jnp.log(jnp.maximum(vals, 1e-38)) + m[:, None]  # (Bb, K)

    # last-label candidates may only extend blank-ending paths
    psi_match = psi_match_scores(r_prev, x_last, decoded_len)
    is_match = (ids == last_label[:, None]) & (decoded_len > 0)[:, None]
    psi_c = jnp.where(is_match, psi_match[:, None], psi_c)

    tmp = jnp.full((bb, v_dec), LOG_ZERO, jnp.float32)
    tmp = jax.vmap(lambda row, i, x: row.at[i].set(x))(tmp, ids, psi_c)
    tmp = jnp.where(cand_mask, tmp, LOG_ZERO)
    return tmp.at[:, eos].set(r_sum[:, -1])
