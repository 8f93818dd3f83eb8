"""Vectorized CTC prefix scoring (Watanabe Alg. 2 / Seki et al. vectorized),
re-derived for static shapes under jit.

The reference implementation (/root/reference/src/models/dicow/decoding.py:
8-163) mutates preallocated tensors with data-dependent resizing and a
Python loop ``for t in range(start.min(), T)``. Here the alpha recursion is
one ``lax.scan`` over frames with per-hypothesis masking (``decoded_len``),
and the prefix probability log(psi) is computed in closed form from the
phi/xs tensors — no dynamic shapes anywhere, so the scorer nests inside the
greedy/beam ``while_loop``.

Shapes: Bb = batch*beams hypotheses, K = candidate tokens per step,
T = CTC frames, V = vocab+1 (blank last).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

LOG_ZERO = -1e10


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mx = jnp.where(mx <= LOG_ZERO, 0.0, mx)
    return mx + jnp.log(jnp.exp(a - mx) + jnp.exp(b - mx))


def initial_ctc_state(logp: jax.Array, blank: int) -> Tuple[jax.Array, jax.Array]:
    """Initial per-hypothesis state for the empty prefix
    (reference decoding.py:36-43): r^b accumulates blank probability,
    r^n is impossible. Returns (r_prev (B, T, 2), score_prev (B,))."""
    b, t, _ = logp.shape
    r = jnp.full((b, t, 2), LOG_ZERO, dtype=jnp.float32)
    r = r.at[..., 1].set(jnp.cumsum(logp[..., blank], axis=1))
    return r, jnp.zeros((b,), jnp.float32)


def ctc_prefix_scores(
    logp: jax.Array,        # (B_audio, T, V) case-folded log-probs
    audio_idx: jax.Array,   # (Bb,) hypothesis -> audio row
    cand_ids: jax.Array,    # (Bb, K) candidate next tokens
    r_prev: jax.Array,      # (Bb, T, 2) prefix state
    decoded_len: jax.Array,  # (Bb,) #scored tokens in prefix
    last_label: jax.Array,  # (Bb,) last non-timestamp label (blank if none)
    blank: int,
    eos: int,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (log_psi (Bb, K), new_states (Bb, K, T, 2))."""
    bb, k = cand_ids.shape
    t_len = logp.shape[1]

    lp = logp[audio_idx]                                   # (Bb, T, V)
    xs = jnp.take_along_axis(
        lp, cand_ids[:, None, :].astype(jnp.int32), axis=2)  # (Bb, T, K)
    x_blank = lp[..., blank]                               # (Bb, T)

    # phi[b,t,k]: forward mass of prefix g usable before emitting c at t+1;
    # when c == last label, only the blank-ending path counts
    r_sum = _logaddexp(r_prev[..., 0], r_prev[..., 1])     # (Bb, T)
    label_match = (cand_ids == last_label[:, None]) & (decoded_len > 0)[:, None]
    phi = jnp.where(label_match[:, None, :], r_prev[..., 1:2],
                    r_sum[..., None])                      # (Bb, T, K)

    # --- closed-form log(psi) ---
    # init term: xs[0] if this is the first scored token else impossible
    init_term = jnp.where((decoded_len == 0)[:, None], xs[:, 0], LOG_ZERO)
    t_idx = jnp.arange(1, t_len)
    mask_t = t_idx[None, :] >= decoded_len[:, None]        # (Bb, T-1)
    summand = jnp.where(mask_t[..., None], phi[:, :-1] + xs[:, 1:], LOG_ZERO)
    log_psi = _logaddexp(init_term,
                         jax.nn.logsumexp(summand, axis=1))  # (Bb, K)

    # --- alpha recursion for the new states (scan over frames) ---
    r_n0 = jnp.where((decoded_len == 0)[:, None], xs[:, 0], LOG_ZERO)
    r_b0 = jnp.full((bb, k), LOG_ZERO)
    valid0 = (decoded_len <= 0)[:, None]
    r_n0 = jnp.where(valid0, r_n0, LOG_ZERO)

    def step(carry, inputs):
        r_n, r_b = carry
        t, xs_t, xb_t, phi_tm1 = inputs
        new_n = _logaddexp(r_n, phi_tm1) + xs_t
        new_b = _logaddexp(r_n, r_b) + xb_t[:, None]
        valid = (decoded_len <= t)[:, None]
        new_n = jnp.where(valid, new_n, LOG_ZERO)
        new_b = jnp.where(valid, new_b, LOG_ZERO)
        return (new_n, new_b), (new_n, new_b)

    ts = jnp.arange(1, t_len)
    (_, _), (rs_n, rs_b) = jax.lax.scan(
        step, (r_n0, r_b0),
        (ts, jnp.swapaxes(xs[:, 1:], 0, 1),
         jnp.swapaxes(x_blank[:, 1:], 0, 1),
         jnp.swapaxes(phi[:, :-1], 0, 1)))
    # assemble (Bb, K, T, 2)
    r_n_all = jnp.concatenate([r_n0[None], rs_n], axis=0)  # (T, Bb, K)
    r_b_all = jnp.concatenate([r_b0[None], rs_b], axis=0)
    new_states = jnp.stack([r_n_all, r_b_all], axis=-1)     # (T, Bb, K, 2)
    new_states = jnp.moveaxis(new_states, 0, 2)             # (Bb, K, T, 2)

    # eos candidates score the full-prefix probability; blank is impossible
    log_psi = jnp.where(cand_ids == eos, r_sum[:, -1][:, None], log_psi)
    if eos != blank:
        log_psi = jnp.where(cand_ids == blank, LOG_ZERO, log_psi)
    return log_psi, new_states
