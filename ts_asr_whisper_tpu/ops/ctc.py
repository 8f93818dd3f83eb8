"""CTC loss — log-semiring forward recursion as a ``lax.scan``, TPU-native.

Replaces the reference's cuDNN ``F.ctc_loss`` call
(/root/reference/src/models/dicow/encoder.py:108-135). Semantics matched to
torch: blank = last vocab index, ``reduction='mean'`` divides each sequence's
NLL by its target length before averaging, ``zero_infinity`` zeroes
non-finite losses.

Design: the alpha recursion runs as one scan over time with the extended
label sequence laid out on a static (2*U_max+1) axis; all batch elements are
processed together (vmap-free batched gather), so the hot inner op is a
(B, S) gather + logaddexp chain that XLA fuses into a few VPU kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)  # avoid nan from -inf - -inf
    return mx + jnp.log(jnp.exp(a - mx) + jnp.exp(b - mx))


def ctc_loss(
    logits: jax.Array,        # (B, T, V) raw logits (fp32 recommended)
    labels: jax.Array,        # (B, U) padded with pad_val
    logit_lengths: jax.Array,  # (B,)
    label_lengths: jax.Array,  # (B,)
    blank_id: int,
    reduction: str = "mean",
    zero_infinity: bool = True,
) -> jax.Array:
    """Negative log-likelihood of the CTC alignment lattice."""
    b, t_max, _ = logits.shape
    u_max = labels.shape[1]
    s_max = 2 * u_max + 1

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # extended labels z': blank, l1, blank, l2, ..., blank  (static S axis)
    labels_safe = jnp.where(labels < 0, 0, labels)
    ext = jnp.full((b, s_max), blank_id, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels_safe)

    # allow-skip mask: alpha(s-2) reachable iff z'_s != blank and z'_s != z'_{s-2}
    ext_prev2 = jnp.concatenate(
        [jnp.full((b, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1)
    can_skip = (ext != blank_id) & (ext != ext_prev2)

    s_idx = jnp.arange(s_max)[None, :]
    valid_s = s_idx < (2 * label_lengths[:, None] + 1)

    # emission scores per (t, b, s): gather label-probs along vocab
    # (B, T, S) built lazily inside the scan to keep memory at (B, S)
    alpha0 = jnp.full((b, s_max), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(log_probs[:, 0, blank_id])
    first_label = jnp.take_along_axis(
        log_probs[:, 0], ext[:, 1:2], axis=-1)[:, 0]
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, first_label, NEG_INF))

    def step(alpha, lp_t):
        # lp_t: (B, V) frame log-probs
        emit = jnp.take_along_axis(lp_t, ext, axis=-1)  # (B, S)
        shift1 = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF), alpha[:, :-1]], axis=1)
        shift2 = jnp.concatenate(
            [jnp.full((b, 2), NEG_INF), alpha[:, :-2]], axis=1)
        merged = _logaddexp(alpha, shift1)
        merged = jnp.where(can_skip, _logaddexp(merged, shift2), merged)
        new_alpha = jnp.where(valid_s, merged + emit, NEG_INF)
        return new_alpha, new_alpha

    # scan over time, collecting alpha at every t so each sequence can read
    # its own final frame (variable logit_lengths)
    _, alphas = jax.lax.scan(step, alpha0, jnp.swapaxes(log_probs[:, 1:], 0, 1))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # (T, B, S)

    final_t = jnp.clip(logit_lengths - 1, 0, t_max - 1)
    alpha_final = alphas[final_t, jnp.arange(b)]               # (B, S)

    end1 = 2 * label_lengths      # last blank
    end2 = 2 * label_lengths - 1  # last label
    a1 = jnp.take_along_axis(alpha_final, end1[:, None], axis=1)[:, 0]
    a2 = jnp.take_along_axis(
        alpha_final, jnp.clip(end2, 0)[:, None], axis=1)[:, 0]
    a2 = jnp.where(label_lengths > 0, a2, NEG_INF)
    nll = -_logaddexp(a1, a2)

    if zero_infinity:
        nll = jnp.where(nll >= -NEG_INF * 0.5, 0.0, nll)
        nll = jnp.where(jnp.isfinite(nll), nll, 0.0)

    if reduction == "none":
        return nll
    if reduction == "sum":
        return nll.sum()
    # torch 'mean': per-sequence NLL / target_length, then batch mean
    denom = jnp.maximum(label_lengths, 1)
    return (nll / denom).mean()


def ctc_loss_from_padded_labels(
    logits: jax.Array,
    labels: jax.Array,      # (B, U) with -100 padding
    blank_id: int,
    logit_lengths=None,
    reduction: str = "mean",
) -> jax.Array:
    """Convenience wrapper with the reference's conventions
    (encoder.py:114-135): full-length logits, -100-padded LEFT-ALIGNED labels."""
    b, t_max, _ = logits.shape
    if logit_lengths is None:
        logit_lengths = jnp.full((b,), t_max, dtype=jnp.int32)
    label_lengths = (labels >= 0).sum(axis=-1).astype(jnp.int32)
    return ctc_loss(logits, labels, logit_lengths, label_lengths, blank_id,
                    reduction=reduction)


def ctc_greedy_decode(logits: jax.Array, blank_id: int) -> jax.Array:
    """Collapse-repeats + remove-blank greedy decode
    (reference src/utils/decoding.py:6-12). Returns (B, T) token ids padded
    with -1, left-aligned."""
    ids = jnp.argmax(logits, axis=-1)                       # (B, T)
    prev = jnp.concatenate([jnp.full_like(ids[:, :1], -1), ids[:, :-1]], axis=1)
    keep = (ids != prev) & (ids != blank_id)
    # stable left-pack: positions of kept tokens
    order = jnp.argsort(~keep, axis=-1, stable=True)
    packed = jnp.take_along_axis(jnp.where(keep, ids, -1), order, axis=-1)
    return packed
