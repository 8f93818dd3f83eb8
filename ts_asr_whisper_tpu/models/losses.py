"""Training losses: timestamp-smoothed case-invariant decoder CE + joint CTC.

Reimplements /root/reference/src/models/dicow/modeling_dicow.py:23-144
(SoftLabelCreator) and :305-338 (joint loss) as fused, static-shape JAX:

- the Gaussian timestamp-smoothing matrix is a precomputed (1501, 1501)
  device-resident constant; timestamp rows of the soft-target CE reduce to a
  single (..., 1501) dot with the matrix row — no vocab-size one-hots are
  ever materialized;
- case-invariance is min(loss_lower, loss_upper) per token
  (modeling_dicow.py:141);
- CTC label preparation (prefix strip, eos -> pad, optional timestamp
  removal with re-packing, encoder.py:111-113 + modeling_dicow.py:329-333)
  is a static-shape masked left-pack.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ctc import ctc_loss_from_padded_labels
from .config import DiCoWConfig

TIMESTAMP_SIGMA = 0.08  # modeling_dicow.py:28
NUM_TIMESTAMPS = 30 * 50 + 1  # <|0.00|> .. <|30.00|>


@lru_cache(maxsize=2)
def timestamp_smoothing_matrix(sigma: float = TIMESTAMP_SIGMA) -> np.ndarray:
    """(1501, 1501) row-normalized Gaussian over timestamp *times*
    (modeling_dicow.py:35-72). Timestamp token ids are the contiguous block
    [timestamp_begin, vocab)."""
    times = 0.02 * np.arange(NUM_TIMESTAMPS, dtype=np.float64)
    diff_sq = (times[:, None] - times[None, :]) ** 2
    w = np.exp(-diff_sq / (2 * sigma**2))
    w /= w.sum(axis=1, keepdims=True)
    return w.astype(np.float32)


def soft_ce_token_loss(
    log_probs: jax.Array,   # (..., V) fp32 log-softmax
    labels: jax.Array,      # (...,) int, -100 = pad
    timestamp_begin: int,
    ts_matrix: jax.Array,   # (1501, 1501)
) -> jax.Array:
    """Per-token CE against (timestamp-smoothed) soft targets."""
    safe = jnp.clip(labels, 0)
    hard = -jnp.take_along_axis(log_probs, safe[..., None], axis=-1)[..., 0]
    is_ts = labels >= timestamp_begin
    ts_idx = jnp.clip(labels - timestamp_begin, 0, NUM_TIMESTAMPS - 1)
    weights = ts_matrix[ts_idx]                       # (..., 1501)
    soft = -(weights * log_probs[..., timestamp_begin:]).sum(axis=-1)
    return jnp.where(is_ts, soft, hard)


def decoder_ce_loss(
    logits: jax.Array,       # (B, T, V)
    labels: jax.Array,       # (B, T) with -100 pad
    upp_labels: Optional[jax.Array],
    cfg: DiCoWConfig,
    use_timestamp_smoothing: bool = True,
) -> jax.Array:
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tb = cfg.timestamp_begin
    if use_timestamp_smoothing:
        ts = jnp.asarray(timestamp_smoothing_matrix())
        loss_lower = soft_ce_token_loss(log_probs, labels, tb, ts)
    else:
        safe = jnp.clip(labels, 0)
        loss_lower = -jnp.take_along_axis(log_probs, safe[..., None], -1)[..., 0]
    if upp_labels is not None:
        if use_timestamp_smoothing:
            loss_upper = soft_ce_token_loss(log_probs, upp_labels, tb, ts)
        else:
            safe = jnp.clip(upp_labels, 0)
            loss_upper = -jnp.take_along_axis(log_probs, safe[..., None], -1)[..., 0]
        tok = jnp.minimum(loss_lower, loss_upper)
    else:
        tok = loss_lower
    mask = (labels != -100).astype(jnp.float32)
    return (tok * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def left_pack(values: jax.Array, keep: jax.Array, fill: int) -> jax.Array:
    """Stable left-pack of kept entries along the last axis (static shape)."""
    order = jnp.argsort(~keep, axis=-1, stable=True)
    return jnp.take_along_axis(jnp.where(keep, values, fill), order, axis=-1)


def prepare_ctc_labels(
    labels: jax.Array,   # (B, T) decoder labels, -100 pad
    cfg: DiCoWConfig,
    num_prefix_tokens: int,
) -> jax.Array:
    """Decoder labels -> CTC labels. ``num_prefix_tokens`` is the number of
    leading label columns occupied by tokenizer prefix tokens (computed
    host-side; the reference strips them dynamically,
    modeling_dicow.py:330-332). EOS is mapped to pad, and with
    ``remove_timestamps_from_ctc`` all timestamp/task tokens are removed and
    the rest re-packed left (encoder.py:111-113)."""
    if num_prefix_tokens > 0:
        labels = labels[:, num_prefix_tokens:]
    keep = labels >= 0
    keep &= labels != cfg.eos_token_id
    if cfg.remove_timestamps_from_ctc:
        keep &= labels < cfg.first_task_token
    return left_pack(labels, keep, -100)


def dicow_loss(
    dec_logits: jax.Array,
    enc_ctc_logits: Optional[jax.Array],
    labels: jax.Array,
    upp_labels: Optional[jax.Array],
    cfg: DiCoWConfig,
    num_prefix_tokens: int = 0,
    use_timestamp_smoothing: bool = True,
):
    """Joint loss (modeling_dicow.py:305-338):
    (1 - w) * CE + w * CTC. Returns (total, dict of parts)."""
    dec_loss = decoder_ce_loss(dec_logits, labels, upp_labels, cfg,
                               use_timestamp_smoothing)
    parts = {"dec_loss": dec_loss}
    if cfg.ctc_weight > 0.0 and enc_ctc_logits is not None:
        ctc_labels = prepare_ctc_labels(labels, cfg, num_prefix_tokens)
        ctc = ctc_loss_from_padded_labels(
            enc_ctc_logits, ctc_labels, blank_id=cfg.ctc_vocab_size - 1,
            reduction=cfg.ctc_loss_reduction)
        parts["ctc_loss"] = ctc
        total = (1.0 - cfg.ctc_weight) * dec_loss + cfg.ctc_weight * ctc
    else:
        total = dec_loss
    parts["loss"] = total
    return total, parts
