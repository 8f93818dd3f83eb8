"""Logits processors — fused, fully vectorized, jit/while_loop-safe.

Functional re-design of the reference's processor chain
(/root/reference/src/models/dicow/generation.py:272-312 + utils.py:5-14 and
transformers' WhisperTimeStampLogitsProcessor): one fused function applies
begin-suppress -> suppress -> timestamp rules (with the DiCoW EOS-early-exit
tweak) without any per-batch Python loops, so the whole chain compiles into a
handful of VPU ops inside the decode loop.

Token buffers are static-shape (B, L); the current length is a traced scalar.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .generation_config import GenerationConfig

NEG_INF = float(np.finfo(np.float32).min)


def _mask_tokens(scores: jax.Array, token_ids) -> jax.Array:
    ids = jnp.asarray(token_ids, dtype=jnp.int32)
    return scores.at[..., ids].set(NEG_INF)


def apply_timestamp_rules(
    scores: jax.Array,        # (B, V) fp32
    tokens: jax.Array,        # (B, L) generated buffer (incl. prompt)
    cur_len: jax.Array,       # scalar: number of valid tokens in buffer
    begin_index: int,
    gen_cfg: GenerationConfig,
    eos_scores_before: Optional[jax.Array] = None,
) -> jax.Array:
    """Whisper timestamp constraints + DiCoW EOS-early-exit
    (reference utils.py:5-14; HF WhisperTimeStampLogitsProcessor)."""
    b, v = scores.shape
    ts_begin = gen_cfg.timestamp_begin
    eos = gen_cfg.eos_token_id
    vocab_ids = jnp.arange(v)

    scores = scores.at[..., gen_cfg.no_timestamps_token_id].set(NEG_INF)

    seq_len = cur_len - begin_index
    last_tok = tokens[:, jnp.maximum(cur_len - 1, 0)]
    penult_tok = tokens[:, jnp.maximum(cur_len - 2, 0)]
    last_was_ts = (seq_len >= 1) & (last_tok >= ts_begin)
    penult_was_ts = (seq_len < 2) | (penult_tok >= ts_begin)

    is_ts_region = (vocab_ids >= ts_begin)[None, :]
    # last ts + penult ts -> must emit non-timestamp
    force_text = (last_was_ts & penult_was_ts)[:, None] & is_ts_region
    # last ts only -> cannot emit normal text (ids < eos)
    force_ts = (last_was_ts & ~penult_was_ts)[:, None] & (vocab_ids < eos)[None, :]
    scores = jnp.where(force_text | force_ts, NEG_INF, scores)

    # last emitted timestamp (timestamps are non-decreasing under these rules)
    positions = jnp.arange(tokens.shape[1])
    in_window = (positions >= begin_index) & (positions < cur_len)
    is_ts_tok = (tokens >= ts_begin) & in_window[None, :]
    any_ts = is_ts_tok.any(axis=1)
    last_ts_pos = jnp.where(is_ts_tok, positions[None, :], -1).max(axis=1)
    last_ts_val = jnp.take_along_axis(
        tokens, jnp.maximum(last_ts_pos, 0)[:, None], axis=1)[:, 0]
    ts_last = jnp.where(last_was_ts & ~penult_was_ts, last_ts_val, last_ts_val + 1)
    mono_mask = any_ts[:, None] & is_ts_region & (vocab_ids[None, :] < ts_last[:, None])
    scores = jnp.where(mono_mask, NEG_INF, scores)

    # at the very first generated position: only timestamps allowed...
    at_begin = seq_len == 0
    begin_mask = at_begin & (vocab_ids < ts_begin)[None, :]
    if gen_cfg.max_initial_timestamp_index is not None:
        last_allowed = ts_begin + gen_cfg.max_initial_timestamp_index
        begin_mask = begin_mask | (at_begin & (vocab_ids > last_allowed)[None, :])
    scores = jnp.where(begin_mask, NEG_INF, scores)

    # if total timestamp probability beats every text token, force a timestamp
    logprobs = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)
    ts_logprob = jax.nn.logsumexp(logprobs[:, ts_begin:], axis=-1)
    max_text = logprobs[:, :ts_begin].max(axis=-1)
    force = (ts_logprob > max_text)[:, None] & (vocab_ids < ts_begin)[None, :]
    scores = jnp.where(force, NEG_INF, scores)

    # EOS early-exit on silence: the DiCoW tweak restores the pre-processor
    # EOS score at the first generated position, AFTER every rule above
    # (reference utils.py:7-14 applies it on super().__call__'s output)
    if eos_scores_before is not None:
        scores = scores.at[:, eos].set(
            jnp.where(at_begin, eos_scores_before, scores[:, eos]))
    return scores


def make_logits_processor(gen_cfg: GenerationConfig, begin_index: int):
    """Build the fused processor fn(scores, tokens, cur_len) -> scores,
    mirroring the chain order begin_suppress -> suppress -> timestamps
    (generation.py:272-312)."""
    suppress = tuple(gen_cfg.suppress_tokens or ())
    begin_suppress = tuple(gen_cfg.begin_suppress_tokens or ())

    rep = gen_cfg.repetition_penalty

    def process(scores: jax.Array, tokens: jax.Array, cur_len: jax.Array):
        scores = scores.astype(jnp.float32)
        if rep is not None and rep != 1.0:
            # HF RepetitionPenaltyLogitsProcessor: every token already in
            # the sequence (prompt included) has score*p if negative else
            # score/p. Chain position matches HF generate: before the
            # suppress/timestamp processors (greedy sees raw logits, beam
            # sees post-log-softmax scores — as in HF's _sample/_beam_search)
            b, v = scores.shape
            pos = jnp.arange(tokens.shape[1])
            valid = pos[None, :] < cur_len
            ids = jnp.where(valid, tokens, v)  # out-of-range rows dropped
            present = jnp.zeros((b, v), bool).at[
                jnp.arange(b)[:, None], ids].set(True, mode="drop")
            scores = jnp.where(present,
                               jnp.where(scores < 0, scores * rep,
                                         scores / rep),
                               scores)
        if begin_suppress:
            at_begin = (cur_len == begin_index)
            masked = _mask_tokens(scores, begin_suppress)
            scores = jnp.where(at_begin, masked, scores)
        if suppress:
            scores = _mask_tokens(scores, suppress)
        if gen_cfg.return_timestamps:
            eos_before = scores[:, gen_cfg.eos_token_id]
            scores = apply_timestamp_rules(scores, tokens, cur_len,
                                           begin_index, gen_cfg, eos_before)
        return scores

    return process
