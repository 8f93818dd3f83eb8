"""Greedy KV-cached decode — one jitted ``lax.while_loop`` per 30 s window.

TPU-first replacement for the reference's per-token Python loop
(/root/reference/src/models/dicow/generation.py:614-810): static shapes, a
preallocated token buffer, early exit when every sequence has emitted EOS,
cross-attention K/V computed once, and the fused logits-processor chain from
logits_process.py. Optionally a CTC rescorer hook (joint decoding) runs
inside the same loop.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.config import DiCoWConfig
from ..models.whisper import (
    decoder_cached,
    init_kv_cache,
    lm_logits,
    precompute_cross_kv,
    quantize_cross_kv,
)
from .generation_config import GenerationConfig
from .logits_process import make_logits_processor


class GreedyOutput(NamedTuple):
    sequences: jax.Array       # (B, total_len) pad-filled
    lengths: jax.Array         # (B,) valid token count incl. prompt
    sum_logprobs: jax.Array    # (B,) sum of selected-token logprobs
    no_speech_probs: jax.Array  # (B,) P(no-speech token) at the begin step
    # token-timestamp mode only: cross-attention probabilities of the
    # alignment heads per generated-token query, (B, S, max_new, T_enc);
    # row j = query position prompt_len + j (HF drops the prompt rows and
    # the final row before DTW — decoding/token_timestamps.py)
    alignment_weights: Optional[jax.Array] = None


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "max_new_tokens",
                                   "ctc_scorer", "force_full_length",
                                   "temperature"))
def greedy_decode(
    params: Dict[str, Any],
    cfg: DiCoWConfig,
    gen_cfg: GenerationConfig,
    encoder_hidden: jax.Array,    # (B, T_enc, D)
    init_tokens: jax.Array,       # (B, P) prompt incl. decoder_start
    max_new_tokens: int,
    ctc_scorer=None,              # optional: see decoding/ctc_rescorer.py
    ctc_state=None,
    force_full_length: bool = False,  # benchmarking: ignore EOS early exit
    temperature: float = 0.0,     # >0: multinomial sampling (fallback retries)
    rng_key: jax.Array | None = None,
    alignment_slots: jax.Array | None = None,  # (L, S, H) token-ts heads
) -> GreedyOutput:
    dec = params["decoder"]
    b, prompt_len = init_tokens.shape
    total_len = prompt_len + max_new_tokens
    pad = gen_cfg.pad_token_id
    eos = gen_cfg.eos_token_id
    no_speech_token = gen_cfg.no_timestamps_token_id - 1

    process = make_logits_processor(gen_cfg, begin_index=prompt_len)

    cross_kv = precompute_cross_kv(dec, cfg, encoder_hidden)
    if gen_cfg.cross_kv_quant:
        cross_kv = quantize_cross_kv(cross_kv)
    cache = init_kv_cache(cfg, b, total_len)

    tokens = jnp.full((b, total_len), pad, dtype=jnp.int32)
    tokens = tokens.at[:, :prompt_len].set(init_tokens.astype(jnp.int32))

    # prefill the prompt
    hidden, cache = decoder_cached(dec, cfg, tokens[:, :prompt_len], 0,
                                   cache, cross_kv)
    logits0 = lm_logits(dec, hidden[:, -1]).astype(jnp.float32)  # (B, V)
    # no-speech prob comes from the logits AT the <|startoftranscript|>
    # position (index 0 of the prefill) — where Whisper places <|nospeech|>
    # mass — not the last prompt position (HF WhisperNoSpeechDetection:
    # logits[:, begin_index - start_of_trans_offset])
    sot_logits = lm_logits(dec, hidden[:, 0]).astype(jnp.float32)
    no_speech_probs = jax.nn.softmax(sot_logits, axis=-1)[:, no_speech_token]

    class Carry(NamedTuple):
        tokens: jax.Array
        cur_len: jax.Array
        finished: jax.Array
        cache: Dict[str, jax.Array]
        logits: jax.Array
        sum_logprobs: jax.Array
        ctc_state: Any
        rng: jax.Array
        align_buf: Any = None

    def cond(c: Carry):
        if force_full_length:
            return c.cur_len < total_len
        return (c.cur_len < total_len) & ~jnp.all(c.finished)

    def body(c: Carry):
        scores = process(c.logits, c.tokens, c.cur_len)
        ctc_state_new = c.ctc_state
        if ctc_scorer is not None:
            scores = jax.nn.log_softmax(scores, axis=-1)
            scores, ctc_state_new = ctc_scorer.rescore(
                c.ctc_state, c.tokens, c.cur_len, scores)
        rng = c.rng
        if temperature > 0.0:
            rng, sub = jax.random.split(rng)
            next_tok = jax.random.categorical(
                sub, scores / temperature, axis=-1).astype(jnp.int32)
        else:
            next_tok = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(c.finished, pad, next_tok)
        logp = jax.nn.log_softmax(scores, axis=-1)
        tok_logp = jnp.take_along_axis(logp, next_tok[:, None], axis=1)[:, 0]
        sum_logprobs = c.sum_logprobs + jnp.where(c.finished, 0.0, tok_logp)
        if ctc_scorer is not None:
            ctc_state_new = ctc_scorer.update_state(
                ctc_state_new, next_tok, jnp.arange(b))
        tokens = jax.lax.dynamic_update_slice(
            c.tokens, next_tok[:, None], (0, c.cur_len))
        finished = c.finished | (next_tok == eos)
        align_buf = c.align_buf
        if alignment_slots is None:
            hidden, cache = decoder_cached(dec, cfg, next_tok[:, None],
                                           c.cur_len, c.cache, cross_kv)
        else:
            hidden, cache, probs = decoder_cached(
                dec, cfg, next_tok[:, None], c.cur_len, c.cache, cross_kv,
                alignment_slots=alignment_slots)
            # probs: (B, S, 1, T_enc) — the query row for position cur_len
            # (generated-token index cur_len - prompt_len)
            align_buf = jax.lax.dynamic_update_slice(
                align_buf, probs.astype(jnp.float32),
                (0, 0, c.cur_len - prompt_len, 0))
        logits = lm_logits(dec, hidden[:, -1]).astype(jnp.float32)
        return Carry(tokens, c.cur_len + 1, finished, cache, logits,
                     sum_logprobs, ctc_state_new, rng, align_buf)

    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    align0 = None
    if alignment_slots is not None:
        n_slots = alignment_slots.shape[1]
        t_enc = encoder_hidden.shape[1]
        align0 = jnp.zeros((b, n_slots, max_new_tokens, t_enc), jnp.float32)
    init = Carry(tokens, jnp.asarray(prompt_len, jnp.int32),
                 jnp.zeros((b,), bool), cache, logits0,
                 jnp.zeros((b,), jnp.float32), ctc_state, rng_key, align0)
    final = jax.lax.while_loop(cond, body, init)

    # valid length = prompt + tokens up to and including first EOS
    positions = jnp.arange(total_len)
    is_eos = (final.tokens == eos) & (positions[None, :] >= prompt_len)
    first_eos = jnp.where(is_eos.any(1), jnp.argmax(is_eos, 1), final.cur_len - 1)
    lengths = jnp.minimum(first_eos + 1, final.cur_len)
    return GreedyOutput(final.tokens, lengths, final.sum_logprobs,
                        no_speech_probs, final.align_buf)
