"""Vectorized beam search — static shapes, jitted ``lax.while_loop``.

Re-implements the semantics of HF's refactored beam search as driven by the
reference (/root/reference/src/models/dicow/generation.py:815-1154):
2*num_beams candidate continuations per batch row, finished-beam pool
updated from the top-num_beams candidates, length-penalty
``score / gen_len**lp``, the early-stopping heuristic for
``early_stopping=False``, KV-cache reordering by beam index, and the CTC
rescorer state reorder (generation.py:1087-1088).

Everything lives in one while_loop with a preallocated (B, n, L) sequence
tensor — no dynamic shapes, no host round-trips inside the loop.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..models.config import DiCoWConfig
from ..models.whisper import (
    decoder_cached,
    decoder_cached_ancestry,
    init_kv_cache,
    lm_logits,
    precompute_cross_kv,
    quantize_cross_kv,
)
from ..ops.topk import topk_large
from .generation_config import GenerationConfig
from .logits_process import make_logits_processor

NEG = -1e9


class BeamOutput(NamedTuple):
    sequences: jax.Array      # (B, total_len) best finished beam
    lengths: jax.Array        # (B,)
    scores: jax.Array         # (B,) length-penalized scores (HF
    #                           sequences_scores; used directly as the
    #                           logprob-threshold value in fallback checks,
    #                           matching HF _need_fallback's beam branch)
    no_speech_probs: jax.Array  # (B,) P(no-speech token) at the begin step
    #                           (HF WhisperNoSpeechDetection: softmax of the
    #                           raw prefill logits, identical in greedy/beam)


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "max_new_tokens",
                                   "num_beams", "ctc_scorer"))
def beam_search(
    params: Dict[str, Any],
    cfg: DiCoWConfig,
    gen_cfg: GenerationConfig,
    encoder_hidden: jax.Array,     # (B, T_enc, D)
    init_tokens: jax.Array,        # (B, P)
    max_new_tokens: int,
    num_beams: int,
    ctc_scorer=None,
    ctc_state=None,
) -> BeamOutput:
    dec = params["decoder"]
    b, prompt_len = init_tokens.shape
    n = num_beams
    bb = b * n
    total_len = prompt_len + max_new_tokens
    pad = gen_cfg.pad_token_id
    eos = gen_cfg.eos_token_id
    lp = gen_cfg.length_penalty if gen_cfg.length_penalty is not None else 1.0
    vocab = cfg.vocab_size
    k2 = 2 * n  # beams_to_keep

    process = make_logits_processor(gen_cfg, begin_index=prompt_len)

    # cross-attention K/V per audio row — NOT expanded per hypothesis: the
    # n beams of a row share it via the query-fold in _cross_attention
    # (models/whisper.py), so the dominant decode-step HBM read stays at
    # audio-batch size instead of growing n-fold
    cross_kv = precompute_cross_kv(dec, cfg, encoder_hidden)
    if gen_cfg.cross_kv_quant:
        cross_kv = quantize_cross_kv(cross_kv)
    cache = init_kv_cache(cfg, bb, total_len)

    tokens = jnp.full((b, n, total_len), pad, dtype=jnp.int32)
    tokens = tokens.at[:, :, :prompt_len].set(
        init_tokens[:, None, :].astype(jnp.int32))

    # prefill all hypotheses (identical per beam)
    hidden, cache = decoder_cached(dec, cfg,
                                   tokens.reshape(bb, total_len)[:, :prompt_len],
                                   0, cache, cross_kv)
    logits0 = lm_logits(dec, hidden[:, -1]).astype(jnp.float32)
    no_speech_token = gen_cfg.no_timestamps_token_id - 1
    # logits AT the <|startoftranscript|> position (see greedy.py; HF
    # WhisperNoSpeechDetection reads begin_index - start_of_trans_offset)
    sot_logits = lm_logits(dec, hidden[:, 0]).astype(jnp.float32)
    no_speech_probs = jax.nn.softmax(
        sot_logits.reshape(b, n, vocab)[:, 0], axis=-1)[:, no_speech_token]

    running_scores = jnp.full((b, n), NEG)
    running_scores = running_scores.at[:, 0].set(0.0)
    fin_tokens = tokens
    fin_scores = jnp.full((b, n), NEG)
    fin_lengths = jnp.full((b, n), prompt_len, jnp.int32)
    is_finished = jnp.zeros((b, n), bool)

    class Carry(NamedTuple):
        tokens: jax.Array          # (B, n, L) running
        running_scores: jax.Array  # (B, n) raw sum logprobs
        fin_tokens: jax.Array
        fin_scores: jax.Array      # length-penalized
        fin_lengths: jax.Array
        is_finished: jax.Array
        cur_len: jax.Array
        cache: Dict[str, jax.Array]
        logits: jax.Array          # (Bb, V)
        ctc_state: Any
        done: jax.Array
        hist: jax.Array            # (Bb, L) group-local ancestor row per
        #                            cache position ('ancestry' impl only)

    def improvement_possible(c: Carry):
        """HF stopping semantics: with early_stopping=True a batch row stops
        as soon as num_beams hypotheses finished; with False it continues
        while a running beam could still beat the worst finished one."""
        all_full = c.is_finished.all(axis=1)
        if gen_cfg.early_stopping:
            return ~all_full
        gen_len = jnp.maximum(c.cur_len + 1 - prompt_len, 1).astype(jnp.float32)
        best_running = c.running_scores.max(axis=1) / gen_len**lp
        worst_finished = jnp.where(c.is_finished.any(axis=1),
                                   c.fin_scores.min(axis=1), NEG)
        return ~(all_full & (worst_finished >= best_running))

    def cond(c: Carry):
        return (c.cur_len < total_len) & jnp.any(improvement_possible(c)) \
            & ~c.done

    def body(c: Carry):
        flat_tokens = c.tokens.reshape(bb, total_len)
        log_probs = jax.nn.log_softmax(c.logits, axis=-1)
        log_probs = process(log_probs, flat_tokens, c.cur_len)
        ctc_state_new = c.ctc_state
        if ctc_scorer is not None:
            log_probs, ctc_state_new = ctc_scorer.rescore(
                c.ctc_state, flat_tokens, c.cur_len, log_probs)

        scores = log_probs.reshape(b, n, vocab) + c.running_scores[..., None]
        flat = scores.reshape(b, n * vocab)
        # ops/topk.py: lax.top_k by default; the exact-equivalent
        # threshold-select alternative is an A/B switch (set_topk_impl)
        top_scores, top_idx = topk_large(flat, k2)           # (B, 2n)
        src_beam = top_idx // vocab                           # (B, 2n)
        next_tok = (top_idx % vocab).astype(jnp.int32)

        is_eos = next_tok == eos

        # --- update finished pool from the top-n candidates ---
        gen_len = (c.cur_len + 1 - prompt_len).astype(jnp.float32)
        cand_fin_scores = top_scores / jnp.maximum(gen_len, 1.0)**lp
        top_n_mask = jnp.arange(k2)[None, :] < n
        eligible = is_eos & top_n_mask
        cand_fin_scores = jnp.where(eligible, cand_fin_scores, NEG)

        # merge (n finished + 2n candidates) -> keep best n
        merged_scores = jnp.concatenate([c.fin_scores, cand_fin_scores], axis=1)
        cand_seqs = jnp.take_along_axis(
            c.tokens, src_beam[..., None], axis=1)            # (B, 2n, L)
        cand_seqs = jax.vmap(
            lambda seqs, toks, t: seqs.at[:, t].set(toks),
            in_axes=(0, 0, None))(cand_seqs, next_tok, c.cur_len)
        merged_seqs = jnp.concatenate([c.fin_tokens, cand_seqs], axis=1)
        merged_lens = jnp.concatenate(
            [c.fin_lengths,
             jnp.full((b, k2), 0, jnp.int32) + c.cur_len + 1], axis=1)
        best = jax.lax.top_k(merged_scores, n)[1]             # (B, n)
        fin_scores = jnp.take_along_axis(merged_scores, best, axis=1)
        fin_tokens = jnp.take_along_axis(merged_seqs, best[..., None], axis=1)
        fin_lengths = jnp.take_along_axis(merged_lens, best, axis=1)
        is_finished = fin_scores > NEG

        # --- pick next n running beams among non-eos candidates ---
        run_scores = jnp.where(is_eos, NEG, top_scores)
        order = jax.lax.top_k(run_scores, n)[1]               # (B, n)
        new_running_scores = jnp.take_along_axis(run_scores, order, axis=1)
        chosen_beam = jnp.take_along_axis(src_beam, order, axis=1)  # (B, n)
        chosen_tok = jnp.take_along_axis(next_tok, order, axis=1)

        new_tokens = jnp.take_along_axis(
            c.tokens, chosen_beam[..., None], axis=1)
        new_tokens = jax.vmap(
            lambda seqs, toks, t: seqs.at[:, t].set(toks),
            in_axes=(0, 0, None))(new_tokens, chosen_tok, c.cur_len)

        # reorder cache + ctc state by flat beam index. The KV cache moves
        # ~100 MB/step; see ops/reorder.py for the strategy trade-offs
        # (default: the standalone Pallas block-DMA kernel on TPU)
        from ..models.whisper import get_kv_cache_layout
        from ..ops.reorder import beam_reorder, get_reorder_impl

        flat_beam_idx = (jnp.arange(b)[:, None] * n + chosen_beam).reshape(bb)
        impl = get_reorder_impl()
        fused_reorder = impl.startswith("fused")
        ancestry = impl.startswith("ancestry")
        hist = c.hist
        if ancestry:
            # append-only cache: no permute at all — the ancestry map
            # inherits the chosen ancestor's history and claims this
            # step's slot for the row itself
            cache = c.cache
            hist = hist[flat_beam_idx].at[:, c.cur_len].set(
                jnp.tile(jnp.arange(n, dtype=jnp.int32), b))
        elif fused_reorder:
            cache = c.cache
            beam_src = flat_beam_idx
            if impl == "fused_onehot":
                # block-diagonal (Bb, Bb) one-hot: rows only ever pick a
                # source within their own audio group
                beam_src = (jnp.arange(bb)[None, :] ==
                            flat_beam_idx[:, None]).astype(jnp.int8)
        else:
            layout = get_kv_cache_layout()
            cache = {k: beam_reorder(v, chosen_beam, n, flat_beam_idx,
                                     layout=layout)
                     for k, v in c.cache.items()}
        if ctc_scorer is not None:
            ctc_state_new = ctc_scorer.update_state(
                ctc_state_new, chosen_tok.reshape(bb), flat_beam_idx)

        # next decoder step
        if ancestry:
            hidden, cache = decoder_cached_ancestry(
                dec, cfg, chosen_tok.reshape(bb, 1), c.cur_len, cache,
                cross_kv, hist, n,
                attn_impl="pallas" if impl == "ancestry_pallas" else "xla")
        else:
            hidden, cache = decoder_cached(
                dec, cfg, chosen_tok.reshape(bb, 1), c.cur_len, cache,
                cross_kv, beam_src=beam_src if fused_reorder else None)
        logits = lm_logits(dec, hidden[:, -1]).astype(jnp.float32)

        return Carry(new_tokens, new_running_scores, fin_tokens, fin_scores,
                     fin_lengths, is_finished, c.cur_len + 1, cache, logits,
                     ctc_state_new, c.done, hist)

    # prefill rows are identical per group, so each row's history is its own
    # row at every position (only positions < cur_len are ever consulted)
    hist0 = jnp.tile(jnp.arange(n, dtype=jnp.int32)[:, None], (b, total_len))
    init = Carry(tokens, running_scores, fin_tokens, fin_scores, fin_lengths,
                 is_finished, jnp.asarray(prompt_len, jnp.int32), cache,
                 logits0, ctc_state, jnp.asarray(False), hist0)
    final = jax.lax.while_loop(cond, body, init)

    # if a batch row finished nothing, fall back to its best running beam
    gen_len = jnp.maximum(final.cur_len - prompt_len, 1).astype(jnp.float32)
    run_penalized = final.running_scores / gen_len**lp
    none_finished = ~final.is_finished.any(axis=1)
    best_fin = jnp.argmax(final.fin_scores, axis=1)
    best_run = jnp.argmax(run_penalized, axis=1)
    pick = jnp.where(none_finished, best_run, best_fin)
    pick_from_run = none_finished

    seq_fin = jnp.take_along_axis(final.fin_tokens,
                                  pick[:, None, None], axis=1)[:, 0]
    seq_run = jnp.take_along_axis(final.tokens,
                                  pick[:, None, None], axis=1)[:, 0]
    sequences = jnp.where(pick_from_run[:, None], seq_run, seq_fin)
    len_fin = jnp.take_along_axis(final.fin_lengths, pick[:, None], axis=1)[:, 0]
    lengths = jnp.where(pick_from_run, final.cur_len, len_fin)
    score_fin = jnp.take_along_axis(final.fin_scores, pick[:, None], axis=1)[:, 0]
    score_run = jnp.take_along_axis(run_penalized, pick[:, None], axis=1)[:, 0]
    scores = jnp.where(pick_from_run, score_run, score_fin)
    return BeamOutput(sequences, lengths, scores, no_speech_probs)
