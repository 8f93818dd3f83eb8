"""Joint CTC rescoring inside the decode loop.

Functional re-design of the reference CTCRescorerLogitsProcessor
(/root/reference/src/models/dicow/decoding.py:166-338): per step, the top-K
attention candidates (+EOS) get CTC prefix scores; fused score =
(1-w)*attention + w*(psi - psi_prev); timestamp tokens are "transparent"
(they take the row-max CTC score and do not advance the CTC state).

Prefix bookkeeping (decoded_len, last label) is recomputed from the token
buffer each step with the reference's EXACT semantics — including its
positional gather for the "last non-timestamp token" (decoding.py:298-302),
which with interleaved timestamps picks the token at index
(#text_tokens - 1) of the transformed sequence rather than the true last
text token; we reproduce it bit-for-bit for decode parity.

The scorer object is a hashable static config; all mutable state (case-folded
encoder log-probs, per-hypothesis prefix states, candidate slots) lives in a
CTCState pytree threaded through the jitted loop. Encoder log-probs are
stored once per AUDIO row and indexed by hypothesis (beams share them) —
unlike the reference's repeat_interleave copy (generation.py:254).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ctc_prefix import (
    LOG_ZERO,
    ctc_prefix_scores,
    ctc_psi_matmul,
    initial_ctc_state,
)


class CTCState(NamedTuple):
    logp_vt: jax.Array            # (B_audio, V, T) case-folded log-probs,
    #                               vocab-major: single-token column reads
    #                               (update_state, last-label fixup) are
    #                               contiguous T-rows
    p_tv: Optional[jax.Array]     # (B_audio, T, V) probabilities, time-major
    #                               for the beam-shared psi matmul
    #                               (n>1 + psi_impl 'matmul' only)
    p4: Optional[jax.Array]       # (B_audio, V, S, T8) time-folded
    #                               probabilities for the candidate-
    #                               restricted DMA-gather psi
    #                               (n>1 + psi_impl 'gather' only)
    audio_idx: jax.Array     # (Bb,) hypothesis -> audio row
    r_prev: jax.Array        # (Bb, T, 2)
    score_prev: jax.Array    # (Bb,)
    cand_ids: jax.Array      # (Bb, K) last step's scored candidates
    decoded_len: jax.Array   # (Bb,) prefix stats captured at rescore time
    last_label: jax.Array    # (Bb,)


def resolve_psi_impl(impl: str) -> str:
    """Beam-mode psi strategy: 'auto' (default) picks the candidate-
    restricted DMA-gather path on TPU — exact math at ~1.1 ms/step vs the
    full-vocab matmul's 1.68 (r05 probe + A/B, docs/PERFORMANCE.md) — and
    the matmul elsewhere (the gather kernel would run interpreted).
    Resolved from ``jax.default_backend()`` at trace time; per-call device
    overrides need the explicit setting, as with ops/reorder.py."""
    if impl == "auto":
        return "gather" if jax.default_backend() == "tpu" else "matmul"
    assert impl in ("matmul", "gather"), impl
    return impl


def init_ctc_state(enc_logits: jax.Array, blank: int,
                   upper_to_lower: Optional[np.ndarray] = None,
                   num_beams: int = 1, k: int = 500,
                   p_bf16: bool = False,
                   psi_impl: str = "auto") -> CTCState:
    """enc_logits: (B_audio, T, V) raw CTC-head logits.
    upper_to_lower: (2, n_pairs) [upper_ids; lower_ids] — upper-case token
    columns take their lower-case column's probability
    (decoding.py:183-186).

    Layout depends on the decode mode: beams (num_beams > 1) share one
    audio row's CTC posterior, so psi is computed for the whole vocab with
    one MXU matmul over time-major probabilities (ops/ctc_prefix.py::
    ctc_psi_matmul); single-hypothesis decode keeps vocab-major log-probs
    and gathers the K candidates' rows.

    HBM cost (beam mode): ``p_tv`` is a second full (B_audio, T, V)
    tensor on top of ``logp_vt`` — at batch 8 / T=1500 / V=51866
    (large-v3-turbo) each is ~2.5 GB fp32, so joint-CTC beam decoding
    roughly doubles the rescorer's footprint vs greedy. ``p_bf16=True``
    (GenerationConfig.ctc_p_bf16) halves the ``p_tv`` share: the psi
    matmul accumulates in fp32 regardless (ops/ctc_prefix.py:118), but
    token selection may differ from fp32 on near-ties, so it is off by
    default for parity-exact decoding."""
    logp = jax.nn.log_softmax(enc_logits.astype(jnp.float32), axis=-1)
    if upper_to_lower is not None and np.asarray(upper_to_lower).size:
        upper = jnp.asarray(upper_to_lower[0])
        lower = jnp.asarray(upper_to_lower[1])
        logp = logp.at[..., upper].set(logp[..., lower])
    b_audio, t_len, _ = logp.shape
    bb = b_audio * num_beams
    audio_idx = jnp.arange(bb) // num_beams
    r0, s0 = initial_ctc_state(logp, blank)
    v_dec = logp.shape[-1] - 1  # decoder vocab (ctc vocab minus blank)
    logp_vt = jnp.swapaxes(logp, 1, 2)
    impl = resolve_psi_impl(psi_impl) if num_beams > 1 else "matmul"
    p_tv = p4 = None
    if num_beams > 1:
        if impl == "gather":
            from ..ops.psi_gather import fold_posterior

            # bf16 storage on TPU matches the matmul path's EFFECTIVE read
            # precision (XLA hoists a bf16 convert of the fp32 posterior
            # out of the decode loop — default matmul precision), at half
            # the capacity; interpret-mode runs (tests) keep fp32 so CPU
            # results match the fp32 matmul bit-for-bit up to accumulation
            # order
            dtype = (jnp.bfloat16 if p_bf16
                     or jax.default_backend() == "tpu" else jnp.float32)
            p4 = fold_posterior(jnp.exp(logp_vt), dtype=dtype)
        else:
            p_tv = (jnp.exp(logp).astype(jnp.bfloat16) if p_bf16
                    else jnp.exp(logp))
    return CTCState(
        logp_vt=logp_vt,
        p_tv=p_tv,
        p4=p4,
        audio_idx=audio_idx,
        r_prev=r0[audio_idx],
        score_prev=jnp.zeros((bb,), jnp.float32),
        # beam mode stores candidates as a vocab membership mask (filled by
        # the thresholded rescore); n=1 keeps the top-K id list
        cand_ids=(jnp.zeros((bb, v_dec), bool) if num_beams > 1
                  else jnp.zeros((bb, k), jnp.int32)),
        decoded_len=jnp.zeros((bb,), jnp.int32),
        last_label=jnp.full((bb,), blank, jnp.int32),
    )


# host-side token decoder for the joint-decode debug dump; None prints ids
_DEBUG_DECODER = None


def set_joint_debug_decoder(decode_fn) -> None:
    """Register ``decode_fn(ids) -> str`` (e.g. tokenizer.decode) so the
    debug dump prints token text instead of raw ids."""
    global _DEBUG_DECODER
    _DEBUG_DECODER = decode_fn


def _debug_print(step_tokens, cur_len, att_v, att_i, ctc_v, ctc_i,
                 fused_v, fused_i, ctc_eos):
    """Host callback: the reference's ``analyze_predictions`` table
    (decoding.py:214-266) — per hypothesis, the top-k candidates by
    attention, CTC and fused score, plus the running prefix and the CTC
    EOS score."""
    def tok_str(i):
        if _DEBUG_DECODER is None:
            return str(int(i))
        try:
            return repr(_DEBUG_DECODER([int(i)]))
        except Exception:
            return str(int(i))

    print("\n" + "#" * 100)
    for b in range(att_i.shape[0]):
        print("-" * 80)
        print(f"HYPOTHESIS {b}")
        prefix = [int(t) for t in step_tokens[b][: int(cur_len)]]
        if _DEBUG_DECODER is not None:
            try:
                prefix = _DEBUG_DECODER(prefix)
            except Exception:
                pass
        print(f"\nPREFIX:\n{prefix}")
        for title, ids, vals in (("ATT_TOKENS", att_i[b], att_v[b]),
                                 ("CTC_TOKENS", ctc_i[b], ctc_v[b]),
                                 ("NEXT_TOKENS", fused_i[b], fused_v[b])):
            cells = [f"{tok_str(i)}:{float(v):.2f}"
                     for i, v in zip(ids, vals)]
            print(f"\n{title}: " + " | ".join(cells))
        print(f"\nCTC_EOS: {float(ctc_eos[b]):.2f}\n")
    print("#" * 100, flush=True)


@dataclass(frozen=True)
class CTCRescorer:
    """Static config for joint CTC rescoring (hashable jit argument)."""

    blank_id: int
    eos_id: int
    timestamp_begin: int     # vocab id of <|0.00|>
    ctc_weight: float
    k: int = 500
    prefix_len: int = 3      # len(tokenizer.prefix_tokens)
    # per-step top-k att/CTC/fused dump via jax.debug.callback (reference
    # analyze_predictions, decoding.py:214-266); zero cost when False
    debug: bool = False

    def _prefix_stats(self, tokens: jax.Array, cur_len: jax.Array):
        """Reference prefix transformations (decoding.py:277-302), computed
        with masks over the static buffer. The transformed sequence is
        tokens[:, strip:cur_len] with element 0 set to blank."""
        strip = self.prefix_len - 1 if self.prefix_len > 1 else 0
        bb, buf_len = tokens.shape
        pos = jnp.arange(buf_len)
        in_seq = (pos >= strip) & (pos < cur_len)
        vals = jnp.where(pos[None, :] == strip, self.blank_id, tokens)
        is_text_or_blank = ((vals < self.timestamp_begin)
                            | (vals == self.blank_id)) & in_seq[None, :]
        decoded_len = (((vals <= self.timestamp_begin)
                        & (vals != self.blank_id)) & in_seq[None, :]) \
            .sum(axis=1).astype(jnp.int32)
        last_raw = vals[:, jnp.maximum(cur_len - 1, 0)]  # cur_len is scalar
        last_is_ts = (last_raw >= self.timestamp_begin) \
            & (last_raw != self.blank_id)
        gather_idx = strip + is_text_or_blank.sum(axis=1) - 1
        gathered = jnp.take_along_axis(vals, gather_idx[:, None], axis=1)[:, 0]
        gathered = jnp.where(gather_idx == strip, self.blank_id, gathered)
        last = jnp.where(last_is_ts, gathered, last_raw).astype(jnp.int32)
        return decoded_len, last

    def rescore(self, state: CTCState, tokens: jax.Array, cur_len: jax.Array,
                scores: jax.Array) -> Tuple[jax.Array, CTCState]:
        """scores: (Bb, V_dec) attention log-probs AFTER processors.
        Returns (fused scores, state with candidate slots filled)."""
        bb, v_dec = scores.shape
        decoded_len, last_label = self._prefix_stats(tokens, cur_len)

        if state.p_tv is not None or state.p4 is not None:
            # beam mode: psi for the whole vocab in one beam-shared matmul,
            # restricted to the top-K-by-attention candidate set the
            # reference scores (decoding.py:309-313). Membership comes from
            # an exact bit-level threshold search instead of a top-k sort
            # (kth_largest_keys; XLA's top-k full sort was the single
            # largest op of the beam step); EOS is always a candidate. The
            # last-label column comes from the vocab-major copy where it is
            # a contiguous T-row.
            from ..ops.ctc_prefix import kth_largest_keys

            keys, kth = kth_largest_keys(scores[:, : self.timestamp_begin],
                                         self.k)
            # exact top-k membership with top_k's tie-breaking (equal values
            # selected in index order), reproducing the reference's slot
            # bookkeeping: when EOS is not among the top-k it REPLACES the
            # k-th-ranked candidate (decoding.py:309-313), which under the
            # sorted order is the last selected threshold tie
            greater = keys > kth[:, None]
            ties = keys == kth[:, None]
            m_needed = (self.k - greater.sum(axis=1))[:, None]
            tie_rank = jnp.cumsum(ties, axis=1)
            topk = greater | (ties & (tie_rank <= m_needed))
            has_eos = topk[:, self.eos_id] if self.eos_id \
                < self.timestamp_begin else jnp.zeros((bb,), bool)
            displaced = ties & (tie_rank == m_needed)
            topk = jnp.where(has_eos[:, None], topk, topk & ~displaced)
            cand_mask = jnp.zeros((bb, v_dec), bool)
            cand_mask = cand_mask.at[:, : self.timestamp_begin].set(topk)
            cand_mask = cand_mask.at[:, self.eos_id].set(True)

            xl = state.logp_vt[state.audio_idx,
                               last_label.astype(jnp.int32)]  # (Bb, T)
            if state.p4 is not None:
                # candidate-restricted psi: DMA-gather exactly the masked
                # candidates' posterior rows and dot them with the shared
                # closed-form weights — same values as the masked matmul
                # below at ~20x less HBM traffic (ops/psi_gather.py)
                from ..ops.psi_gather import ctc_psi_candidates

                k_pad = -(-(self.k + 1) // 128) * 128
                tmp = ctc_psi_candidates(
                    state.p4, cand_mask, state.audio_idx, xl,
                    state.r_prev, decoded_len, last_label, self.eos_id,
                    k_pad=k_pad,
                    interpret=jax.default_backend() != "tpu")
            else:
                psi_all = ctc_psi_matmul(
                    state.p_tv, xl, state.r_prev, decoded_len,
                    last_label, self.blank_id, self.eos_id)
                tmp = jnp.where(cand_mask, psi_all[:, :v_dec], LOG_ZERO)
            cand_ids = cand_mask  # stored as membership mask in beam mode
        else:
            # top-K text candidates (+ EOS always, decoding.py:309-313)
            _, cand_ids = jax.lax.top_k(scores[:, : self.timestamp_begin],
                                        self.k)
            has_eos = (cand_ids == self.eos_id).any(axis=1)
            cand_ids = cand_ids.at[:, self.k - 1].set(
                jnp.where(has_eos, cand_ids[:, self.k - 1], self.eos_id))
            # log_psi comes from the closed form alone — the O(K·T) alpha
            # recursion is deferred to update_state, which runs it only for
            # the single chosen token (the reference materializes states for
            # all K candidates every step, decoding.py:309-338)
            log_psi, _ = ctc_prefix_scores(
                state.logp_vt, state.audio_idx, cand_ids, state.r_prev,
                decoded_len, last_label, self.blank_id, self.eos_id,
                with_states=False)

            # scatter psi over the decoder vocab; unscored tokens at -inf
            tmp = jnp.full((bb, v_dec), LOG_ZERO, jnp.float32)
            tmp = jax.vmap(lambda row, idx, val: row.at[idx].set(val))(
                tmp, cand_ids, log_psi)
        # timestamp transparency: ts tokens get the row max (decoding.py:330)
        row_max = tmp.max(axis=1, keepdims=True)
        vocab_ids = jnp.arange(v_dec)
        is_ts = (vocab_ids >= self.timestamp_begin)[None, :]
        tmp = jnp.where(is_ts, row_max, tmp)

        ctc_scores = tmp - state.score_prev[:, None]
        fused = (1.0 - self.ctc_weight) * scores + self.ctc_weight * ctc_scores

        if self.debug:
            dk = 10
            att_v, att_i = jax.lax.top_k(scores, dk)
            # reference blanks timestamps before the CTC top-k
            # (decoding.py:221)
            ctc_masked = jnp.where(is_ts, LOG_ZERO, ctc_scores)
            ctc_v, ctc_i = jax.lax.top_k(ctc_masked, dk)
            fused_v, fused_i = jax.lax.top_k(fused, dk)
            jax.debug.callback(
                _debug_print, tokens, cur_len, att_v, att_i, ctc_v, ctc_i,
                fused_v, fused_i, ctc_scores[:, self.eos_id], ordered=True)

        new_state = state._replace(cand_ids=cand_ids,
                                   decoded_len=decoded_len,
                                   last_label=last_label)
        return fused, new_state

    def update_state(self, state: CTCState, next_tokens: jax.Array,
                     beam_idx: Optional[jax.Array]) -> CTCState:
        """Advance per-hypothesis prefix state after token selection
        (decoding.py:268-275 + generation.py:765-769,1087-1088)."""
        if beam_idx is None:
            beam_idx = jnp.arange(next_tokens.shape[0])
        r_prev = state.r_prev[beam_idx]
        score_prev = state.score_prev[beam_idx]
        cand_ids = state.cand_ids[beam_idx]
        decoded_len = state.decoded_len[beam_idx]
        last_label = state.last_label[beam_idx]

        # alpha recursion for the single chosen token (same formula that
        # produced its rescore psi, so values match the scored candidate)
        chosen_score, chosen_state = ctc_prefix_scores(
            state.logp_vt, state.audio_idx[beam_idx],
            next_tokens[:, None].astype(jnp.int32), r_prev,
            decoded_len, last_label, self.blank_id, self.eos_id)
        chosen_score = chosen_score[:, 0]
        chosen_state = chosen_state[:, 0]

        # tokens < <|0.00|> advance the state; timestamps keep the old one
        # (reference update_state mask: best_ids < first_timestamp_token_id)
        if cand_ids.dtype == jnp.bool_:
            # beam mode stores candidate membership as a vocab mask
            found = jnp.take_along_axis(
                cand_ids, next_tokens[:, None].astype(jnp.int32),
                axis=1)[:, 0]
        else:
            found = (cand_ids == next_tokens[:, None]).any(axis=1)
        advance = (next_tokens < self.timestamp_begin) & found
        new_r = jnp.where(advance[:, None, None], chosen_state, r_prev)
        new_score = jnp.where(advance, chosen_score, score_prev)
        return state._replace(r_prev=new_r, score_prev=new_score,
                              cand_ids=cand_ids,
                              decoded_len=decoded_len,
                              last_label=last_label)
