"""Long-form (arbitrary-length) decoding: host-driven seek orchestration
around the jitted 30 s decode window.

Re-designs the reference's generation stack
(/root/reference/src/models/dicow/generation.py) for TPU execution:
- the per-window compute (encoder + FDDT + KV-cached greedy/beam) is one
  jitted call with static shapes, batched over ALL recordings at once;
- the data-dependent parts — window slicing, segment retrieval with seek
  rollback (generation.py:415-534), global-timestamp re-blocking
  (generation.py:314-413) — stay on host in exact-semantics numpy/Decimal;
- rows whose audio is exhausted decode a silence window (the DiCoW
  EOS-early-exit makes those terminate in one step) so the device batch
  shape never changes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models.config import DiCoWConfig
from ..models.dicow import dicow_encoder_forward, encoder_ctc_logits
from .generation_config import GenerationConfig
from .greedy import greedy_decode

# jit the per-window encoder work: called eagerly these compose hundreds of
# dispatches per window (catastrophic over a remoted-TPU link); jitted they
# are one XLA program each, cached across windows and calls
_encoder_jit = jax.jit(dicow_encoder_forward,
                       static_argnames=("cfg", "remat"))
_ctc_logits_jit = jax.jit(encoder_ctc_logits, static_argnames=("cfg",))


@functools.partial(jax.jit, static_argnames=("nsf",))
def _slice_windows_dev(features, stno, forced, meta, nsf: int):
    """Device-side seek-window assembly. The full-recording features/STNO/
    prompts stay resident on device for the whole longform call; each window
    is a per-row dynamic_slice + tail masking — no host round trip (the host
    path re-uploaded ~25 MB per window over the TPU link, which dominated
    end-to-end decode time on a remoted chip).

    features: (B, M, T+nsf) zero-padded; stno: (B, 4, (T+nsf)//2);
    forced: (B, P) decoder prompts; meta: (4, bucket) int32 packed
    [row ids; mel-frame seek offsets; valid mel frames; valid 50 Hz frames]
    — one combined upload per window batch. Semantics match the host
    assembly exactly: mel tail zeroed, STNO tail = silence."""
    m = features.shape[1]
    rows, seek_rows, n_mel, n_stno = meta

    def one(r, s, nm, ns):
        w = jax.lax.dynamic_slice(features[r], (0, s), (m, nsf))
        w = jnp.where(jnp.arange(nsf)[None, :] < nm, w, 0.0)
        sv = jax.lax.dynamic_slice(stno[r], (0, s // 2), (4, nsf // 2))
        tail = jnp.arange(nsf // 2)[None, :] >= ns
        sv = jnp.where(tail, 0.0, sv)
        sv = sv.at[0].set(jnp.where(tail[0], 1.0, sv[0]))
        return w, sv

    windows, stno_w = jax.vmap(one)(rows, seek_rows, n_mel, n_stno)
    return windows, stno_w, forced[rows]

TIME_PRECISION = 0.02
INPUT_STRIDE = 2              # conv2 stride
NUM_SEGMENT_FRAMES = 3000     # mel frames / 30 s window
EMPTY_TOKEN_ID = 220          # "Ġ" (single space) in the whisper vocab


@dataclass
class Segment:
    start: float
    end: float
    tokens: np.ndarray
    # word-level timestamps (seconds, global time) for this segment's
    # tokens when return_token_timestamps is on (reference
    # generation.py:473-475,526-527); None otherwise
    token_timestamps: Optional[np.ndarray] = None


@dataclass
class LongformOutput:
    sequences: np.ndarray                 # (B, L) padded final token ids
    segments: List[List[Segment]] = field(default_factory=list)
    # row-windows actually decoded (incl. seek rollbacks / re-decodes);
    # benchmarks normalize throughput by this, not nominal audio length
    windows_decoded: int = 0


# ---------------------------------------------------------------------------
# segment retrieval (host) — port of generation.py:415-534
# ---------------------------------------------------------------------------


def retrieve_segment(
    seek_sequence: np.ndarray,   # generated tokens for this window (no prompt)
    timestamp_begin: int,
    seek_num_frames: int,        # mel frames consumed by this window
    time_offset: float,          # seconds at window start
    token_timestamps: Optional[np.ndarray] = None,  # full extracted row
    prompt_len: int = 0,         # the reference's idx_offset
) -> tuple:
    """Split a window's decoded tokens into timestamped segments and compute
    how many mel frames to advance the seek pointer.

    With ``token_timestamps`` (the per-row DTW extraction incl. prompt
    zeros), segments carry their token-level times: the consecutive-
    timestamp branch slices ``[prompt_len + last : prompt_len + current]``
    and the no-consecutive branch attaches the FULL row — both quirks
    exactly as the reference (generation.py:473-475,526-527)."""
    seek_sequence = np.asarray(seek_sequence)
    ts_tokens = seek_sequence >= timestamp_begin
    single_timestamp_ending = (
        len(seek_sequence) >= 2 and ts_tokens[-2:].tolist() == [False, True])
    consec = np.where(ts_tokens[:-1] & ts_tokens[1:])[0] + 1

    segments: List[Segment] = []
    if len(consec) > 0:
        slices = consec.tolist()
        if single_timestamp_ending:
            slices.append(len(seek_sequence))
        else:
            slices[-1] += 1
        last_slice = 0
        for i, current_slice in enumerate(slices):
            is_last = i == len(slices) - 1
            sliced = seek_sequence[last_slice:current_slice]
            start_pos = int(sliced[0]) - timestamp_begin
            end_idx = -1 if (not is_last or single_timestamp_ending) else -2
            end_pos = int(sliced[end_idx]) - timestamp_begin
            tt = None
            if token_timestamps is not None:
                tt = token_timestamps[prompt_len + last_slice:
                                      prompt_len + current_slice] \
                    + time_offset
            segments.append(Segment(
                start=time_offset + start_pos * TIME_PRECISION,
                end=time_offset + end_pos * TIME_PRECISION,
                tokens=sliced, token_timestamps=tt))
            last_slice = current_slice
        if single_timestamp_ending:
            segment_offset = seek_num_frames
        else:
            last_ts_pos = int(seek_sequence[last_slice - 2]) - timestamp_begin
            segment_offset = last_ts_pos * INPUT_STRIDE
    else:
        timestamps = seek_sequence[ts_tokens]
        start_pos = 0.0
        last_pos = seek_num_frames // 2
        skip = False
        segment_offset = seek_num_frames
        if timestamps.size > 1:
            start_pos = int(timestamps[-2]) - timestamp_begin
            last_pos = int(timestamps[-1]) - timestamp_begin
        elif timestamps.size == 1:
            start_pos = int(timestamps[-1]) - timestamp_begin
            if start_pos > 200:
                # segment does not fit the window: roll the seek back
                # (timestamp may be inaccurate, generation.py:504-507)
                segment_offset = start_pos * INPUT_STRIDE - 100
                skip = True
        elif timestamps.size == 0 and len(seek_sequence) > 1:
            pass  # no-timestamp decoding: keep output as-is
        else:
            skip = True
        if not skip:
            tt = None
            if token_timestamps is not None:
                # reference quirk: the whole extracted row (incl. prompt
                # zeros) is attached here, not a slice (generation.py:526)
                tt = token_timestamps + time_offset
            segments = [Segment(
                start=time_offset + start_pos * TIME_PRECISION,
                end=time_offset + last_pos * TIME_PRECISION,
                tokens=seek_sequence, token_timestamps=tt)]
            segment_offset = seek_num_frames

    if segment_offset <= 0:
        raise ValueError(
            f"Segment offset {segment_offset} <= 0; this should not happen")
    return segments, int(segment_offset)


# ---------------------------------------------------------------------------
# timestamp re-blocking (host) — port of generation.py:314-413
# ---------------------------------------------------------------------------


def round_to_nearest_0_02(x: float) -> Decimal:
    d = Decimal(str(x))
    step = Decimal("0.02")
    return (d / step).to_integral_value(rounding=ROUND_HALF_UP) * step


def fix_timestamps_from_segmentation(
    all_segments: List[List[Segment]],
    timestamp_begin: int,
    pad_token_id: int,
    empty_token_id: int = EMPTY_TOKEN_ID,
) -> np.ndarray:
    """Re-linearize global-time segments into Whisper's 0-30 s timestamp
    range with dummy block bridges. Token-level equivalent of the
    reference's decode->re-encode roundtrip (generation.py:322-413): instead
    of stringifying, timestamp ids are emitted directly (text is identical)."""

    def ts_id(t: Decimal) -> int:
        return timestamp_begin + int(
            (t / Decimal("0.02")).to_integral_value(rounding=ROUND_HALF_UP))

    results = []
    for segs in all_segments:
        segs = [s for s in segs
                if len(s.tokens) > 0 and not (
                    len(s.tokens) == 1 and int(s.tokens[0]) == timestamp_begin)]
        result = []  # (start Decimal, [text tokens], end Decimal) in 0-30
        prev_end = None
        correction = Decimal(0)
        for seg in segs:
            start_time = round_to_nearest_0_02(float(seg.start))
            end_time = round_to_nearest_0_02(float(seg.end))
            tokens = [int(t) for t in seg.tokens
                      if int(t) < timestamp_begin]
            current_block = (start_time + correction) // 30
            if prev_end is not None:
                prev_block = (prev_end - Decimal("0.001")) // 30
                num_dummies = current_block - prev_block - 1
                if current_block > prev_block:
                    result.append((Decimal(30), [empty_token_id], Decimal(30)))
                for _ in range(int(num_dummies)):
                    result.append((Decimal(0), [empty_token_id], Decimal(30)))
            else:
                for _ in range(int(start_time // 30)):
                    result.append((Decimal(0), [empty_token_id], Decimal(30)))

            if (start_time + correction) // 30 == (end_time + correction) // 30:
                result.append(((start_time + correction) % 30, tokens,
                               (end_time + correction) % 30))
            elif (end_time + correction) % 30 == 0:
                result.append(((start_time + correction) % 30, tokens,
                               Decimal(30)))
                correction = Decimal(0)
            else:
                new_start = (correction + start_time) % 30
                seg_duration = end_time - start_time
                new_end = (end_time + correction) % 30
                if seg_duration == Decimal(30):
                    if float(new_start) % 30.0 == 0.0:
                        new_end = Decimal(30)
                        correction = Decimal(0)
                    else:
                        correction = Decimal("-0.02")
                        new_end += correction
                else:
                    correction = Decimal(0)
                result.append((new_start, tokens, new_end))
            prev_end = end_time + correction

        ids: List[int] = []
        for start, toks, end in result:
            ids.append(ts_id(start))
            ids.extend(toks)
            ids.append(ts_id(end))
        results.append(ids)

    max_len = max((len(r) for r in results), default=1) or 1
    out = np.full((len(results), max_len), pad_token_id, dtype=np.int64)
    for i, r in enumerate(results):
        out[i, : len(r)] = r
    return out




def compression_ratio(tokens, vocab_size: int) -> float:
    """HF WhisperGenerationMixin._retrieve_compression_ratio: zlib ratio over
    fixed-width little-endian token bytes (width = int(log2(V)/8)+1). The
    reference's fallback checks run on token bytes, not decoded text."""
    import math
    import zlib

    width = int(math.log2(vocab_size) / 8) + 1
    data = b"".join(int(t).to_bytes(width, "little") for t in tokens)
    return len(data) / len(zlib.compress(data))


def _needs_fallback(tokens, avg_logprob, gen_cfg: GenerationConfig,
                    vocab_size: int) -> bool:
    """HF generate_with_fallback quality checks (_need_fallback): high zlib
    compression ratio (repetition) or low average logprob triggers a
    re-decode at the next temperature."""
    if gen_cfg.compression_ratio_threshold is not None and len(tokens):
        if compression_ratio(tokens, vocab_size) \
                > gen_cfg.compression_ratio_threshold:
            return True
    if gen_cfg.logprob_threshold is not None \
            and avg_logprob < gen_cfg.logprob_threshold:
        return True
    return False

# ---------------------------------------------------------------------------
# language detection (generation.py:151-221)
# ---------------------------------------------------------------------------


def detect_language(
    params: Dict[str, Any],
    cfg: DiCoWConfig,
    gen_cfg: GenerationConfig,
    encoder_hidden: jax.Array,  # encoder output of the FIRST 30 s window
) -> np.ndarray:
    """One decoder step from <sot>; argmax restricted to language tokens.
    The STNO conditioning is already inside encoder_hidden (the reference
    passes the stno slice through the encoder the same way)."""
    return np.asarray(_detect_lang_jit(params, cfg, encoder_hidden,
                                       gen_cfg.decoder_start_token_id,
                                       gen_cfg.lang_ids))


@functools.partial(jax.jit, static_argnames=("cfg", "sot", "lang_ids"))
def _detect_lang_jit(params, cfg, encoder_hidden, sot: int,
                     lang_ids: tuple) -> jax.Array:
    from ..models.whisper import decoder_forward, lm_logits

    b = encoder_hidden.shape[0]
    sot_tok = jnp.full((b, 1), sot, jnp.int32)
    hidden = decoder_forward(params["decoder"], cfg, sot_tok, encoder_hidden)
    logits = lm_logits(params["decoder"], hidden[:, -1])
    ids = jnp.asarray(lang_ids, jnp.int32)
    return ids[jnp.argmax(logits[:, ids], axis=-1)]


# ---------------------------------------------------------------------------
# the seek loop
# ---------------------------------------------------------------------------


def longform_generate(
    params: Dict[str, Any],
    cfg: DiCoWConfig,
    gen_cfg: GenerationConfig,
    input_features: np.ndarray,     # (B, n_mels, T_total) host array
    stno_mask: np.ndarray,          # (B, 4, T_total // 2)
    attention_mask: np.ndarray,     # (B, T_total) mel-frame validity
    forced_decoder_ids: np.ndarray,  # (B, P) decoder prompts (sot, lang, task)
    enroll_features: Optional[np.ndarray] = None,
    enroll_stno: Optional[np.ndarray] = None,
    max_new_tokens: Optional[int] = None,
    return_segments: bool = False,
    upper_to_lower: Optional[np.ndarray] = None,  # (2, n) case-fold map
    detect_lang: bool = False,  # fill forced_decoder_ids[:,1] by detection
    mesh=None,  # optional jax.sharding.Mesh with a "data" axis: DP decode
    token_ts_num_frames: Optional[np.ndarray] = None,  # (B,) valid mel
    # frames for the token-timestamp DTW crop (HF's num_frames kwarg;
    # None = no crop, matching HF when the kwarg is absent)
):
    """Batched long-form transcription. Returns LongformOutput whose
    ``sequences`` carry re-blocked 0-30 s timestamps (ready for the SegLST
    parser in eval/).

    With ``mesh``, params are replicated and every per-window device input is
    sharded on the mesh's ``data`` axis, so the jitted encoder + decode loops
    compile SPMD across chips (the reference scales eval via DDP ranks,
    evaluation.py:239-291; here one process drives the whole mesh)."""
    b, _, t_total = input_features.shape
    num_segment_frames = cfg.max_source_positions * INPUT_STRIDE
    max_frames = np.asarray(attention_mask).sum(-1).astype(np.int64)
    seek = np.zeros(b, dtype=np.int64)
    prompt_len = forced_decoder_ids.shape[1]
    max_new = max_new_tokens or (gen_cfg.max_length - prompt_len)

    all_segments: List[List[Segment]] = [[] for _ in range(b)]
    ts_begin = gen_cfg.timestamp_begin

    alignment_slots = None
    if gen_cfg.return_token_timestamps:
        # word-level timestamps: DTW over cross-attention alignment heads
        # (decoding/token_timestamps.py). Greedy-only by scope — the
        # reference never enables the capability; see the module docstring.
        if gen_cfg.num_beams > 1:
            raise NotImplementedError(
                "return_token_timestamps is implemented for the greedy path"
                " (num_beams == 1); see decoding/token_timestamps.py")
        if not gen_cfg.alignment_heads:
            raise ValueError(
                "return_token_timestamps needs generation-config "
                "alignment_heads (HF raises the same requirement)")
        from .token_timestamps import alignment_slots_from_heads
        alignment_slots = jnp.asarray(alignment_slots_from_heads(
            gen_cfg.alignment_heads, cfg.decoder_layers,
            cfg.decoder_attention_heads))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_data = mesh.shape["data"]
        params = jax.device_put(params,
                                NamedSharding(mesh, PartitionSpec()))
        _batch_sharding = NamedSharding(mesh, PartitionSpec("data"))

        def _dev(x):
            arr = x if isinstance(x, jax.Array) else np.asarray(x)
            if arr.shape[0] % n_data == 0:
                return jax.device_put(arr, _batch_sharding)
            return jnp.asarray(arr)
    else:
        n_data = 1
        _dev = jnp.asarray

    # full-recording features/STNO live on device for the whole call (the
    # per-window assembly is a jitted dynamic_slice, _slice_windows_dev);
    # zero-pad by one window so every seek slice is in-bounds
    feats_dev = jnp.pad(jnp.asarray(input_features, jnp.float32),
                        ((0, 0), (0, 0), (0, num_segment_frames)))
    stno_dev = jnp.pad(jnp.asarray(stno_mask, jnp.float32),
                       ((0, 0), (0, 0), (0, num_segment_frames // 2)))

    enroll_args = {}
    if enroll_features is not None:
        enroll_args = dict(enroll_features=jnp.asarray(enroll_features),
                           enroll_stno=jnp.asarray(enroll_stno))

    if detect_lang and gen_cfg.lang_ids:
        # language detection on the first window (generation.py:151-221)
        meta0 = np.stack([
            np.arange(b),
            np.zeros(b, np.int64),
            np.full(b, min(t_total, num_segment_frames)),
            np.clip(max_frames // 2, 0, num_segment_frames // 2),
        ]).astype(np.int32)
        first, first_stno, _ = _slice_windows_dev(
            feats_dev, stno_dev, jnp.zeros((b, 1), jnp.int32),
            jnp.asarray(meta0), nsf=num_segment_frames)
        enc0 = _encoder_jit(params["encoder"], cfg,
                            _dev(first),
                            _dev(first_stno), **enroll_args)
        langs = detect_language(params, cfg, gen_cfg, enc0)
        forced_decoder_ids = np.asarray(forced_decoder_ids).copy()
        forced_decoder_ids[:, 1] = langs

    forced_dev = jnp.asarray(np.asarray(forced_decoder_ids), jnp.int32)

    def _next_pow2(n: int) -> int:
        p = 1
        while p < n:
            p *= 2
        return min(p, b)

    windows_decoded = 0
    while (seek < max_frames).any():
        # compact active rows: recordings finish at different times, so late
        # iterations decode a small power-of-2 bucket instead of the full
        # batch (bucket shapes bound recompilation; the jit cache persists
        # across calls). Device arrays are indexed by `rows`.
        active_idx = np.where(seek < max_frames)[0]
        windows_decoded += len(active_idx)
        bucket = _next_pow2(len(active_idx))
        if bucket % n_data:  # DP decode: buckets must tile the mesh
            bucket = -(-bucket // n_data) * n_data
        rows = np.concatenate(
            [active_idx,
             np.full(bucket - len(active_idx), active_idx[0], np.int64)])
        active = np.zeros(b, dtype=bool)
        active[active_idx] = True

        seek_num_frames_all = np.minimum(max_frames - seek, num_segment_frames)
        seek_num_frames_all = np.maximum(seek_num_frames_all, 0)
        seek_rows = seek[rows]
        n_stno = np.clip(max_frames[rows] // 2 - seek_rows // 2, 0,
                         num_segment_frames // 2)
        meta = np.stack([rows, seek_rows, seek_num_frames_all[rows],
                         n_stno]).astype(np.int32)
        window, stno_window, forced_rows = _slice_windows_dev(
            feats_dev, stno_dev, forced_dev, jnp.asarray(meta),
            nsf=num_segment_frames)
        seek_num_frames = seek_num_frames_all

        bucket_enroll = {}
        if enroll_args:
            bucket_enroll = dict(
                enroll_features=_dev(enroll_args["enroll_features"][rows]),
                enroll_stno=_dev(enroll_args["enroll_stno"][rows]))

        enc = _encoder_jit(
            params["encoder"], cfg, _dev(window),
            _dev(stno_window), **bucket_enroll)

        ctc_scorer = None
        ctc_state = None
        if gen_cfg.ctc_weight > 0:
            from .ctc_rescorer import CTCRescorer, init_ctc_state

            enc_logits = _ctc_logits_jit(params["encoder"], cfg, enc)
            blank = cfg.ctc_vocab_size - 1
            ctc_scorer = CTCRescorer(
                blank_id=blank, eos_id=gen_cfg.eos_token_id,
                timestamp_begin=gen_cfg.timestamp_begin,
                ctc_weight=gen_cfg.ctc_weight,
                k=min(500, gen_cfg.timestamp_begin - 1),
                prefix_len=forced_decoder_ids.shape[1],
                debug=gen_cfg.joint_debug)
            ctc_state = init_ctc_state(enc_logits, blank, upper_to_lower,
                                       num_beams=max(gen_cfg.num_beams, 1),
                                       k=ctc_scorer.k,
                                       p_bf16=gen_cfg.ctc_p_bf16,
                                       psi_impl=gen_cfg.ctc_psi_impl)

        if gen_cfg.num_beams > 1:
            from .beam import beam_search

            out = beam_search(params, cfg, gen_cfg, enc,
                              _dev(forced_rows), max_new,
                              num_beams=gen_cfg.num_beams,
                              ctc_scorer=ctc_scorer, ctc_state=ctc_state)
        else:
            out = greedy_decode(params, cfg, gen_cfg, enc,
                                _dev(forced_rows), max_new,
                                ctc_scorer=ctc_scorer, ctc_state=ctc_state,
                                alignment_slots=alignment_slots)
        # scatter bucket results back to full-batch views (first occurrence
        # of each row wins; padded duplicates are ignored)
        sequences = np.zeros((b, out.sequences.shape[1]), dtype=np.int64)
        lengths = np.zeros(b, dtype=np.int64)
        # ONE device->host round trip per window batch (each separate
        # np.asarray pays a full link RTT on a remoted TPU)
        extra_names = [nm for nm in ("no_speech_probs", "sum_logprobs",
                                     "scores") if hasattr(out, nm)]
        align_out = getattr(out, "alignment_weights", None)
        fetched = jax.device_get(
            (out.sequences, out.lengths)
            + tuple(getattr(out, nm) for nm in extra_names)
            + ((align_out,) if align_out is not None else ()))
        bucket_seq = np.asarray(fetched[0])
        bucket_len = np.asarray(fetched[1])
        seen_rows = set()
        n_extra = len(extra_names)
        bucket_extra = dict(zip(extra_names,
                                (np.asarray(a) for a in
                                 fetched[2: 2 + n_extra])))
        full_extra = {name: np.zeros(b, dtype=np.float64)
                      for name in bucket_extra}
        weights_full = None
        bucket_w = None
        if align_out is not None:
            bucket_w = np.asarray(fetched[2 + n_extra])
            weights_full = np.zeros((b,) + bucket_w.shape[1:], np.float32)
        for j, i in enumerate(rows):
            if i in seen_rows:
                continue
            seen_rows.add(i)
            sequences[i] = bucket_seq[j]
            lengths[i] = bucket_len[j]
            for name, arr in bucket_extra.items():
                full_extra[name][i] = arr[j]
            if bucket_w is not None:
                weights_full[i] = bucket_w[j]

        # per-row logprob value for the quality checks (HF _need_fallback):
        # beam mode uses sequences_scores (length-penalized) directly;
        # greedy mode averages the chosen-token logprobs over gen length
        if "scores" in full_extra:
            avg_lp = full_extra["scores"].copy()
        elif "sum_logprobs" in full_extra:
            avg_lp = full_extra["sum_logprobs"] \
                / np.maximum(lengths - prompt_len, 1)
        else:
            avg_lp = np.zeros(b, dtype=np.float64)

        def _skip_mask() -> np.ndarray:
            # no-speech skip (HF _need_fallback): silence iff the begin-step
            # no-speech prob exceeds the threshold AND the decode is
            # low-confidence; HF requires both thresholds set
            if (gen_cfg.no_speech_threshold is None
                    or gen_cfg.logprob_threshold is None
                    or "no_speech_probs" not in full_extra):
                return np.zeros(b, dtype=bool)
            ns = full_extra["no_speech_probs"]
            return ((ns > gen_cfg.no_speech_threshold)
                    & (avg_lp < gen_cfg.logprob_threshold))

        # temperature fallback (generate_with_fallback): rows failing the
        # quality checks re-decode at successive temperatures; HF forces
        # num_beams=1 + sampling for temperature>0 retries, so retries are
        # sampled greedy even when the first pass was beam search. The whole
        # bucket re-runs (fallback is rare) and only failing rows take the
        # new result. Rows meeting the no-speech skip condition never fall
        # back (HF clears needs_fallback for them).
        temps = tuple(gen_cfg.temperature or (0.0,))
        if len(temps) > 1 and (gen_cfg.logprob_threshold is not None
                               or gen_cfg.compression_ratio_threshold
                               is not None):
            ctc_state_retry = ctc_state
            if ctc_scorer is not None and gen_cfg.num_beams > 1:
                # retries are single-hypothesis: fresh per-row CTC state
                ctc_state_retry = init_ctc_state(
                    enc_logits, blank, upper_to_lower, num_beams=1,
                    k=ctc_scorer.k)
            for t_i, temp in enumerate(temps[1:], start=1):
                skip_now = _skip_mask()
                needs = np.zeros(b, dtype=bool)
                for i in np.unique(rows):
                    if skip_now[i]:
                        continue
                    seq_i = sequences[i, prompt_len: int(lengths[i])]
                    needs[i] = _needs_fallback(seq_i, avg_lp[i], gen_cfg,
                                               cfg.vocab_size)
                if not needs.any():
                    break
                retry = greedy_decode(
                    params, cfg, gen_cfg, enc, _dev(forced_rows),
                    max_new, ctc_scorer=ctc_scorer,
                    ctc_state=ctc_state_retry,
                    temperature=float(temp),
                    rng_key=jax.random.PRNGKey(int(seek.sum()) + t_i),
                    alignment_slots=alignment_slots)
                r_seq, r_len, r_lp, r_ns = (np.asarray(a) for a in
                                            jax.device_get((
                                                retry.sequences,
                                                retry.lengths,
                                                retry.sum_logprobs,
                                                retry.no_speech_probs)))
                r_w = (np.asarray(jax.device_get(retry.alignment_weights))
                       if weights_full is not None else None)
                seen = set()
                for j, i in enumerate(rows):
                    if i in seen:
                        continue
                    seen.add(i)
                    if needs[i]:
                        sequences[i, : r_seq.shape[1]] = r_seq[j]
                        lengths[i] = r_len[j]
                        avg_lp[i] = r_lp[j] / max(int(r_len[j]) - prompt_len,
                                                  1)
                        if "no_speech_probs" in full_extra:
                            full_extra["no_speech_probs"][i] = r_ns[j]
                        if r_w is not None:
                            weights_full[i] = r_w[j]

        skip_silence = _skip_mask()

        token_ts = None
        if weights_full is not None:
            # HF extracts per seek window over the active sub-batch, with
            # num_frames = user num_frames - seek (_postprocess_outputs)
            from .token_timestamps import extract_token_timestamps
            act = np.where(active)[0]
            nf = None
            if token_ts_num_frames is not None:
                nf = (np.asarray(token_ts_num_frames, np.int64) - seek)[act]
            ts_rows = extract_token_timestamps(
                weights_full[act], prompt_len, lengths[act], num_frames=nf,
                median_filter_width=gen_cfg.median_filter_width)
            token_ts = {int(i): ts_rows[k] for k, i in enumerate(act)}

        for i in range(b):
            if not active[i]:
                continue
            if skip_silence[i]:
                seek[i] += int(seek_num_frames[i])
                continue
            seq = sequences[i, prompt_len: lengths[i]]
            # strip trailing eos/pad
            while len(seq) and seq[-1] in (gen_cfg.eos_token_id,
                                           gen_cfg.pad_token_id):
                seq = seq[:-1]
            time_offset = float(seek[i]) * TIME_PRECISION / INPUT_STRIDE
            segments, offset = retrieve_segment(
                seq, ts_begin, int(seek_num_frames[i]), time_offset,
                token_timestamps=(token_ts[i] if token_ts is not None
                                  else None),
                prompt_len=prompt_len)
            all_segments[i].extend(segments)
            seek[i] += offset

    sequences = fix_timestamps_from_segmentation(
        all_segments, ts_begin, gen_cfg.pad_token_id)
    return LongformOutput(sequences=sequences,
                          segments=all_segments if return_segments else [],
                          windows_decoded=windows_decoded)
