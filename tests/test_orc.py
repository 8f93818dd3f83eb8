"""Exact ORC segmental DP vs brute-force assignment enumeration.

The oracle evaluates EVERY utterance->stream assignment by concatenating
each stream's utterances in order and summing (time-constrained) Levenshtein
distances — the ORC-WER definition. The DP must match it exactly, plain and
time-constrained, across randomized sessions."""

import itertools

import numpy as np
import pytest

from ts_asr_whisper_tpu.eval.native import (
    levenshtein,
    time_constrained_levenshtein,
)
from ts_asr_whisper_tpu.eval.orc import exact_orc


def _assignment_cost(assign, ref_utts, hyp_streams, ref_times=None,
                     hyp_times=None, collar=None):
    total = 0
    empty_i = np.zeros(0, np.int32)
    empty_t = np.zeros(0, np.float64)
    for si, hyp in enumerate(hyp_streams):
        idxs = [u for u, a in enumerate(assign) if a == si]
        ref_cat = np.concatenate([ref_utts[u] for u in idxs] or [empty_i])
        if collar is not None:
            rb = np.concatenate([ref_times[u][0] for u in idxs] or [empty_t])
            re_ = np.concatenate([ref_times[u][1] for u in idxs] or [empty_t])
            e, _ = time_constrained_levenshtein(
                ref_cat, rb, re_, hyp, hyp_times[si][0], hyp_times[si][1],
                collar)
        else:
            e, _ = levenshtein(ref_cat, hyp)
        total += e
    return total


def _brute_force(ref_utts, hyp_streams, **kw):
    best = None
    for assign in itertools.product(range(len(hyp_streams)),
                                    repeat=len(ref_utts)):
        c = _assignment_cost(assign, ref_utts, hyp_streams, **kw)
        if best is None or c < best:
            best = c
    return best


def _random_session(rng, n_utt, n_streams, vocab=6, max_len=5):
    ref_utts, ref_times = [], []
    t = 0.0
    for _ in range(n_utt):
        m = int(rng.integers(0, max_len + 1))
        ref_utts.append(rng.integers(0, vocab, m).astype(np.int32))
        starts = t + np.arange(m, dtype=np.float64)
        ref_times.append((starts, starts + 1.0))
        t += m + rng.uniform(0, 2)
    hyp_streams, hyp_times = [], []
    for _ in range(n_streams):
        m = int(rng.integers(0, 3 * max_len))
        hyp_streams.append(rng.integers(0, vocab, m).astype(np.int32))
        centers = np.sort(rng.uniform(0, max(t, 1.0), m))
        hyp_times.append((centers, centers.copy()))
    return ref_utts, ref_times, hyp_streams, hyp_times


@pytest.mark.parametrize("seed", range(8))
def test_exact_orc_matches_brute_force_plain(seed):
    rng = np.random.default_rng(seed)
    n_utt = int(rng.integers(1, 7))
    n_streams = int(rng.integers(1, 4))
    ref_utts, _, hyp_streams, _ = _random_session(rng, n_utt, n_streams)
    total, assign = exact_orc(ref_utts, hyp_streams)
    oracle = _brute_force(ref_utts, hyp_streams)
    assert total == oracle
    # the returned assignment must realize the optimum
    assert _assignment_cost(assign, ref_utts, hyp_streams) == oracle


@pytest.mark.parametrize("seed", range(8))
def test_exact_orc_matches_brute_force_time_constrained(seed):
    rng = np.random.default_rng(100 + seed)
    n_utt = int(rng.integers(1, 6))
    n_streams = int(rng.integers(1, 4))
    ref_utts, ref_times, hyp_streams, hyp_times = _random_session(
        rng, n_utt, n_streams)
    collar = float(rng.uniform(0.5, 5.0))
    kw = dict(ref_times=ref_times, hyp_times=hyp_times, collar=collar)
    total, assign = exact_orc(ref_utts, hyp_streams, **kw)
    oracle = _brute_force(ref_utts, hyp_streams, **kw)
    assert total == oracle
    assert _assignment_cost(assign, ref_utts, hyp_streams, **kw) == oracle


def test_exact_orc_large_session():
    """64 utterances x 2 streams: far beyond enumeration; the DP total must
    lower-bound every sampled assignment and be realized by its own
    assignment."""
    rng = np.random.default_rng(7)
    ref_utts, _, hyp_streams, _ = _random_session(rng, 64, 2, vocab=20,
                                                  max_len=6)
    total, assign = exact_orc(ref_utts, hyp_streams)
    assert _assignment_cost(assign, ref_utts, hyp_streams) == total
    for _ in range(50):
        rand = rng.integers(0, 2, len(ref_utts))
        assert _assignment_cost(rand, ref_utts, hyp_streams) >= total


def test_exact_orc_empty_cases():
    empty = np.zeros(0, np.int32)
    # no hypothesis: every ref word is a deletion
    total, assign = exact_orc([np.array([1, 2], np.int32)], [])
    assert total == 2 and assign == (0,)
    # no utterances: every hyp word is an insertion
    total, assign = exact_orc([], [np.array([1, 2, 3], np.int32)])
    assert total == 3 and assign == ()
    # both empty
    total, assign = exact_orc([], [empty])
    assert total == 0


def test_tcorc_collar_changes_score():
    """A hyp word far in time from its ref twin must not align under a small
    collar (ins+del) but aligns when unconstrained — the ADVICE finding that
    the collar was previously dead."""
    ref_utts = [np.array([5], np.int32)]
    ref_times = [(np.array([0.0]), np.array([1.0]))]
    hyp_streams = [np.array([5], np.int32)]
    hyp_times = [(np.array([100.0]), np.array([100.0]))]
    total_tc, _ = exact_orc(ref_utts, hyp_streams, ref_times, hyp_times,
                            collar=5.0)
    total_plain, _ = exact_orc(ref_utts, hyp_streams)
    assert total_plain == 0
    assert total_tc == 2  # deletion + insertion


def test_session_tcorc_applies_collar():
    """calc_session_tcorc_wer must thread the collar into group scoring."""
    from ts_asr_whisper_tpu.eval.seglst import SegLST
    from ts_asr_whisper_tpu.eval.wer import calc_session_tcorc_wer

    # same words, hyp shifted 20 s: inside one VAD group (continuous speech
    # via a bridging segment) the constrained score must degrade
    ref = SegLST([
        {"session_id": "s", "speaker": "A", "start_time": 0.0,
         "end_time": 2.0, "words": "alpha beta"},
        {"session_id": "s", "speaker": "A", "start_time": 2.0,
         "end_time": 22.0, "words": "x " * 19 + "x"},
    ])
    hyp_match = SegLST([
        {"session_id": "s", "speaker": "A", "start_time": 0.0,
         "end_time": 2.0, "words": "alpha beta"},
        {"session_id": "s", "speaker": "A", "start_time": 2.0,
         "end_time": 22.0, "words": "x " * 19 + "x"},
    ])
    hyp_shift = SegLST([
        {"session_id": "s", "speaker": "A", "start_time": 20.0,
         "end_time": 22.0, "words": "alpha beta"},
        {"session_id": "s", "speaker": "A", "start_time": 2.0,
         "end_time": 22.0, "words": "x " * 19 + "x"},
    ])
    good = calc_session_tcorc_wer(ref, hyp_match, group_duration=30,
                                  time_step=0.01, collar=5)
    bad = calc_session_tcorc_wer(ref, hyp_shift, group_duration=30,
                                 time_step=0.01, collar=5)
    assert good["tcorc_errors"] == 0
    assert bad["tcorc_errors"] > 0


def test_orc_session_chunked_fallback(monkeypatch):
    """Sessions past the DP size guards split at joint silences and solve
    each group exactly instead of raising (previously a ValueError killed
    the whole eval run)."""
    import numpy as np

    import ts_asr_whisper_tpu.eval.orc as orc_mod
    from ts_asr_whisper_tpu.eval.seglst import SegLST
    from ts_asr_whisper_tpu.eval.wer import calc_session_orc_wer

    rng = np.random.default_rng(5)
    words = ["a", "b", "c", "d", "e"]

    def seg(spk, t0, n):
        return {"session_id": "s", "speaker": spk, "start_time": t0,
                "end_time": t0 + 2.0,
                "words": " ".join(rng.choice(words, n))}

    # two well-separated bursts of 3-speaker speech
    ref = [seg(f"r{s}", t0 + s * 0.1, 6)
           for t0 in (0.0, 120.0) for s in range(3)]
    hyp = [seg(f"h{s}", t0 + s * 0.1, 6)
           for t0 in (0.0, 120.0) for s in range(3)]
    exact = calc_session_orc_wer(SegLST(ref), SegLST(hyp))

    # force the fallback by shrinking the guard; the groups here are
    # independent across the silence, so counts must match the exact run
    monkeypatch.setattr(orc_mod, "MAX_GRID_CELLS", 10_000)
    chunked = calc_session_orc_wer(SegLST(ref), SegLST(hyp))
    for k in ("orc_errors", "orc_length", "orc_insertions",
              "orc_deletions", "orc_substitutions"):
        assert chunked[k] == exact[k], k
