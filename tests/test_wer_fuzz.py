"""Session-level randomized WER-engine fuzz vs brute-force oracles.

Closes the validation gap the round-2 review flagged: the per-group DP is
oracle-verified (test_orc.py) and tcpWER has a small randomized suite
(test_wer.py:208), but nothing fuzzed the FULL session drivers — speaker
permutation + padding, utterance-to-stream assignment, VAD chunking, stream
merging — across the messy-session space the reference's meeteval calls
handle (/root/reference/src/utils/wer.py:30-106): overlapping speech,
self-overlapping speakers, empty/extra streams, CJK single-character words,
both pseudo word-timing styles.

Oracles re-derive the optimum by exhaustive enumeration (permutations for
tcp/cp, assignment products for ORC/tcORC) over independently-implemented
pure-Python matchers; only the character-proportional timing construction
is shared with the engine (it is data preparation, not matching).

Metamorphic properties close the cases enumeration can't reach:
collar monotonicity, speaker-relabel + segment-order invariance,
tcp >= cp, orc <= cp, and split-point insensitivity of chunked tcORC on
silence-separated sessions (arbitrary group_duration gives identical
counts when groups are truly independent).
"""

import itertools

import numpy as np
import pytest

from ts_asr_whisper_tpu.eval.seglst import SegLST
from ts_asr_whisper_tpu.eval.wer import (
    _segment_word_times,
    _Vocab,
    calc_session_cp_wer,
    calc_session_orc_wer,
    calc_session_tcorc_wer,
    calc_session_tcp_wer,
)

LATIN = ["a", "bb", "ccc", "d", "ee", "f"]
CJK = ["好", "的", "是", "不", "了", "人"]


# ---------------------------------------------------------------------------
# session generator
# ---------------------------------------------------------------------------


def gen_session(seed, cjk=False, n_ref_spk=None, n_hyp_spk=None,
                n_ref_seg=None, n_hyp_seg=None, t_max=12.0):
    """Random overlapping multi-talker session. Self-overlap (one speaker
    overlapping their own earlier segment), fully-overlapped speakers,
    empty-words segments (-> empty/missing streams) and hyp-only speakers
    all occur naturally."""
    r = np.random.default_rng(seed)
    words = CJK if cjk else LATIN
    n_ref_spk = n_ref_spk or int(r.integers(1, 4))
    n_hyp_spk = n_hyp_spk if n_hyp_spk is not None else int(r.integers(0, 4))

    def mk(prefix, n_spk, n_seg):
        segs = []
        for _ in range(n_seg):
            start = float(r.uniform(0, t_max))
            segs.append({
                "session_id": "s",
                "speaker": f"{prefix}{int(r.integers(0, max(n_spk, 1)))}",
                "start_time": start,
                "end_time": start + float(r.uniform(0.5, 4.0)),
                "words": " ".join(r.choice(words, int(r.integers(0, 4)))),
            })
        return segs

    ref = mk("A", n_ref_spk, n_ref_seg or int(r.integers(1, 5)))
    hyp = mk("h", n_hyp_spk, n_hyp_seg or int(r.integers(0, 5))) \
        if n_hyp_spk else []
    return ref, hyp


# ---------------------------------------------------------------------------
# pure-python matchers (oracle side)
# ---------------------------------------------------------------------------


def py_tclev(ref, hyp, collar):
    """O(nm) time-constrained Levenshtein; ref/hyp = [(id, beg, end), ...].
    collar=None -> plain Levenshtein."""
    n, m = len(ref), len(hyp)
    D = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        D[i][0] = i
    for j in range(m + 1):
        D[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            best = min(D[i - 1][j] + 1, D[i][j - 1] + 1)
            ok = True
            if collar is not None:
                rb, re_ = ref[i - 1][1], ref[i - 1][2]
                hb, he = hyp[j - 1][1] - collar, hyp[j - 1][2] + collar
                ok = hb <= re_ and he >= rb
            if ok:
                cost = 0 if ref[i - 1][0] == hyp[j - 1][0] else 1
                best = min(best, D[i - 1][j - 1] + cost)
            D[i][j] = best
    return D[n][m]


def _drop_empty(streams):
    return {k: v for k, v in streams.items() if v}


def brute_perm_wer(ref_segs, hyp_segs, collar):
    """Exhaustive-permutation tcp/cp oracle -> (errors, length)."""
    vocab = _Vocab()  # ONE vocab: ref and hyp word ids must be comparable
    R = _drop_empty(_streams_with_vocab(ref_segs, "interval", vocab))
    H = _drop_empty(_streams_with_vocab(hyp_segs, "points", vocab))
    rs = [R[k] for k in sorted(R)]
    hs = [H[k] for k in sorted(H)]
    n = max(len(rs), len(hs))
    rs += [[]] * (n - len(rs))
    hs += [[]] * (n - len(hs))
    best = 0 if n == 0 else min(
        sum(py_tclev(rs[i], hs[p[i]], collar) for i in range(n))
        for p in itertools.permutations(range(n)))
    return best, sum(len(v) for v in R.values())


def brute_orc(ref_segs, hyp_segs, collar=None):
    """Exhaustive utterance-assignment ORC oracle -> errors. Reference
    utterances are the non-empty segments in start order; hypothesis
    streams are per-speaker word sequences (points timing when collared,
    matching the engine's tc style)."""
    utts = [
        _segment_word_times(s, "interval")
        for s in sorted(ref_segs, key=lambda x: x["start_time"])
        if str(s["words"]).split()]
    vocab = _Vocab()
    utts = [[(vocab[w], b, e) for w, b, e in u] for u in utts]
    H = _drop_empty(_streams_with_vocab(hyp_segs, "points", vocab))
    hs = [H[k] for k in sorted(H)] or [[]]
    best = None
    for assign in itertools.product(range(len(hs)), repeat=len(utts)):
        total = 0
        for si, h in enumerate(hs):
            cat = [wd for u, a in zip(utts, assign) if a == si for wd in u]
            total += py_tclev(cat, h, collar)
        best = total if best is None else min(best, total)
    return best or 0


def _streams_with_vocab(segs, style, vocab):
    out = {}
    for s in sorted(segs, key=lambda x: x["start_time"]):
        lst = out.setdefault(s["speaker"], [])
        lst.extend((vocab[w], b, e)
                   for w, b, e in _segment_word_times(s, style))
    return out


# ---------------------------------------------------------------------------
# engine vs oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(30))
def test_session_tcp_matches_oracle(seed):
    ref, hyp = gen_session(seed, cjk=(seed % 3 == 0))
    collar = float(np.random.default_rng(seed).choice([0.5, 2.0, 5.0]))
    res = calc_session_tcp_wer(SegLST(ref), SegLST(hyp), collar=collar)
    err, length = brute_perm_wer(ref, hyp, collar)
    assert res["tcp_errors"] == err, (seed, res["tcp_errors"], err)
    assert res["tcp_length"] == length


@pytest.mark.parametrize("seed", range(30, 55))
def test_session_cp_matches_oracle(seed):
    ref, hyp = gen_session(seed, cjk=(seed % 4 == 0))
    res = calc_session_cp_wer(SegLST(ref), SegLST(hyp))
    err, length = brute_perm_wer(ref, hyp, None)
    assert res["cp_errors"] == err, (seed, res["cp_errors"], err)
    assert res["cp_length"] == length


@pytest.mark.parametrize("seed", range(60, 80))
def test_session_orc_matches_oracle(seed):
    ref, hyp = gen_session(seed, cjk=(seed % 5 == 0), n_hyp_spk=3)
    res = calc_session_orc_wer(SegLST(ref), SegLST(hyp))
    assert res["orc_errors"] == brute_orc(ref, hyp), seed


@pytest.mark.parametrize("seed", range(80, 100))
def test_session_tcorc_single_group_matches_oracle(seed):
    """One VAD group, mutually-overlapping hyp streams (so merge_streams is
    a no-op): chunked tcORC must equal the exhaustive time-constrained
    assignment oracle. An anchor segment per hyp speaker overlapping a
    common window plus a ref bridge keeps everything in one group."""
    r = np.random.default_rng(seed)
    ref, hyp = gen_session(seed, n_hyp_spk=2, t_max=8.0)
    ref.append({"session_id": "s", "speaker": "A0", "start_time": 0.0,
                "end_time": 12.0, "words": "bridge"})
    for i in range(2):
        hyp.append({"session_id": "s", "speaker": f"h{i}",
                    "start_time": 5.0, "end_time": 7.0,
                    "words": " ".join(r.choice(LATIN, 2))})
    collar = float(r.choice([2.0, 5.0]))
    res = calc_session_tcorc_wer(SegLST(ref), SegLST(hyp),
                                 group_duration=1000, time_step=0.01,
                                 collar=collar)
    assert res["tcorc_errors"] == brute_orc(ref, hyp, collar=collar), seed


@pytest.mark.parametrize("seed", range(100, 112))
def test_tcorc_split_point_insensitivity(seed):
    """Silence-separated bursts: any group_duration EXCEEDING the burst
    span (so splits can only land in the inter-burst silences — chunking
    WITHIN continuous speech is an approximation by design, the very
    trade meeteval's VAD split makes) must give identical chunked-tcORC
    counts, and every multi-group run must equal the single-group run."""
    bursts = [gen_session(seed * 7 + k, t_max=6.0, n_hyp_spk=2)
              for k in range(3)]
    ref, hyp = [], []
    for k, (r_b, h_b) in enumerate(bursts):
        t0 = 40.0 * k
        for s in r_b:
            ref.append({**s, "start_time": s["start_time"] + t0,
                        "end_time": s["end_time"] + t0})
        for s in h_b:
            hyp.append({**s, "speaker": s["speaker"],
                        "start_time": s["start_time"] + t0,
                        "end_time": s["end_time"] + t0})
        # keep each burst's VAD continuous (splits then land only in the
        # 40 s inter-burst silences, far beyond the collar) and make the
        # hyp streams overlap inside EVERY burst (stream merging — itself
        # a cost-bounding approximation — stays a no-op for any grouping)
        ref.append({"session_id": "s", "speaker": "A0", "start_time": t0,
                    "end_time": t0 + 11.0, "words": "bridge"})
        for i in range(2):
            hyp.append({"session_id": "s", "speaker": f"h{i}",
                        "start_time": t0 + 5.0, "end_time": t0 + 7.0,
                        "words": "anchor"})
    # burst span <= t_max + max seg dur = 10 s < every gd here
    results = [
        calc_session_tcorc_wer(SegLST(ref), SegLST(hyp),
                               group_duration=gd, time_step=0.01, collar=5)
        for gd in (12, 25, 41, 10_000)]
    for res in results[1:]:
        for k in ("tcorc_errors", "tcorc_length", "tcorc_insertions",
                  "tcorc_deletions", "tcorc_substitutions"):
            assert res[k] == results[0][k], (seed, k)


@pytest.mark.parametrize("seed", range(112, 124))
def test_orc_chunked_fallback_matches_exact(seed, monkeypatch):
    """Randomized version of the silence-split ORC fallback check: with the
    DP guard shrunk so chunking engages, counts must match the exact
    whole-session run on silence-separated sessions."""
    import ts_asr_whisper_tpu.eval.orc as orc_mod

    ref, hyp = [], []
    for k in range(2):
        r_b, h_b = gen_session(seed * 13 + k, t_max=6.0, n_hyp_spk=2,
                               n_ref_seg=3, n_hyp_seg=3)
        for s in r_b:
            ref.append({**s, "start_time": s["start_time"] + 60.0 * k,
                        "end_time": s["end_time"] + 60.0 * k})
        for s in h_b:
            hyp.append({**s, "start_time": s["start_time"] + 60.0 * k,
                        "end_time": s["end_time"] + 60.0 * k})
    exact = calc_session_orc_wer(SegLST(ref), SegLST(hyp))
    monkeypatch.setattr(orc_mod, "MAX_GRID_CELLS", 200)
    chunked = calc_session_orc_wer(SegLST(ref), SegLST(hyp))
    for k in ("orc_errors", "orc_length", "orc_insertions",
              "orc_deletions", "orc_substitutions"):
        assert chunked[k] == exact[k], (seed, k)


# ---------------------------------------------------------------------------
# metamorphic properties
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(124, 139))
def test_collar_monotone_and_tcp_dominates_cp(seed):
    ref, hyp = gen_session(seed)
    errs = [calc_session_tcp_wer(SegLST(ref), SegLST(hyp), collar=c)
            ["tcp_errors"] for c in (0.5, 2.0, 5.0, 30.0)]
    assert errs == sorted(errs, reverse=True), (seed, errs)
    cp = calc_session_cp_wer(SegLST(ref), SegLST(hyp))["cp_errors"]
    # the time constraint can only add errors; at huge collar they converge
    assert errs[0] >= cp
    assert errs[-1] == cp, (seed, errs[-1], cp)
    tc_errs = [calc_session_tcorc_wer(SegLST(ref), SegLST(hyp),
                                      group_duration=10_000, collar=c)
               ["tcorc_errors"] for c in (0.5, 5.0, 30.0)]
    assert tc_errs == sorted(tc_errs, reverse=True), (seed, tc_errs)


@pytest.mark.parametrize("seed", range(139, 154))
def test_relabel_and_reorder_invariance(seed):
    """Renaming hyp speakers and shuffling BOTH segment lists changes no
    count in any engine (the input-order independence the round-2 advisor
    flagged for chunked assignments)."""
    r = np.random.default_rng(seed)
    ref, hyp = gen_session(seed, n_hyp_spk=3)

    def scores(ref_segs, hyp_segs):
        ref_l, hyp_l = SegLST(ref_segs), SegLST(hyp_segs)
        out = {}
        out.update(calc_session_tcp_wer(ref_l, hyp_l, collar=5))
        out.update(calc_session_cp_wer(ref_l, hyp_l))
        out.update(calc_session_orc_wer(ref_l, hyp_l))
        out.update(calc_session_tcorc_wer(ref_l, hyp_l, group_duration=5,
                                          collar=5))
        return {k: v for k, v in out.items()
                if not k.endswith("assignment")}

    base = scores(ref, hyp)
    relabeled = [{**s, "speaker": f"z{s['speaker']}"} for s in hyp]
    r.shuffle(relabeled)
    ref2 = list(ref)
    r.shuffle(ref2)
    assert scores(ref2, relabeled) == base, seed


@pytest.mark.parametrize("seed", range(154, 162))
def test_orc_assignment_follows_input_order(seed):
    """orc_assignment is indexed by the filtered INPUT segment order, not
    the internal time-sorted order: shuffling the ref list permutes the
    assignment the same way."""
    r = np.random.default_rng(seed)
    ref, hyp = gen_session(seed, n_hyp_spk=2, n_ref_seg=4)
    ref = [s for s in ref if str(s["words"]).split()]
    if len(ref) < 2:
        pytest.skip("degenerate draw")
    # distinct start times so the time order is unambiguous
    for i, s in enumerate(ref):
        s["start_time"] = float(i) + r.uniform(0, 0.5)
        s["end_time"] = s["start_time"] + 1.0
    base = calc_session_orc_wer(SegLST(ref), SegLST(hyp))
    perm = r.permutation(len(ref))
    shuffled = [ref[i] for i in perm]
    res = calc_session_orc_wer(SegLST(shuffled), SegLST(hyp))
    assert res["orc_errors"] == base["orc_errors"]
    for new_pos, old_pos in enumerate(perm):
        assert res["orc_assignment"][new_pos] == \
            base["orc_assignment"][old_pos], seed


@pytest.mark.parametrize("cjk", [False, True])
def test_perfect_hypothesis_is_zero_errors(cjk):
    ref, _ = gen_session(777, cjk=cjk, n_ref_spk=3, n_ref_seg=6)
    ref = [s for s in ref if str(s["words"]).split()]
    hyp = [dict(s) for s in ref]
    ref_l, hyp_l = SegLST(ref), SegLST(hyp)
    assert calc_session_tcp_wer(ref_l, hyp_l, collar=5)["tcp_errors"] == 0
    assert calc_session_cp_wer(ref_l, hyp_l)["cp_errors"] == 0
    assert calc_session_orc_wer(ref_l, hyp_l)["orc_errors"] == 0
    assert calc_session_tcorc_wer(ref_l, hyp_l, group_duration=5,
                                  collar=5)["tcorc_errors"] == 0


def test_empty_and_extra_streams_edge_cases():
    """Empty hypothesis, hyp-only speakers, whitespace-only segments."""
    ref = [{"session_id": "s", "speaker": "A", "start_time": 0.0,
            "end_time": 2.0, "words": "one two"}]
    ghost = [{"session_id": "s", "speaker": "g", "start_time": 0.0,
              "end_time": 1.0, "words": "   "}]
    extra = [{"session_id": "s", "speaker": "x", "start_time": 0.0,
              "end_time": 1.0, "words": "zzz"}]
    hyp_match = [dict(ref[0], speaker="h")]

    for r_l, h_l, want in [
        (ref, [], 2),                       # all deletions
        (ref, ghost, 2),                    # whitespace stream is filtered
        (ref, hyp_match + extra, 1),        # extra stream = insertions
        (ref + ghost, hyp_match, 0),        # ghost ref stream is filtered
    ]:
        res = calc_session_tcp_wer(SegLST(list(r_l)), SegLST(list(h_l)),
                                   collar=5)
        assert res["tcp_errors"] == want, (r_l, h_l)
        orc = calc_session_orc_wer(SegLST(list(r_l)), SegLST(list(h_l)))
        assert orc["orc_errors"] == want
        tco = calc_session_tcorc_wer(SegLST(list(r_l)), SegLST(list(h_l)),
                                     group_duration=5, collar=5)
        assert tco["tcorc_errors"] == want
