"""WER engines: hand-verified cases for tcpWER/cpWER/ORC + native kernel."""

import numpy as np

from ts_asr_whisper_tpu.eval.native import (
    levenshtein,
    time_constrained_levenshtein,
)
from ts_asr_whisper_tpu.eval.seglst import SegLST
from ts_asr_whisper_tpu.eval.wer import (
    aggregate_wer_metrics,
    calc_session_cp_wer,
    calc_session_orc_wer,
    calc_session_tcp_wer,
    calc_session_tcorc_wer,
)


def seg(spk, start, end, words, session="s1"):
    return {"session_id": session, "speaker": spk, "start_time": start,
            "end_time": end, "words": words}


def test_native_levenshtein():
    err, c = levenshtein(np.array([1, 2, 3, 4]), np.array([1, 9, 3]))
    # sub at pos 2, del of 4
    assert err == 2
    assert c == {"insertions": 0, "deletions": 1, "substitutions": 1}
    err, c = levenshtein(np.array([], dtype=np.int32), np.array([5, 6]))
    assert err == 2 and c["insertions"] == 2


def test_native_tclev_collar():
    ref = np.array([1, 2]), np.array([0.0, 10.0]), np.array([1.0, 11.0])
    # same words but hyp at wrong times (points)
    hyp = np.array([1, 2]), np.array([30.0, 40.0]), np.array([30.0, 40.0])
    err, c = time_constrained_levenshtein(*ref, *hyp, collar=5.0)
    assert err == 4  # 2 deletions + 2 insertions: matches disallowed
    err, _ = time_constrained_levenshtein(*ref, *hyp, collar=100.0)
    assert err == 0


def test_tcp_wer_perfect():
    ref = SegLST([seg("A", 0, 2, "hello world"), seg("B", 3, 5, "good day")])
    hyp = SegLST([seg("spk0", 0, 2, "hello world"), seg("spk1", 3, 5, "good day")])
    res = calc_session_tcp_wer(ref, hyp, collar=5)
    assert res["tcp_wer"] == 0.0
    assert res["tcp_length"] == 4
    assert res["tcp_missed_speaker"] == 0


def test_cp_wer_permutation_invariance():
    ref = SegLST([seg("A", 0, 2, "a b c"), seg("B", 3, 5, "x y")])
    hyp = SegLST([seg("1", 0, 2, "x y"), seg("2", 3, 5, "a b c")])
    res = calc_session_cp_wer(ref, hyp)
    assert res["cp_wer"] == 0.0


def test_tcp_wer_substitution_and_rate():
    ref = SegLST([seg("A", 0, 4, "the cat sat down")])
    hyp = SegLST([seg("h", 0, 4, "the dog sat down")])
    res = calc_session_tcp_wer(ref, hyp, collar=5)
    assert res["tcp_errors"] == 1
    assert res["tcp_substitutions"] == 1
    assert abs(res["tcp_wer"] - 0.25) < 1e-9


def test_tcp_wer_time_constraint_bites():
    # right words, 60 s late -> collar 5 forbids matching
    ref = SegLST([seg("A", 0, 2, "hello world")])
    hyp = SegLST([seg("h", 60, 62, "hello world")])
    res = calc_session_tcp_wer(ref, hyp, collar=5)
    assert res["tcp_errors"] == 4  # 2 del + 2 ins
    res_cp = calc_session_cp_wer(ref, hyp)
    assert res_cp["cp_errors"] == 0


def test_tcp_wer_missed_and_falarm_speakers():
    ref = SegLST([seg("A", 0, 2, "one two"), seg("B", 3, 5, "three")])
    hyp = SegLST([seg("h", 0, 2, "one two")])
    res = calc_session_tcp_wer(ref, hyp, collar=5)
    assert res["tcp_missed_speaker"] == 1
    assert res["tcp_errors"] == 1  # 'three' deleted
    hyp2 = SegLST([seg("h1", 0, 2, "one two"), seg("h2", 3, 5, "three"),
                   seg("h3", 6, 8, "ghost words here")])
    res2 = calc_session_tcp_wer(ref, hyp2, collar=5)
    assert res2["tcp_falarm_speaker"] == 1
    assert res2["tcp_errors"] == 3  # 3 inserted ghost words


def test_orc_wer_stream_assignment():
    ref = SegLST([seg("A", 0, 2, "alpha beta"), seg("B", 1, 3, "gamma")])
    # one hyp stream got both in order, second got nothing relevant
    hyp = SegLST([seg("s0", 0, 2, "alpha beta"), seg("s1", 1, 3, "gamma")])
    res = calc_session_orc_wer(ref, hyp)
    assert res["orc_wer"] == 0.0


def test_tcorc_chunked_runs():
    ref = SegLST([seg("A", 0, 2, "a b"), seg("B", 10, 12, "c d"),
                  seg("A", 20, 22, "e")])
    hyp = SegLST([seg("x", 0, 2, "a b"), seg("y", 10, 12, "c d"),
                  seg("x", 20, 22, "e")])
    res = calc_session_tcorc_wer(ref, hyp, group_duration=5, time_step=0.01,
                                 collar=5)
    assert res["tcorc_wer"] == 0.0
    assert res["tcorc_length"] == 5


def test_aggregation():
    rows = [
        {"session_id": "a", "tcp_errors": 2, "tcp_length": 10,
         "tcp_wer": 0.2, "tcp_missed_speaker": 1, "tcp_falarm_speaker": 0,
         "tcp_scored_speaker": 2},
        {"session_id": "b", "tcp_errors": 1, "tcp_length": 10,
         "tcp_wer": 0.1, "tcp_missed_speaker": 0, "tcp_falarm_speaker": 1,
         "tcp_scored_speaker": 2},
    ]
    agg = aggregate_wer_metrics(rows, ["tcp_wer"])
    assert abs(agg["tcp_wer"] - 0.15) < 1e-9
    assert agg["tcp_mean_missed_speaker"] == 0.5


def test_tcp_wer_collar_edge():
    """A hyp word point exactly collar seconds outside the ref interval is
    still matchable (inclusive overlap)."""
    ref = SegLST([seg("A", 10.0, 12.0, "word")])
    # hyp point at 17.0 => interval [12.0, 22.0] with collar 5 touches ref end
    hyp = SegLST([seg("h", 16.0, 18.0, "word")])
    res = calc_session_tcp_wer(ref, hyp, collar=5)
    assert res["tcp_errors"] == 0
    # collar 4.9 -> point 17.0 extends to [12.1, 21.9]: no overlap with ref
    res2 = calc_session_tcp_wer(ref, hyp, collar=4.9)
    assert res2["tcp_errors"] == 2


def test_character_proportional_word_timing():
    """Longer words get proportionally longer pseudo intervals."""
    from ts_asr_whisper_tpu.eval.wer import _segment_word_times

    times = _segment_word_times(
        {"words": "a bcdef", "start_time": 0.0, "end_time": 7.0}, "interval")
    (w1, b1, e1), (w2, b2, e2) = times
    assert abs((e1 - b1) - 7.0 / 6) < 1e-9        # 'a': 1 of 6 chars
    assert abs((e2 - b2) - 7.0 * 5 / 6) < 1e-9    # 'bcdef': 5 of 6 chars
    pts = _segment_word_times(
        {"words": "a bcdef", "start_time": 0.0, "end_time": 7.0}, "points")
    assert pts[0][1] == pts[0][2]  # points collapse


def test_tcp_wer_empty_hypothesis():
    ref = SegLST([seg("A", 0, 2, "one two three")])
    hyp = SegLST([])
    res = calc_session_tcp_wer(ref, hyp, collar=5)
    assert res["tcp_errors"] == 3 and res["tcp_deletions"] == 3
    assert res["tcp_wer"] == 1.0


def _brute_force_tcp(ref_segs, hyp_segs, collar):
    """Exhaustive-permutation tcpWER oracle for tiny sessions: pure-python
    time-constrained DP + all ref->hyp speaker assignments."""
    import itertools

    from ts_asr_whisper_tpu.eval.wer import _Vocab, _segment_word_times

    vocab = _Vocab()

    def streams(segs, style):
        out = {}
        for s in sorted(segs, key=lambda x: x["start_time"]):
            words = _segment_word_times(s, style)
            lst = out.setdefault(s["speaker"], [])
            lst.extend((vocab[w], b, e) for w, b, e in words)
        return out

    def tclev(ref, hyp):
        n, m = len(ref), len(hyp)
        D = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(n + 1):
            D[i][0] = i
        for j in range(m + 1):
            D[0][j] = j
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                best = min(D[i - 1][j] + 1, D[i][j - 1] + 1)
                rb, re_ = ref[i - 1][1], ref[i - 1][2]
                hb, he = hyp[j - 1][1] - collar, hyp[j - 1][2] + collar
                if hb <= re_ and he >= rb:
                    cost = 0 if ref[i - 1][0] == hyp[j - 1][0] else 1
                    best = min(best, D[i - 1][j - 1] + cost)
                D[i][j] = best
        return D[n][m]

    R = streams(ref_segs, "interval")
    H = streams(hyp_segs, "points")
    rk, hk = sorted(R), sorted(H)
    n = max(len(rk), len(hk))
    rs = [R[k] for k in rk] + [[]] * (n - len(rk))
    hs = [H[k] for k in hk] + [[]] * (n - len(hk))
    best = None
    for perm in itertools.permutations(range(n)):
        total = sum(tclev(rs[i], hs[perm[i]]) for i in range(n))
        best = total if best is None else min(best, total)
    length = sum(len(R[k]) for k in rk)
    return best, length


def test_tcp_wer_matches_brute_force(rng):
    """Randomized sessions: the C++ matcher + Hungarian assignment must equal
    the exhaustive-permutation pure-python oracle."""
    words = ["a", "b", "c", "d", "e"]
    for trial in range(10):
        r = np.random.default_rng(trial)

        def mk(prefix, n_spk, n_seg):
            segs = []
            t = 0.0
            for i in range(n_seg):
                txt = " ".join(r.choice(words, int(r.integers(1, 4))))
                segs.append(seg(f"{prefix}{int(r.integers(0, n_spk))}",
                                t, t + 2.0, txt))
                t += float(r.uniform(1.0, 4.0))
            return segs

        ref_segs = mk("A", 2, 4)
        hyp_segs = mk("h", 3, 4)
        res = calc_session_tcp_wer(SegLST(ref_segs), SegLST(hyp_segs), collar=2)
        bf_err, bf_len = _brute_force_tcp(ref_segs, hyp_segs, collar=2)
        assert res["tcp_errors"] == bf_err, (trial, res["tcp_errors"], bf_err)
        assert res["tcp_length"] == bf_len
