"""Candidate-restricted psi (ops/psi_gather.py) vs the full-vocab matmul.

The DMA-gather path must produce the SAME scattered psi tensor as
``where(cand_mask, ctc_psi_matmul(...)[:, :v_dec], LOG_ZERO)`` — it is a
traffic optimization, not an approximation. On CPU the kernel runs in
interpret mode with an fp32 posterior, so the comparison is tight.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ts_asr_whisper_tpu.ops.ctc_prefix import (
    LOG_ZERO,
    ctc_psi_matmul,
    initial_ctc_state,
)
from ts_asr_whisper_tpu.ops.psi_gather import (
    ctc_psi_candidates,
    extract_topk_ids,
    fold_posterior,
    fold_weights,
    folded_len,
    gather_rows,
)


def test_extract_topk_ids_matches_numpy(rng):
    v = 700
    for bb, k_pad, popcount in ((4, 128, 37), (3, 8, 8), (2, 16, 1)):
        mask = np.zeros((bb, v), bool)
        for b in range(bb):
            mask[b, rng.choice(v, size=popcount, replace=False)] = True
        ids = np.asarray(extract_topk_ids(jnp.asarray(mask), k_pad))
        assert ids.shape == (bb, k_pad)
        for b in range(bb):
            want = np.flatnonzero(mask[b])
            got = ids[b][: len(want)]
            assert (got == want).all()
            # pad slots clamp to a valid row id
            assert (ids[b][len(want):] == v - 1).all()


def test_extract_topk_ids_small_vocab_one_block(rng):
    # vocab smaller than the block size exercises the nb=1 corner
    mask = np.zeros((2, 40), bool)
    mask[0, [0, 39]] = True
    mask[1, [5]] = True
    ids = np.asarray(extract_topk_ids(jnp.asarray(mask), 8))
    assert list(ids[0][:2]) == [0, 39]
    assert ids[1][0] == 5
    assert (ids[:, 2:] == 39).all()


def test_fold_roundtrip(rng):
    b, v, t = 2, 12, 300
    p = jnp.asarray(rng.standard_normal((b, v, t)), jnp.float32)
    p4 = fold_posterior(p)
    tp = folded_len(t)
    assert p4.shape == (b, v, 8, tp // 8)
    flat = np.asarray(p4).reshape(b, v, tp)
    assert np.allclose(flat[..., :t], np.asarray(p))
    assert (flat[..., t:] == 0).all()
    w = jnp.asarray(rng.standard_normal((5, t)), jnp.float32)
    w4 = fold_weights(w, tp // 8)
    assert np.allclose(np.asarray(w4).reshape(5, tp)[:, :t], np.asarray(w))


def test_gather_rows_interpret(rng):
    b_audio, v, t = 2, 64, 40
    p = jnp.asarray(rng.standard_normal((b_audio, v, t)), jnp.float32)
    p4 = fold_posterior(p)
    cand = jnp.asarray(rng.integers(0, v, size=(6, 16)), jnp.int32)
    aidx = jnp.asarray(np.arange(6) // 3, jnp.int32)
    out = np.asarray(gather_rows(cand, aidx, p4, interpret=True))
    want = np.asarray(p4)[np.asarray(aidx)[:, None], np.asarray(cand)]
    assert np.array_equal(out, want)


def _random_psi_problem(rng, b_audio=2, n=3, t=50, v=90, blank=None,
                        eos=3):
    blank = v - 1 if blank is None else blank
    bb = b_audio * n
    logits = rng.standard_normal((b_audio, t, v)).astype(np.float32) * 2
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    r0, _ = initial_ctc_state(logp, blank)
    audio_idx = jnp.arange(bb) // n
    # advance some prefixes to make r_prev/decoded_len/last_label diverse
    r_prev = jnp.asarray(
        np.where(rng.random((bb, t, 2)) < 0.1, LOG_ZERO,
                 rng.standard_normal((bb, t, 2)) * 2 - 6), jnp.float32)
    r_prev = jnp.where((jnp.arange(bb) % 3 == 0)[:, None, None],
                       r0[audio_idx], r_prev)
    decoded_len = jnp.asarray(rng.integers(0, 5, size=bb), jnp.int32)
    decoded_len = decoded_len.at[0].set(0)
    last_label = jnp.asarray(rng.integers(0, v - 1, size=bb), jnp.int32)
    return logp, audio_idx, r_prev, decoded_len, last_label, blank, eos


@pytest.mark.parametrize("k_bits", [10, 31])
def test_ctc_psi_candidates_matches_masked_matmul(rng, k_bits):
    logp, audio_idx, r_prev, decoded_len, last_label, blank, eos = \
        _random_psi_problem(rng)
    bb = r_prev.shape[0]
    v = logp.shape[-1]
    v_dec = v - 1

    # candidate mask: k_bits random text tokens + eos, like the rescorer's
    mask = np.zeros((bb, v_dec), bool)
    for b in range(bb):
        mask[b, rng.choice(v_dec, size=k_bits, replace=False)] = True
        mask[b, eos] = True
        # force the last-label column into some masks (correction path)
        if b % 2 == 0:
            mask[b, int(last_label[b])] = True
    cand_mask = jnp.asarray(mask)

    logp_vt = jnp.swapaxes(logp, 1, 2)
    xl = logp_vt[audio_idx, last_label]
    p_tv = jnp.exp(logp)
    psi_all = ctc_psi_matmul(p_tv, xl, r_prev, decoded_len, last_label,
                             blank, eos)
    want = jnp.where(cand_mask, psi_all[:, :v_dec], LOG_ZERO)

    p4 = fold_posterior(jnp.exp(logp_vt))
    k_pad = -(-(k_bits + 2) // 8) * 8
    got = ctc_psi_candidates(p4, cand_mask, audio_idx, xl, r_prev,
                             decoded_len, last_label, eos, k_pad=k_pad,
                             interpret=True)

    want_np, got_np = np.asarray(want), np.asarray(got)
    # identical sparsity pattern
    assert ((want_np <= LOG_ZERO / 2) == (got_np <= LOG_ZERO / 2)).all()
    live = want_np > LOG_ZERO / 2
    assert np.allclose(got_np[live], want_np[live], rtol=2e-5, atol=2e-5)
    # eos column is the exact full-prefix probability in both
    assert np.allclose(got_np[:, eos], want_np[:, eos], rtol=1e-6)


def test_rescorer_gather_vs_matmul_end_to_end(rng):
    """Force psi_impl='gather' (interpret mode on CPU) through the real
    rescorer and compare fused scores against the matmul path."""
    from ts_asr_whisper_tpu.decoding.ctc_rescorer import (
        CTCRescorer, init_ctc_state)

    b_audio, n, t, v = 2, 2, 40, 80
    blank, eos, ts_begin = v - 1, 3, 60
    enc_logits = jnp.asarray(
        rng.standard_normal((b_audio, t, v)).astype(np.float32) * 2)
    scorer = CTCRescorer(blank_id=blank, eos_id=eos,
                         timestamp_begin=ts_begin, ctc_weight=0.3,
                         k=12, prefix_len=3)

    states = {}
    for impl in ("matmul", "gather"):
        states[impl] = init_ctc_state(enc_logits, blank, None,
                                      num_beams=n, k=scorer.k,
                                      psi_impl=impl)
    assert states["matmul"].p_tv is not None and states["matmul"].p4 is None
    assert states["gather"].p4 is not None and states["gather"].p_tv is None

    bb = b_audio * n
    tokens = jnp.asarray(rng.integers(0, ts_begin, size=(bb, 10)),
                         jnp.int32)
    cur_len = jnp.asarray(6, jnp.int32)
    scores = jnp.asarray(
        jax.nn.log_softmax(jnp.asarray(
            rng.standard_normal((bb, v - 1)).astype(np.float32)), axis=-1))

    fused = {}
    new_states = {}
    for impl, st in states.items():
        fused[impl], new_states[impl] = scorer.rescore(
            st, tokens, cur_len, scores)
    f_m, f_g = np.asarray(fused["matmul"]), np.asarray(fused["gather"])
    assert np.allclose(f_m, f_g, rtol=2e-5, atol=2e-5)

    # downstream state advance agrees too
    nxt = jnp.asarray(rng.integers(0, ts_begin, size=(bb,)), jnp.int32)
    upd_m = scorer.update_state(new_states["matmul"], nxt, None)
    upd_g = scorer.update_state(new_states["gather"], nxt, None)
    assert np.allclose(np.asarray(upd_m.r_prev), np.asarray(upd_g.r_prev),
                       rtol=1e-5, atol=1e-5)
    assert np.allclose(np.asarray(upd_m.score_prev),
                       np.asarray(upd_g.score_prev), rtol=1e-5, atol=1e-5)


def test_resolve_psi_impl():
    from ts_asr_whisper_tpu.decoding.ctc_rescorer import resolve_psi_impl

    # CPU test session: auto must pick the matmul (kernel would interpret)
    assert resolve_psi_impl("auto") == "matmul"
    assert resolve_psi_impl("matmul") == "matmul"
    assert resolve_psi_impl("gather") == "gather"
    with pytest.raises(AssertionError):
        resolve_psi_impl("nope")
