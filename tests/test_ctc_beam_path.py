"""Beam-mode CTC rescoring path (probability-domain psi matmul +
sort-free threshold candidate selection) validated against the n=1 gather
path, which is itself token-exact vs the reference
CTCRescorerLogitsProcessor (test_joint_ctc_decode.py). The two paths share
no scoring code — ctc_psi_matmul vs ctc_prefix_scores_from_xs — so
agreement here transitively pins the headline beam-joint decode to the
reference semantics (the reference's own generate() is not drivable for
beam+CTC under the installed transformers, see
test_longform_full_parity.py::test_longform_full_parity_joint_ctc)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ts_asr_whisper_tpu.decoding.ctc_rescorer import (
    CTCRescorer,
    init_ctc_state,
)
from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
from ts_asr_whisper_tpu.decoding.beam import beam_search
from ts_asr_whisper_tpu.models.config import DiCoWConfig
from ts_asr_whisper_tpu.models.dicow import init_dicow
from ts_asr_whisper_tpu.ops.ctc_prefix import kth_largest_keys

V = 1700
TS_BEGIN = V - 1501
NO_TS = TS_BEGIN - 1
EOS = 30
SOT = 31
LANG = 32
TASK = 33


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_kth_largest_keys_matches_sort(rng):
    for seed in range(5):
        r = np.random.default_rng(seed)
        x = (r.standard_normal((4, 337)) * 10).astype(np.float32)
        # exact ties + the NEG_INF masses a processor chain produces
        x[:, 50:70] = np.float32(np.finfo(np.float32).min)
        x[1, 3] = x[1, 4] = x[1, 5]
        for k in (1, 7, 64, 300, 337):
            keys, kth = jax.jit(kth_largest_keys, static_argnums=1)(
                jnp.asarray(x), k)
            keys = np.asarray(keys)
            kth = np.asarray(kth)
            srt = np.sort(keys, axis=1)[:, ::-1]
            np.testing.assert_array_equal(kth, srt[:, k - 1])
            assert ((keys >= kth[:, None]).sum(axis=1) >= k).all()


def _scorer_and_states(rng, b_audio=2, n=2, t=40, k=None):
    blank = V  # ctc vocab = V + 1
    enc_logits = (rng.standard_normal((b_audio, t, V + 1)) * 2).astype(
        np.float32)
    k = k if k is not None else TS_BEGIN
    scorer = CTCRescorer(blank_id=blank, eos_id=EOS, timestamp_begin=TS_BEGIN,
                         ctc_weight=0.3, k=k, prefix_len=3)
    state_m = init_ctc_state(jnp.asarray(enc_logits), blank, None,
                             num_beams=n, k=k)
    assert state_m.p_tv is not None
    state_g = state_m._replace(p_tv=None,          # forces the gather path
                               cand_ids=jnp.zeros((b_audio * n, k),
                                                  jnp.int32))
    return scorer, state_m, state_g


def test_matmul_rescore_matches_gather(rng):
    """Fused scores from the two scoring paths agree (all tokens candidates
    so the eos-slot bookkeeping difference is out of play)."""
    scorer, state_m, state_g = _scorer_and_states(rng)
    bb = 4
    buf_len = 12
    tokens = np.full((bb, buf_len), EOS, np.int32)
    tokens[:, 0] = SOT
    tokens[:, 1] = LANG
    tokens[:, 2] = TASK
    tokens[:, 3] = rng.integers(34, 150, bb)
    tokens[:, 4] = TS_BEGIN + 5
    scores = jnp.asarray(
        (rng.standard_normal((bb, V)) * 3).astype(np.float32))
    scores = jax.nn.log_softmax(scores, axis=-1)
    cur_len = jnp.asarray(5, jnp.int32)

    fused_m, st_m = scorer.rescore(state_m, jnp.asarray(tokens), cur_len,
                                   scores)
    fused_g, st_g = scorer.rescore(state_g, jnp.asarray(tokens), cur_len,
                                   scores)
    np.testing.assert_allclose(np.asarray(fused_m), np.asarray(fused_g),
                               rtol=2e-4, atol=2e-4)

    # state advance after a text token: identical (both use the exact
    # log-domain alpha recursion)
    nxt = jnp.asarray(rng.integers(34, 150, bb), jnp.int32)
    up_m = scorer.update_state(st_m, nxt, jnp.arange(bb))
    up_g = scorer.update_state(st_g, nxt, jnp.arange(bb))
    np.testing.assert_allclose(np.asarray(up_m.r_prev),
                               np.asarray(up_g.r_prev), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(up_m.score_prev),
                               np.asarray(up_g.score_prev), rtol=1e-5,
                               atol=1e-5)

    # candidate bookkeeping: the mask is exactly the top-k id set
    mask = np.asarray(st_m.cand_ids)
    ids = np.asarray(st_g.cand_ids)
    for row in range(bb):
        np.testing.assert_array_equal(
            np.sort(np.where(mask[row])[0]),
            np.sort(np.unique(np.concatenate([ids[row], [EOS]]))))


CFG_KW = dict(vocab_size=V, num_mel_bins=24, d_model=64, encoder_layers=2,
              decoder_layers=2, encoder_attention_heads=4,
              decoder_attention_heads=4, encoder_ffn_dim=128,
              decoder_ffn_dim=128, max_source_positions=48,
              max_target_positions=64, decoder_start_token_id=SOT,
              eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
              dtype="float32", ctc_weight=0.3, use_fddt=True)


@pytest.mark.parametrize("k_mode,seed", [("full", 3), ("partial", 3),
                                         ("partial", 11), ("partial", 29)])
def test_beam_joint_full_loop_paths_agree(rng, k_mode, seed):
    """End-to-end beam_search with joint CTC: the matmul/threshold path and
    the gather path produce identical token sequences."""
    cfg = DiCoWConfig(**CFG_KW)
    params = init_dicow(jax.random.PRNGKey(seed), cfg)
    b, n = 2, 3
    enc = jnp.asarray(rng.standard_normal((b, 24, 64)).astype(np.float32))
    from ts_asr_whisper_tpu.models.dicow import (
        dicow_encoder_forward,
        encoder_ctc_logits,
    )

    stno = jnp.asarray(
        (rng.random((b, 4, 24))).astype(np.float32))
    hidden = dicow_encoder_forward(params["encoder"], cfg,
                                   jnp.asarray(rng.standard_normal(
                                       (b, 24, 48)).astype(np.float32)),
                                   stno[:, :, :24])
    enc_logits = encoder_ctc_logits(params["encoder"], cfg, hidden)

    k = TS_BEGIN if k_mode == "full" else TS_BEGIN - 20
    blank = cfg.ctc_vocab_size - 1
    gen = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=48, suppress_tokens=(),
        begin_suppress_tokens=(), num_beams=n, ctc_weight=0.3,
        length_penalty=1.0)
    scorer = CTCRescorer(blank_id=blank, eos_id=EOS,
                         timestamp_begin=TS_BEGIN, ctc_weight=0.3, k=k,
                         prefix_len=3)
    prompts = jnp.asarray(np.array([[SOT, LANG, TASK]] * b, np.int32))

    state = init_ctc_state(enc_logits, blank, None, num_beams=n, k=k)
    out_m = beam_search(params, cfg, gen, hidden, prompts, 20, num_beams=n,
                        ctc_scorer=scorer, ctc_state=state)
    state_g = state._replace(p_tv=None,
                             cand_ids=jnp.zeros((b * n, k), jnp.int32))
    out_g = beam_search(params, cfg, gen, hidden, prompts, 20, num_beams=n,
                        ctc_scorer=scorer, ctc_state=state_g)
    np.testing.assert_array_equal(np.asarray(out_m.sequences),
                                  np.asarray(out_g.sequences))
    np.testing.assert_allclose(np.asarray(out_m.scores),
                               np.asarray(out_g.scores), rtol=1e-4,
                               atol=1e-4)


def test_bf16_posterior_close_to_fp32(rng):
    """ctc_p_bf16 (init_ctc_state p_bf16=True) halves the beam psi
    matmul's HBM-resident posterior; with fp32 accumulation the fused
    scores stay within bf16 input precision of the exact path."""
    scorer, state_m, _ = _scorer_and_states(rng)
    state_b = state_m._replace(p_tv=state_m.p_tv.astype(jnp.bfloat16))
    bb = 4
    tokens = np.full((bb, 12), EOS, np.int32)
    tokens[:, 0] = SOT
    tokens[:, 1] = LANG
    tokens[:, 2] = TASK
    tokens[:, 3] = rng.integers(34, 150, bb)
    scores = jax.nn.log_softmax(jnp.asarray(
        (rng.standard_normal((bb, V)) * 3).astype(np.float32)), axis=-1)
    cur_len = jnp.asarray(4, jnp.int32)
    fused_f, _ = scorer.rescore(state_m, jnp.asarray(tokens), cur_len, scores)
    fused_b, _ = scorer.rescore(state_b, jnp.asarray(tokens), cur_len, scores)
    f, b_ = np.asarray(fused_f), np.asarray(fused_b)
    # compare where the fused score is not dominated by the -inf candidate
    # floor; bf16 mantissa is 8 bits -> ~0.01 absolute in log space here
    sel = f > -50
    assert sel.any()
    np.testing.assert_allclose(b_[sel], f[sel], atol=0.02, rtol=0.01)

    # the constructor flag produces the bf16 posterior
    enc = jnp.asarray(rng.standard_normal((2, 40, V + 1)).astype(np.float32))
    st = init_ctc_state(enc, V, None, num_beams=2, p_bf16=True)
    assert st.p_tv.dtype == jnp.bfloat16
