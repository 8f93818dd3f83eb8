"""Greedy decode: logits-processor parity vs HF torch + free-run equality
against a hand-rolled torch greedy oracle on the reference DiCoW model."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import GenerationConfig as HFGenerationConfig  # noqa: E402
from transformers.generation.logits_process import (  # noqa: E402
    SuppressTokensLogitsProcessor,
)

from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig  # noqa: E402
from ts_asr_whisper_tpu.decoding.greedy import greedy_decode  # noqa: E402
from ts_asr_whisper_tpu.decoding.logits_process import make_logits_processor  # noqa: E402
from ts_asr_whisper_tpu.models.config import DiCoWConfig  # noqa: E402
from ts_asr_whisper_tpu.models.convert import params_from_torch_model  # noqa: E402

from oracles import load_reference_dicow

RefConfig, RefModel = load_reference_dicow()

V = 1700
TS_BEGIN = V - 1501          # <|0.00|>
NO_TS = TS_BEGIN - 1         # <|notimestamps|>
EOS = 30
SOT = 31
SUPPRESS = (5, 6, 7, 100)

BASE_KW = dict(
    vocab_size=V,
    num_mel_bins=24,
    d_model=64,
    encoder_layers=2,
    decoder_layers=2,
    encoder_attention_heads=4,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    max_source_positions=48,
    max_target_positions=64,
    decoder_start_token_id=SOT,
    eos_token_id=EOS,
    pad_token_id=EOS,
    bos_token_id=EOS,
)


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(3)
    ref_cfg = RefConfig(**BASE_KW, use_fddt=True, use_pre_pos_fddt=True,
                        fddt_init="random", ctc_weight=0.0)
    ref = RefModel(ref_cfg).eval()
    cfg = DiCoWConfig(**BASE_KW, use_fddt=True, use_pre_pos_fddt=True,
                      dtype="float32", ctc_weight=0.0)
    params = params_from_torch_model(ref, cfg)
    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        suppress_tokens=SUPPRESS, return_timestamps=True, max_length=64)
    rng = np.random.default_rng(11)
    feats = rng.standard_normal((2, 24, 96)).astype(np.float32)
    raw = rng.random((2, 4, 48)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    return ref, cfg, params, gen_cfg, feats, stno


def _hf_processors(prompt_len):
    import sys

    sys.path.insert(0, "/root/reference/src")
    from models.dicow.utils import WhisperTimeStampLogitsProcessorCustom

    hf_gc = HFGenerationConfig(
        no_timestamps_token_id=NO_TS, eos_token_id=EOS, bos_token_id=EOS,
        max_initial_timestamp_index=None)
    ts = WhisperTimeStampLogitsProcessorCustom(hf_gc, begin_index=prompt_len)
    sup = SuppressTokensLogitsProcessor(list(SUPPRESS))
    return [sup, ts]


def test_processor_parity_stepwise(setup, rng):
    """Teacher-force a fixed token trajectory; processed scores must match
    HF's suppress+timestamp chain at every position."""
    ref, cfg, params, gen_cfg, feats, stno = setup
    prompt_len = 2
    # crafted trajectory: begin, timestamp pair, text, single ts, text...
    traj = np.array(
        [[SOT, 50, TS_BEGIN + 2, 40, 41, TS_BEGIN + 9, TS_BEGIN + 9, 42],
         [SOT, 50, TS_BEGIN + 1, 9, TS_BEGIN + 4, TS_BEGIN + 6, 55, 56]],
        dtype=np.int64)

    process = make_logits_processor(gen_cfg, begin_index=prompt_len)
    hf_chain = _hf_processors(prompt_len)

    for cur_len in range(prompt_len, traj.shape[1]):
        scores = rng.standard_normal((2, V)).astype(np.float32) * 3
        ids_t = torch.tensor(traj[:, :cur_len])
        ref_scores = torch.tensor(scores)
        for p in hf_chain:
            ref_scores = p(ids_t, ref_scores)
        ref_scores = ref_scores.numpy()

        buf = np.full((2, traj.shape[1]), EOS, dtype=np.int32)
        buf[:, :cur_len] = traj[:, :cur_len]
        ours = np.asarray(process(jnp.asarray(scores), jnp.asarray(buf),
                                  jnp.asarray(cur_len)))
        # compare on finite entries; -inf vs finfo.min both mean "masked"
        ref_masked = ~np.isfinite(ref_scores) | (ref_scores <= -1e30)
        ours_masked = ours <= -1e30
        np.testing.assert_array_equal(ours_masked, ref_masked,
                                      err_msg=f"mask mismatch at len {cur_len}")
        np.testing.assert_allclose(np.where(ours_masked, 0, ours),
                                   np.where(ref_masked, 0, ref_scores),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"score mismatch at len {cur_len}")


def _torch_greedy(ref, feats, stno, prompt, max_new):
    chain = _hf_processors(prompt.shape[1])
    tokens = torch.tensor(prompt)
    finished = torch.zeros(tokens.shape[0], dtype=torch.bool)
    with torch.no_grad():
        for _ in range(max_new):
            logits = ref(input_features=torch.tensor(feats),
                         stno_mask=torch.tensor(stno),
                         decoder_input_ids=tokens).logits[:, -1].float()
            for p in chain:
                logits = p(tokens, logits)
            nxt = logits.argmax(-1)
            nxt = torch.where(finished, torch.tensor(EOS), nxt)
            tokens = torch.cat([tokens, nxt[:, None]], dim=1)
            finished |= nxt == EOS
            if finished.all():
                break
    return tokens.numpy()


def test_greedy_free_run_matches_torch_oracle(setup):
    ref, cfg, params, gen_cfg, feats, stno = setup
    prompt = np.array([[SOT, 50], [SOT, 50]], dtype=np.int32)
    max_new = 12

    ref_tokens = _torch_greedy(ref, feats, stno, prompt, max_new)

    from ts_asr_whisper_tpu.models.dicow import dicow_encoder_forward

    enc = dicow_encoder_forward(params["encoder"], cfg, jnp.asarray(feats),
                                jnp.asarray(stno))
    out = greedy_decode(params, cfg, gen_cfg, enc, jnp.asarray(prompt),
                        max_new_tokens=max_new)
    ours = np.asarray(out.sequences)
    for b in range(2):
        n = min(ref_tokens.shape[1], int(out.lengths[b]))
        assert ours[b, :n].tolist() == ref_tokens[b, :n].tolist(), (
            f"row {b}: {ours[b, :n]} vs {ref_tokens[b]}")


def test_greedy_terminates_and_pads(setup):
    ref, cfg, params, gen_cfg, feats, stno = setup
    from ts_asr_whisper_tpu.models.dicow import dicow_encoder_forward

    enc = dicow_encoder_forward(params["encoder"], cfg, jnp.asarray(feats),
                                jnp.asarray(stno))
    prompt = np.array([[SOT, 50], [SOT, 50]], dtype=np.int32)
    out = greedy_decode(params, cfg, gen_cfg, enc, jnp.asarray(prompt),
                        max_new_tokens=8)
    seq = np.asarray(out.sequences)
    assert seq.shape == (2, 10)
    lens = np.asarray(out.lengths)
    assert (lens <= 10).all() and (lens >= 2).all()
    assert np.isfinite(np.asarray(out.no_speech_probs)).all()


def test_repetition_penalty_matches_hf(rng):
    """Fused repetition penalty == HF RepetitionPenaltyLogitsProcessor,
    including prompt tokens and padded-buffer exclusion."""
    from transformers.generation.logits_process import (
        RepetitionPenaltyLogitsProcessor,
    )

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, decoder_start_token_id=SOT,
        no_timestamps_token_id=NO_TS, max_length=64,
        suppress_tokens=(), begin_suppress_tokens=(),
        return_timestamps=False, repetition_penalty=1.35)
    prompt_len = 2
    process = make_logits_processor(gen_cfg, begin_index=prompt_len)
    hf = RepetitionPenaltyLogitsProcessor(1.35)

    traj = np.array([[SOT, 50, 40, 41, 40, 42],
                     [SOT, 50, 9, 9, 55, 56]], dtype=np.int64)
    for cur_len in range(prompt_len, traj.shape[1]):
        scores = (rng.standard_normal((2, V)).astype(np.float32) * 3)
        ref = hf(torch.tensor(traj[:, :cur_len]),
                 torch.tensor(scores)).numpy()
        buf = np.full((2, traj.shape[1]), 1234, dtype=np.int32)
        buf[:, :cur_len] = traj[:, :cur_len]
        ours = np.asarray(process(jnp.asarray(scores), jnp.asarray(buf),
                                  jnp.asarray(cur_len)))
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6,
                                   err_msg=f"mismatch at len {cur_len}")


def test_no_speech_prob_position_matches_hf(setup):
    """no_speech_probs must come from the logits AT the
    <|startoftranscript|> position (HF WhisperNoSpeechDetection reads
    logits[:, begin_index - start_of_trans_offset] == position 0), not the
    last prompt position."""
    ref, cfg, params, gen_cfg, feats, stno = setup
    import jax

    from ts_asr_whisper_tpu.models.dicow import dicow_encoder_forward

    prompts = np.array([[SOT, EOS + 2, EOS + 3]] * 2, dtype=np.int32)
    with torch.no_grad():
        out = ref(
            input_features=torch.tensor(feats),
            stno_mask=torch.tensor(stno),
            decoder_input_ids=torch.tensor(prompts.astype(np.int64)),
        )
        logits0 = out.logits[:, 0].float()  # at the sot position
        want = torch.softmax(logits0, dim=-1)[:, NO_TS - 1].numpy()

    enc = dicow_encoder_forward(params["encoder"], cfg, jnp.asarray(feats),
                                jnp.asarray(stno))
    got = np.asarray(greedy_decode(params, cfg, gen_cfg, enc,
                                   jnp.asarray(prompts), 4).no_speech_probs)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
