"""End-to-end joint CTC greedy decoding parity vs the reference
CTCRescorerLogitsProcessor driving the same tiny DiCoW model."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

import sys  # noqa: E402

sys.path.insert(0, "/root/reference/src")
from models.dicow.decoding import (  # noqa: E402
    CTCRescorerLogitsProcessor,
    LogSoftmaxProcessor,
)
from models.dicow.utils import WhisperTimeStampLogitsProcessorCustom  # noqa: E402
from transformers import GenerationConfig as HFGenerationConfig  # noqa: E402
from transformers.generation.logits_process import (  # noqa: E402
    SuppressTokensLogitsProcessor,
)

from oracles import load_reference_dicow  # noqa: E402

RefConfig, RefModel = load_reference_dicow()

from ts_asr_whisper_tpu.decoding.ctc_rescorer import (  # noqa: E402
    CTCRescorer,
    init_ctc_state,
)
from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig  # noqa: E402
from ts_asr_whisper_tpu.decoding.greedy import greedy_decode  # noqa: E402
from ts_asr_whisper_tpu.models.config import DiCoWConfig  # noqa: E402
from ts_asr_whisper_tpu.models.convert import params_from_torch_model  # noqa: E402
from ts_asr_whisper_tpu.models.dicow import (  # noqa: E402
    dicow_encoder_forward,
    encoder_ctc_logits,
)

V = 1700
TS_BEGIN = V - 1501
NO_TS = TS_BEGIN - 1
EOS = 30
SOT = 31
SUPPRESS = (5, 6)
CTC_W = 0.3
K = 50

BASE_KW = dict(
    vocab_size=V, num_mel_bins=24, d_model=64, encoder_layers=2,
    decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=128, decoder_ffn_dim=128, max_source_positions=48,
    max_target_positions=64, decoder_start_token_id=SOT, eos_token_id=EOS,
    pad_token_id=EOS, bos_token_id=EOS)

DICOW_KW = dict(ctc_weight=0.3, use_fddt=True, use_pre_pos_fddt=True,
                fddt_init="random", additional_self_attention_layer=True,
                pre_ctc_sub_sample=True)


class MiniTok:
    """Just enough tokenizer surface for CTCRescorerLogitsProcessor."""

    # a couple of case pairs: lower id -> upper id
    upper_cased_tokens = {10: 11, 12: 13}
    prefix_tokens = [SOT, 40]  # sot + lang (len 2 -> strips 1 col)
    eos_token_id = EOS

    def get_vocab(self):
        return {"<|0.00|>": TS_BEGIN, "Ġ": 220, "#": 221}


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(5)
    ref = RefModel(RefConfig(**BASE_KW, **DICOW_KW)).eval()
    cfg = DiCoWConfig(**BASE_KW, **DICOW_KW, dtype="float32")
    params = params_from_torch_model(ref, cfg)
    rng = np.random.default_rng(17)
    feats = rng.standard_normal((2, 24, 96)).astype(np.float32)
    raw = rng.random((2, 4, 48)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    return ref, cfg, params, feats, stno


def _torch_joint_greedy(ref, feats, stno, prompt, max_new):
    tok = MiniTok()
    with torch.no_grad():
        enc_out = ref.model.encoder(torch.tensor(feats),
                                    stno_mask=torch.tensor(stno))
        enc_logits = ref.get_enc_logits(enc_out.last_hidden_state)
    rescorer = CTCRescorerLogitsProcessor(
        enc_logits,
        torch.full((enc_logits.shape[0],), enc_logits.shape[1]),
        enc_logits.shape[-1] - 1, EOS, EOS, SOT, tok, 0, CTC_W, 1, False,
        ctc_tokens_to_score=K)
    hf_gc = HFGenerationConfig(no_timestamps_token_id=NO_TS, eos_token_id=EOS,
                               bos_token_id=EOS,
                               max_initial_timestamp_index=None)
    chain = [SuppressTokensLogitsProcessor(list(SUPPRESS)),
             WhisperTimeStampLogitsProcessorCustom(hf_gc,
                                                   begin_index=prompt.shape[1]),
             LogSoftmaxProcessor(), rescorer]
    tokens = torch.tensor(prompt)
    finished = torch.zeros(tokens.shape[0], dtype=torch.bool)
    with torch.no_grad():
        for _ in range(max_new):
            logits = ref(input_features=torch.tensor(feats),
                         stno_mask=torch.tensor(stno),
                         decoder_input_ids=tokens,
                         encoder_outputs=enc_out,
                         ).logits[:, -1].float()
            scores = logits
            for p in chain:
                scores = p(tokens, scores)
            nxt = scores.argmax(-1)
            nxt = torch.where(finished, torch.tensor(EOS), nxt)
            rescorer.update_state(nxt, torch.arange(nxt.shape[0]))
            tokens = torch.cat([tokens, nxt[:, None]], dim=1)
            finished |= nxt == EOS
            if finished.all():
                break
    return tokens.numpy()


def test_joint_ctc_greedy_matches_reference(setup):
    ref, cfg, params, feats, stno = setup
    prompt = np.array([[SOT, 40], [SOT, 40]], dtype=np.int32)
    max_new = 10

    ref_tokens = _torch_joint_greedy(ref, feats, stno, prompt, max_new)

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        suppress_tokens=SUPPRESS, return_timestamps=True,
        ctc_weight=CTC_W, max_length=64)
    enc = dicow_encoder_forward(params["encoder"], cfg, jnp.asarray(feats),
                                jnp.asarray(stno))
    enc_logits = encoder_ctc_logits(params["encoder"], cfg, enc)
    blank = cfg.ctc_vocab_size - 1
    upper_map = np.array(
        [[v for v in MiniTok.upper_cased_tokens.values()],
         [k for k in MiniTok.upper_cased_tokens.keys()]])
    scorer = CTCRescorer(blank_id=blank, eos_id=EOS, timestamp_begin=TS_BEGIN,
                         ctc_weight=CTC_W, k=K,
                         prefix_len=len(MiniTok.prefix_tokens))
    state = init_ctc_state(enc_logits, blank, upper_map, k=K)
    out = greedy_decode(params, cfg, gen_cfg, enc, jnp.asarray(prompt),
                        max_new_tokens=max_new, ctc_scorer=scorer,
                        ctc_state=state)
    ours = np.asarray(out.sequences)
    for b in range(2):
        n = min(ref_tokens.shape[1], int(out.lengths[b]))
        assert ours[b, :n].tolist() == ref_tokens[b, :n].tolist(), (
            f"row {b}: ours {ours[b, :n]} vs ref {ref_tokens[b]}")
