"""Ultimate integration parity: our longform_generate vs the reference's
full generate() (HF Whisper seek loop + DiCoW overrides) on a tiny model.

Every configuration is pinned TWICE: against the live reference generate()
when the installed transformers can drive it, AND against committed golden
token fixtures (tests/fixtures/longform_parity_golden.json) captured from
a drivable configuration — so parity survives installed-HF drift instead
of silently skipping. When both are available the live output is asserted
equal to the golden too, making HF/torch behavioral drift loud.

Capture/refresh fixtures (requires a drivable transformers):

    TSAW_CAPTURE_GOLDEN=1 python -m pytest tests/test_longform_full_parity.py
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from oracles import load_reference_dicow  # noqa: E402

RefConfig, RefModel = load_reference_dicow()

from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig  # noqa: E402
from ts_asr_whisper_tpu.decoding.longform import longform_generate  # noqa: E402
from ts_asr_whisper_tpu.models.config import DiCoWConfig  # noqa: E402
from ts_asr_whisper_tpu.models.convert import params_from_torch_model  # noqa: E402

V = 1700
TS_BEGIN = V - 1501
NO_TS = TS_BEGIN - 1
EOS = 30
SOT = 31
LANG = 40
TASK = 41

BASE_KW = dict(
    vocab_size=V, num_mel_bins=24, d_model=64, encoder_layers=2,
    decoder_layers=2, encoder_attention_heads=4, decoder_attention_heads=4,
    encoder_ffn_dim=128, decoder_ffn_dim=128, max_source_positions=48,
    max_target_positions=80, decoder_start_token_id=SOT, eos_token_id=EOS,
    pad_token_id=EOS, bos_token_id=EOS)


# --- tiny-vocab shims for the reference's joint-CTC path -------------------
# The reference hard-requires a non-empty upper_cased_tokens map:
# decoding.py:183-186 builds torch.tensor(list(items())) and indexes
# same_logits[:, 1] — an empty dict yields a 1-D empty tensor and an
# IndexError (this, not HF drift, was the historical joint-CTC skip). An
# identity pair keeps the tensor 2-D while the logit copy stays a no-op.
_IDENTITY_FOLD = {35: 35}

# decoding.py:309 top-ks k=ctc_tokens_to_score(=500) out of
# first_timestamp_token_id(=TS_BEGIN) candidate columns; a tiny test vocab
# has fewer. Pin the reference to the same k our rescorer derives
# (min(500, timestamp_begin - 1), decoding/longform.py:460) — identical to
# the real-vocab behavior where 500 < timestamp_begin.
import models.dicow.generation as _ref_gen_mod  # noqa: E402
from models.dicow.decoding import (  # noqa: E402
    CTCRescorerLogitsProcessor as _RefCTCRescorer,
)


class _SmallVocabCTCRescorer(_RefCTCRescorer):
    def __init__(self, *a, **kw):
        kw.setdefault("ctc_tokens_to_score", min(500, TS_BEGIN - 1))
        super().__init__(*a, **kw)


@pytest.fixture(autouse=True)
def _shim_ref_ctc_rescorer():
    """Patch the reference's rescorer for THIS module only and restore it
    after each test — an import-time assignment would leak the tiny-vocab
    ctc_tokens_to_score into every later-collected module that drives the
    reference generate()."""
    orig = _ref_gen_mod.CTCRescorerLogitsProcessor
    _ref_gen_mod.CTCRescorerLogitsProcessor = _SmallVocabCTCRescorer
    yield
    _ref_gen_mod.CTCRescorerLogitsProcessor = orig


class MockWhisperTok:
    """Round-trip tokenizer for the reference generate() path."""

    pad_token_id = EOS
    eos_token_id = EOS
    prefix_tokens = [SOT, LANG, TASK]
    upper_cased_tokens = dict(_IDENTITY_FOLD)

    def get_vocab(self):
        v = {"<|0.00|>": TS_BEGIN, "Ġ": 220, "#": 35}
        return v

    def decode(self, tokens, **kw):
        import numpy as _np

        out = []
        for t in _np.atleast_1d(_np.asarray(tokens)):
            t = int(t)
            if t < TS_BEGIN and t not in (EOS, SOT, LANG, TASK):
                out.append(f"#{t};")
            elif t >= TS_BEGIN and kw.get("decode_with_timestamps"):
                out.append(f"<|{0.02 * (t - TS_BEGIN):.2f}|>")
        return "".join(out)

    def __call__(self, text):
        import re

        ids = []
        for m in re.finditer(r"<\|(\d+\.\d+)\|>|#(\d+);", text):
            if m.group(1) is not None:
                ids.append(TS_BEGIN + round(float(m.group(1)) / 0.02))
            else:
                ids.append(int(m.group(2)))
        return {"input_ids": ids}

    def batch_decode(self, batch, **kw):
        return [self.decode(r, **kw) for r in batch]


def _make_pair(ctc_weight=0.0, seed=11, **extra_kw):
    torch.manual_seed(seed)
    extra = dict(extra_kw)
    if ctc_weight > 0:
        extra.update(additional_self_attention_layer=True,
                     pre_ctc_sub_sample=True)
    ref_cfg = RefConfig(**BASE_KW, ctc_weight=ctc_weight, use_fddt=True,
                        use_pre_pos_fddt=True, fddt_init="random", **extra)
    ref = RefModel(ref_cfg).eval()
    ref.set_tokenizer = lambda *a: None
    ref.tokenizer = MockWhisperTok()
    cfg = DiCoWConfig(**BASE_KW, ctc_weight=ctc_weight, use_fddt=True,
                      use_pre_pos_fddt=True, dtype="float32", **extra)
    params = params_from_torch_model(ref, cfg)
    return ref, cfg, params


@pytest.fixture(scope="module")
def setup():
    return _make_pair()


def _ref_generate(ref, feats, stno, attn, num_beams=1, ctc_weight=0.0,
                  length_penalty=1.0, enrollments=None, detect_lang=False,
                  lang_to_id=None, **gc_extra):
    from transformers import GenerationConfig as HFGenConfig

    gc = HFGenConfig(
        max_length=80,
        num_beams=num_beams,
        length_penalty=length_penalty,
        decoder_start_token_id=SOT,
        eos_token_id=EOS,
        pad_token_id=EOS,
        bos_token_id=EOS,
        no_timestamps_token_id=NO_TS,
        return_timestamps=True,
        is_multilingual=True,
        lang_to_id=lang_to_id or {"<|en|>": LANG},
        task_to_id={"transcribe": TASK},
        begin_suppress_tokens=None,
        forced_decoder_ids=None,
        suppress_tokens=None,
        max_initial_timestamp_index=None,
        no_speech_threshold=None,
        temperature=0.0,
    )
    gc.ctc_weight = ctc_weight
    for k, v in gc_extra.items():
        setattr(gc, k, v)
    # the reference's generate() drives super().generate() off
    # self.generation_config (update_generation_config mutates it in the
    # real pipeline, general.py:19-37)
    ref.generation_config = gc
    extra = {}
    # HF >=4.57 asymmetry: _set_return_outputs only forces
    # return_dict_in_generate=True (materializing per-segment scores) when
    # logprob_threshold arrives as a CALL argument, while _need_fallback
    # (generation_whisper.py:1268-1284) reads the config ATTRIBUTE — config
    # -only thresholds crash on `seek_outputs[index]["scores"]`. Route the
    # quality-threshold knobs through the call like the HF API intends.
    for k in ("logprob_threshold", "no_speech_threshold",
              "compression_ratio_threshold", "temperature"):
        if k in gc_extra:
            extra[k] = gc_extra[k]
    if "logprob_threshold" in extra:
        # _retrieve_avg_logprobs compares `temperature > 0.0`; the call-arg
        # default None crashes it — pin the first-pass temperature
        extra.setdefault("temperature", 0.0)
    if detect_lang:
        # no language / forced ids -> the HF seek driver calls the DiCoW
        # detect_language override (generation.py:151-221); the override's
        # unconditional `del self.enrollments` needs the key present
        extra["task"] = "transcribe"
        extra.setdefault("enrollments", None)
    else:
        extra["forced_decoder_ids"] = torch.tensor(
            [[SOT, LANG, TASK]] * feats.shape[0])
        extra["language"] = "en"
        extra["task"] = "transcribe"
    if enrollments is not None:
        extra["enrollments"] = {
            "input_features": torch.tensor(enrollments[0]),
            "stno_mask": torch.tensor(enrollments[1])}
    with torch.no_grad():
        out = ref.generate(
            input_features=torch.tensor(feats),
            attention_mask=torch.tensor(attn),
            stno_mask=torch.tensor(stno),
            **extra,
        )
    return np.asarray(out)


def _strip(row):
    # reference output begins with prefix tokens from its tokenizer
    # re-encode (our token-level fixup emits content only); compare content
    # tokens
    return [int(t) for t in row if int(t) not in (EOS, SOT, LANG, TASK)]


# --- golden token fixtures --------------------------------------------------
# Committed reference outputs per configuration, captured while the
# installed transformers could drive the reference's generate(). They make
# token-exact parity independent of the installed-HF version: live
# reference first (and asserted equal to the golden — HF behavioral drift
# becomes a FAILURE, not silence), committed fixture second, skip only when
# neither exists.

GOLDEN_PATH = Path(__file__).parent / "fixtures" / "longform_parity_golden.json"
_CAPTURE = os.environ.get("TSAW_CAPTURE_GOLDEN") == "1"


def _load_golden() -> dict:
    if GOLDEN_PATH.exists():
        return json.loads(GOLDEN_PATH.read_text())
    return {}


def _save_golden(case: str, rows) -> None:
    import transformers

    golden = _load_golden()
    meta = golden.setdefault("_meta", {})
    meta[case] = {"transformers": transformers.__version__,
                  "torch": torch.__version__}
    golden[case] = rows
    GOLDEN_PATH.parent.mkdir(exist_ok=True)
    GOLDEN_PATH.write_text(json.dumps(golden, indent=1, sort_keys=True))


def _ref_rows(case: str, call, required: bool = True):
    """Stripped reference token rows for ``case``.

    Drives the live reference generate() when possible; falls back to the
    committed golden fixture on drift. With both, live must equal golden.
    Returns None only when required=False and neither source exists.
    """
    golden = _load_golden()
    err = None
    try:
        rows = [_strip(r) for r in call()]
    except Exception as e:  # HF internals drifted from the pinned 4.55
        rows, err = None, e
    if rows is not None:
        # drift check BEFORE any capture write: a drifted/broken
        # transformers must never silently overwrite the committed oracle.
        # To intentionally re-capture after a verified behavior change,
        # delete the case from the fixture first.
        if case in golden:
            assert rows == golden[case], (
                f"live reference deviates from committed golden for "
                f"{case!r} — installed transformers/torch changed reference "
                f"behavior:\nlive   {rows}\ngolden {golden[case]}")
        if _CAPTURE:
            _save_golden(case, rows)
        return rows
    if case in golden:
        return golden[case]
    if required:
        pytest.skip(f"reference generate() not drivable "
                    f"({type(err).__name__}: {err}) and no golden fixture "
                    f"for {case!r}")
    return None


def test_longform_full_parity(setup, rng):
    ref, cfg, params = setup
    n_win = 3
    t_total = 96 * n_win
    feats = (rng.standard_normal((2, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int64)

    ref_rows = _ref_rows("greedy_base",
                         lambda: _ref_generate(ref, feats, stno, attn))

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=())
    prompts = np.array([[SOT, LANG, TASK]] * 2, dtype=np.int32)
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn, prompts)

    for b in range(2):
        our_row = _strip(ours.sequences[b])
        assert our_row == ref_rows[b], (
            f"row {b}:\nours {our_row}\nref  {ref_rows[b]}")


def test_longform_full_parity_joint_ctc(rng):
    """Greedy + joint CTC rescoring through the reference's full generate()."""
    ref, cfg, params = _make_pair(ctc_weight=0.3, seed=13)
    t_total = 96 * 2
    feats = (rng.standard_normal((2, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int64)

    ref_rows = _ref_rows(
        "joint_ctc",
        lambda: _ref_generate(ref, feats, stno, attn, ctc_weight=0.3))

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=(), ctc_weight=0.3)
    prompts = np.array([[SOT, LANG, TASK]] * 2, dtype=np.int32)
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn, prompts)
    for b in range(2):
        assert _strip(ours.sequences[b]) == ref_rows[b], (
            f"row {b}\nours {_strip(ours.sequences[b])}\nref  {ref_rows[b]}")


def test_longform_full_parity_beam(rng):
    """Beam search (n=2) through the reference's full generate()."""
    ref, cfg, params = _make_pair(seed=17)
    t_total = 96 * 2
    feats = (rng.standard_normal((2, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int64)

    ref_rows = _ref_rows(
        "beam2",
        lambda: _ref_generate(ref, feats, stno, attn, num_beams=2,
                              length_penalty=1.0))

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=(), num_beams=2, length_penalty=1.0)
    prompts = np.array([[SOT, LANG, TASK]] * 2, dtype=np.int32)
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn, prompts)
    for b in range(2):
        assert _strip(ours.sequences[b]) == ref_rows[b], (
            f"row {b}\nours {_strip(ours.sequences[b])}"
            f"\nref  {ref_rows[b]}")


@pytest.mark.parametrize("seed,lp", [(31, 0.1), (37, 1.0)])
def test_longform_full_parity_beam_more(rng, seed, lp):
    """Beam parity robustness: more seeds + the beam_joint config's
    length_penalty=0.1."""
    ref, cfg, params = _make_pair(seed=seed)
    t_total = 96 * 2
    rng = np.random.default_rng(seed)
    feats = (rng.standard_normal((2, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int64)

    ref_rows = _ref_rows(
        f"beam2_seed{seed}_lp{lp}",
        lambda: _ref_generate(ref, feats, stno, attn, num_beams=2,
                              length_penalty=lp))

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=(), num_beams=2, length_penalty=lp)
    prompts = np.array([[SOT, LANG, TASK]] * 2, dtype=np.int32)
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn, prompts)
    for b in range(2):
        assert _strip(ours.sequences[b]) == ref_rows[b], (
            f"seed {seed} lp {lp} row {b}\nours "
            f"{_strip(ours.sequences[b])}\nref  {ref_rows[b]}")


def test_longform_full_parity_ragged_lengths(rng):
    """Rows with different audio lengths: our active-row compaction must
    match the reference's per-sample seek handling token-for-token."""
    ref, cfg, params = _make_pair(seed=41)
    t_total = 96 * 3
    feats = (rng.standard_normal((3, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((3, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.zeros((3, t_total), dtype=np.int64)
    attn[0, :] = 1            # 3 windows
    attn[1, : 96 * 1] = 1     # 1 window
    attn[2, : 96 * 2 + 40] = 1  # 2.4 windows (partial tail)

    ref_rows = _ref_rows("ragged_lengths",
                         lambda: _ref_generate(ref, feats, stno, attn))

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=())
    prompts = np.array([[SOT, LANG, TASK]] * 3, dtype=np.int32)
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn, prompts)
    for b in range(3):
        assert _strip(ours.sequences[b]) == ref_rows[b], (
            f"row {b}\nours {_strip(ours.sequences[b])}"
            f"\nref  {ref_rows[b]}")


def test_longform_full_parity_ctc_case_fold(rng):
    """Joint CTC with a non-empty upper_cased_tokens map: the reference
    ALWAYS folds upper-case CTC columns onto their lower-case twins
    (decoding.py:183-186); our upper_to_lower wiring must be token-exact."""
    ref, cfg, params = _make_pair(ctc_weight=0.3, seed=43)
    fold = {50: 60, 51: 61, 52: 62}  # lower_id -> upper_id
    ref.tokenizer.upper_cased_tokens = fold
    t_total = 96 * 2
    feats = (rng.standard_normal((2, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int64)

    # rescorer-level case-fold parity is also token-exact-tested in
    # test_joint_ctc_decode.py; when neither live reference nor golden is
    # available, fall back to the mechanics check below
    ref_rows = _ref_rows(
        "ctc_case_fold",
        lambda: _ref_generate(ref, feats, stno, attn, ctc_weight=0.3),
        required=False)

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=(), ctc_weight=0.3)
    prompts = np.array([[SOT, LANG, TASK]] * 2, dtype=np.int32)
    upper_to_lower = np.stack([
        np.array(list(fold.values()), np.int64),   # upper ids
        np.array(list(fold.keys()), np.int64)])    # lower ids
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                             prompts, upper_to_lower=upper_to_lower)
    if ref_rows is not None:
        for b in range(2):
            assert _strip(ours.sequences[b]) == ref_rows[b], f"row {b}"
    else:
        # at minimum, prove the fold reaches the CTC state: upper-case
        # columns must carry their lower-case twin's log-probs
        import jax.numpy as jnp

        from ts_asr_whisper_tpu.decoding.ctc_rescorer import init_ctc_state
        from ts_asr_whisper_tpu.models.dicow import (
            dicow_encoder_forward,
            encoder_ctc_logits,
        )

        enc = dicow_encoder_forward(params["encoder"], cfg,
                                    jnp.asarray(feats[:, :, :96]),
                                    jnp.asarray(stno[:, :, :48]))
        logits = encoder_ctc_logits(params["encoder"], cfg, enc)
        st = init_ctc_state(logits, cfg.ctc_vocab_size - 1, upper_to_lower)
        lv = np.asarray(st.logp_vt)
        for lo, up in fold.items():
            np.testing.assert_array_equal(lv[:, up], lv[:, lo])


def test_longform_full_parity_detect_language(rng):
    """No forced language: the HF seek driver calls the DiCoW
    detect_language override (generation.py:151-221); our detect_lang path
    must pick the same language token and produce identical streams."""
    LANG2 = LANG + 1
    ref, cfg, params = _make_pair(seed=47)
    t_total = 96 * 2
    feats = (rng.standard_normal((2, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int64)

    ref_rows = _ref_rows(
        "detect_language",
        lambda: _ref_generate(ref, feats, stno, attn, detect_lang=True,
                              lang_to_id={"<|en|>": LANG, "<|de|>": LANG2}))

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=(), lang_ids=(LANG, LANG2))
    # prompts carry a default language slot; detection overwrites it
    prompts = np.array([[SOT, LANG, TASK]] * 2, dtype=np.int32)
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                             prompts, detect_lang=True)
    for b in range(2):
        assert _strip(ours.sequences[b]) == ref_rows[b], f"row {b}"


@pytest.mark.parametrize("num_beams", [1, 2])
def test_longform_full_parity_no_speech_skip(rng, num_beams):
    """Thresholds chosen so every window trips the no-speech skip (ns prob >
    1e-9 and avg logprob < +10): the reference emits nothing, and so must we
    — in BOTH greedy and beam mode (beam previously lacked the stats)."""
    ref, cfg, params = _make_pair(seed=53)
    t_total = 96 * 2
    feats = (rng.standard_normal((2, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int64)

    ref_rows = _ref_rows(
        f"no_speech_skip_beams{num_beams}",
        lambda: _ref_generate(ref, feats, stno, attn, num_beams=num_beams,
                              no_speech_threshold=1e-9,
                              logprob_threshold=10.0),
        required=False)  # our-side semantics still checked without it

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=(), num_beams=num_beams,
        no_speech_threshold=1e-9, logprob_threshold=10.0)
    prompts = np.array([[SOT, LANG, TASK]] * 2, dtype=np.int32)
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                             prompts)
    for b in range(2):
        assert _strip(ours.sequences[b]) == [], \
            f"row {b}: expected all windows skipped as silence"
        if ref_rows is not None:
            assert ref_rows[b] == []


def test_longform_full_parity_fallback_thresholds_pass(rng):
    """Multi-temperature config whose quality checks all pass: the fallback
    machinery must leave the first-pass (temperature 0) output untouched and
    match the reference token-for-token."""
    ref, cfg, params = _make_pair(seed=59)
    t_total = 96 * 2
    feats = (rng.standard_normal((2, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int64)

    ref_rows = _ref_rows(
        "fallback_thresholds_pass",
        lambda: _ref_generate(ref, feats, stno, attn,
                              temperature=(0.0, 0.2, 0.4),
                              compression_ratio_threshold=50.0,
                              logprob_threshold=-1e9),
        required=False)  # self-consistency fallback below

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=(), temperature=(0.0, 0.2, 0.4),
        compression_ratio_threshold=50.0, logprob_threshold=-1e9)
    prompts = np.array([[SOT, LANG, TASK]] * 2, dtype=np.int32)
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                             prompts)
    if ref_rows is not None:
        for b in range(2):
            assert _strip(ours.sequences[b]) == ref_rows[b], f"row {b}"
    else:
        # passing checks must leave the temperature-0 output untouched
        plain_cfg = GenerationConfig(
            eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
            decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
            return_timestamps=True, max_length=80, suppress_tokens=(),
            begin_suppress_tokens=())
        plain = longform_generate(params, cfg, plain_cfg, feats, stno, attn,
                                  prompts)
        for b in range(2):
            assert _strip(ours.sequences[b]) == _strip(plain.sequences[b])


def test_longform_full_parity_se_dicow(rng):
    """SE-DiCoW (enrollment cross-attention) through the reference's full
    generate(): the fixed 30 s enrollment window rides every seek window."""
    ref, cfg, params = _make_pair(seed=17, use_enrollments=True, scb_layers=2)
    n_win = 2
    t_total = 96 * n_win
    feats = (rng.standard_normal((2, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((2, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.ones((2, t_total), dtype=np.int64)
    e_rng = np.random.default_rng(23)
    e_feats = (e_rng.standard_normal((2, 24, 96)) * 0.5).astype(np.float32)
    e_raw = e_rng.random((2, 4, 48)).astype(np.float32)
    e_stno = e_raw / e_raw.sum(axis=1, keepdims=True)

    ref_rows = _ref_rows(
        "se_dicow",
        lambda: _ref_generate(ref, feats, stno, attn,
                              enrollments=(e_feats, e_stno)))

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=())
    prompts = np.array([[SOT, LANG, TASK]] * 2, dtype=np.int32)
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                             prompts, enroll_features=e_feats,
                             enroll_stno=e_stno)
    for b in range(2):
        assert _strip(ours.sequences[b]) == ref_rows[b], (
            f"row {b}:\nours {_strip(ours.sequences[b])}\n"
            f"ref  {ref_rows[b]}")


def test_longform_full_parity_se_dicow_ragged(rng):
    """SE-DiCoW with ragged row lengths: the compaction's per-bucket
    enrollment gather must track the reference's batch_idx_map reindexing
    (generation.py:108-110) token-for-token."""
    ref, cfg, params = _make_pair(seed=19, use_enrollments=True, scb_layers=1)
    t_total = 96 * 3
    feats = (rng.standard_normal((3, 24, t_total)) * 0.5).astype(np.float32)
    raw = rng.random((3, 4, t_total // 2)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    attn = np.zeros((3, t_total), dtype=np.int64)
    attn[0, :] = 1
    attn[1, : 96 * 1] = 1
    attn[2, : 96 * 2 + 40] = 1
    e_rng = np.random.default_rng(29)
    e_feats = (e_rng.standard_normal((3, 24, 96)) * 0.5).astype(np.float32)
    e_raw = e_rng.random((3, 4, 48)).astype(np.float32)
    e_stno = e_raw / e_raw.sum(axis=1, keepdims=True)

    ref_rows = _ref_rows(
        "se_dicow_ragged",
        lambda: _ref_generate(ref, feats, stno, attn,
                              enrollments=(e_feats, e_stno)))

    gen_cfg = GenerationConfig(
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        decoder_start_token_id=SOT, no_timestamps_token_id=NO_TS,
        return_timestamps=True, max_length=80, suppress_tokens=(),
        begin_suppress_tokens=())
    prompts = np.array([[SOT, LANG, TASK]] * 3, dtype=np.int32)
    ours = longform_generate(params, cfg, gen_cfg, feats, stno, attn,
                             prompts, enroll_features=e_feats,
                             enroll_stno=e_stno)
    for b in range(3):
        assert _strip(ours.sequences[b]) == ref_rows[b], (
            f"row {b}\nours {_strip(ours.sequences[b])}"
            f"\nref  {ref_rows[b]}")
