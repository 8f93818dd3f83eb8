"""Word-level token timestamps: unit parity of the DTW/median-filter
primitives vs the HF implementations the reference inherits, plus
full-pipeline parity of longform_generate(return_token_timestamps=True)
vs the reference's generate(return_token_timestamps=True,
return_segments=True) on a tiny model (reference
generation.py:427-436,473-475,526-527).

Golden segment fixtures (tests/fixtures/token_timestamps_golden.json) pin
the reference behavior against installed-transformers drift, same
discipline as test_longform_full_parity. Capture/refresh:

    TSAW_CAPTURE_GOLDEN=1 python -m pytest tests/test_token_timestamps.py
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_longform_full_parity import (  # noqa: E402
    BASE_KW,
    EOS,
    LANG,
    SOT,
    TASK,
    _make_pair,
)

from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig  # noqa: E402
from ts_asr_whisper_tpu.decoding.longform import longform_generate  # noqa: E402
from ts_asr_whisper_tpu.decoding.token_timestamps import (  # noqa: E402
    dynamic_time_warping,
    extract_token_timestamps,
    median_filter,
)

ALIGN_HEADS = ((0, 1), (0, 3), (1, 0), (1, 2))

GOLDEN_PATH = Path(__file__).parent / "fixtures" / \
    "token_timestamps_golden.json"
_CAPTURE = os.environ.get("TSAW_CAPTURE_GOLDEN") == "1"


# --- unit parity vs the HF primitives ---------------------------------------


def test_median_filter_matches_hf():
    from transformers.models.whisper.generation_whisper import _median_filter

    rng = np.random.default_rng(0)
    for shape in ((3, 4, 10, 50), (2, 5, 33)):
        x = rng.standard_normal(shape).astype(np.float32)
        for width in (3, 7, 9):
            ours = median_filter(x, width)
            theirs = _median_filter(torch.tensor(x), width).numpy()
            np.testing.assert_array_equal(ours, theirs)


def test_dtw_matches_hf():
    from transformers.models.whisper.generation_whisper import (
        _dynamic_time_warping,
    )

    rng = np.random.default_rng(1)
    for shape in ((12, 40), (1, 7), (25, 25), (40, 12)):
        m = rng.standard_normal(shape).astype(np.float64)
        ours_text, ours_time = dynamic_time_warping(m)
        ref_text, ref_time = _dynamic_time_warping(m.copy())
        np.testing.assert_array_equal(ours_text, ref_text)
        np.testing.assert_array_equal(ours_time, ref_time)


def test_dtw_matches_hf_with_ties():
    """Quantized cost surfaces hit the tie-breaking branches; the fall-
    through to the 'time step' move must match HF exactly."""
    from transformers.models.whisper.generation_whisper import (
        _dynamic_time_warping,
    )

    rng = np.random.default_rng(2)
    for _ in range(5):
        m = rng.integers(0, 3, (15, 30)).astype(np.float64)
        ours = dynamic_time_warping(m)
        ref = _dynamic_time_warping(m.copy())
        np.testing.assert_array_equal(ours[0], ref[0])
        np.testing.assert_array_equal(ours[1], ref[1])


# --- full-pipeline parity vs the reference generate() -----------------------


def _ref_segments(ref, feats, stno, attn, num_frames):
    from transformers import GenerationConfig as HFGenConfig

    gc = HFGenConfig(
        max_length=80, num_beams=1, decoder_start_token_id=SOT,
        eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
        no_timestamps_token_id=BASE_KW["vocab_size"] - 1502,
        return_timestamps=True, is_multilingual=True,
        lang_to_id={"<|en|>": LANG}, task_to_id={"transcribe": TASK},
        begin_suppress_tokens=None, forced_decoder_ids=None,
        suppress_tokens=None, max_initial_timestamp_index=None,
        no_speech_threshold=None, temperature=0.0)
    gc.ctc_weight = 0.0
    gc.alignment_heads = [list(p) for p in ALIGN_HEADS]
    ref.generation_config = gc
    # the reference's public generate() passes its segments (and their
    # token_timestamps) through _fix_timestamps_from_segmentation, which
    # returns only the re-blocked sequences (generation.py:556-563) — spy
    # on it to capture the segment dicts before they are discarded
    captured = {}
    orig_fix = ref._fix_timestamps_from_segmentation

    def spy(seqs):
        captured["segments"] = [list(r) for r in seqs["segments"]]
        return orig_fix(seqs)

    ref._fix_timestamps_from_segmentation = spy
    try:
        with torch.no_grad():
            ref.generate(
                input_features=torch.tensor(feats),
                attention_mask=torch.tensor(attn),
                stno_mask=torch.tensor(stno),
                forced_decoder_ids=torch.tensor([[SOT, LANG, TASK]]
                                                * feats.shape[0]),
                language="en", task="transcribe",
                return_token_timestamps=True,
                num_frames=torch.tensor(num_frames),
            )
    finally:
        ref._fix_timestamps_from_segmentation = orig_fix
    segs_out = []
    for row in captured["segments"]:
        segs_out.append([
            {"start": float(s["start"]), "end": float(s["end"]),
             "tokens": [int(t) for t in s["tokens"]],
             "token_timestamps":
                 [round(float(t), 4) for t in s["token_timestamps"]]}
            for s in row])
    return segs_out


def _golden():
    if GOLDEN_PATH.exists():
        return json.loads(GOLDEN_PATH.read_text())
    return {}


def test_token_timestamps_full_parity():
    ref, cfg, params = _make_pair(seed=13)
    b, n_windows = 2, 2
    t_total = BASE_KW["max_source_positions"] * 2 * n_windows
    rng = np.random.default_rng(5)
    feats = rng.standard_normal(
        (b, BASE_KW["num_mel_bins"], t_total)).astype(np.float32) * 0.6
    stno = rng.dirichlet(np.ones(4), (b, t_total // 2)) \
        .transpose(0, 2, 1).astype(np.float32)
    attn = np.ones((b, t_total), np.int64)
    num_frames = attn.sum(-1)

    case = "greedy_token_ts"
    golden = _golden()
    live = None
    err = None
    try:
        live = _ref_segments(ref, feats, stno, attn, num_frames)
    except Exception as e:  # installed transformers drifted
        err = e
    if live is not None and case in golden and not _CAPTURE:
        assert live == golden[case], \
            "live reference deviates from committed golden (HF drift?)"
    if live is not None and (_CAPTURE or case not in golden):
        golden[case] = live
        GOLDEN_PATH.parent.mkdir(exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(golden, indent=1, sort_keys=True))
    expected = live if live is not None else golden.get(case)
    if expected is None:
        pytest.skip(f"reference not drivable and no golden: {err}")

    gen = GenerationConfig(
        max_length=80, decoder_start_token_id=SOT, eos_token_id=EOS,
        pad_token_id=EOS, bos_token_id=EOS,
        no_timestamps_token_id=BASE_KW["vocab_size"] - 1502,
        return_timestamps=True, return_token_timestamps=True,
        alignment_heads=ALIGN_HEADS)
    ours = longform_generate(
        params, cfg, gen, feats, stno, attn,
        np.asarray([[SOT, LANG, TASK]] * b), return_segments=True,
        token_ts_num_frames=num_frames)

    assert len(ours.segments) == len(expected)
    # non-triviality: the case must actually exercise multi-segment DTW
    assert sum(len(r) for r in expected) >= 4
    for row_ours, row_ref in zip(ours.segments, expected):
        assert len(row_ours) == len(row_ref), \
            (len(row_ours), len(row_ref))
        for s_ours, s_ref in zip(row_ours, row_ref):
            assert [int(t) for t in s_ours.tokens] == s_ref["tokens"]
            assert abs(s_ours.start - s_ref["start"]) < 1e-6
            assert abs(s_ours.end - s_ref["end"]) < 1e-6
            assert s_ours.token_timestamps is not None
            np.testing.assert_allclose(
                np.asarray(s_ours.token_timestamps, np.float64),
                np.asarray(s_ref["token_timestamps"], np.float64),
                atol=5e-4)


def test_token_timestamps_beam_raises():
    """Scope pin: beam collection is explicitly out of scope (no reference
    config enables token timestamps; see token_timestamps.py docstring)."""
    _, cfg, params = _make_pair(seed=13)
    gen = GenerationConfig(
        max_length=80, decoder_start_token_id=SOT, eos_token_id=EOS,
        pad_token_id=EOS, bos_token_id=EOS,
        no_timestamps_token_id=BASE_KW["vocab_size"] - 1502,
        return_timestamps=True, return_token_timestamps=True,
        num_beams=2, alignment_heads=ALIGN_HEADS)
    b, t_total = 1, BASE_KW["max_source_positions"] * 2
    feats = np.zeros((b, BASE_KW["num_mel_bins"], t_total), np.float32)
    stno = np.full((b, 4, t_total // 2), 0.25, np.float32)
    attn = np.ones((b, t_total), np.int64)
    with pytest.raises(NotImplementedError):
        longform_generate(params, cfg, gen, feats, stno, attn,
                          np.asarray([[SOT, LANG, TASK]] * b))
