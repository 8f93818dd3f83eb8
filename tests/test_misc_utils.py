"""Misc utility parity/smoke tests: case map, observability, viz, audio IO."""

import sys

import numpy as np

sys.path.insert(0, "/root/reference/src")


def test_case_map_semantics():
    """Lower->upper token-id map, reference general.py:52-67 semantics:
    first letter (after Ġ) case-folds, the mapping is keyed by the
    lower-cased token's id."""
    from ts_asr_whisper_tpu.data.tokenizer import create_lower_uppercase_mapping

    class Tok:
        def get_vocab(self):
            return {"hello": 0, "Hello": 1, "ĠWorld": 2, "Ġworld": 3,
                    "HELLO": 4, "Ġ": 5, "x": 6, "X": 7, "<|en|>": 8}

    ours = create_lower_uppercase_mapping(Tok())
    assert ours[0] == 1          # hello -> Hello
    assert ours[3] == 2          # Ġworld -> ĠWorld
    assert ours[6] == 7          # x -> X
    # HELLO lower-cases (first char only) to hELLO which isn't in the vocab
    assert 4 not in ours.values() or ours.get(0) == 1


def test_metrics_logger(tmp_path):
    from ts_asr_whisper_tpu.utils.observability import MetricsLogger

    ml = MetricsLogger(str(tmp_path), run_name="t")
    ml.log({"loss": 1.25}, step=3)
    ml.log({"loss": 1.0, "wer": 0.5}, step=4)
    ml.close()
    import json

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["step"] == 3 and lines[0]["loss"] == 1.25
    assert lines[1]["wer"] == 0.5


def test_viz_html(tmp_path):
    from ts_asr_whisper_tpu.eval.seglst import SegLST
    from ts_asr_whisper_tpu.eval.viz import save_wer_visualization

    ref = SegLST([{"session_id": "s", "speaker": "A", "start_time": 0,
                   "end_time": 2, "words": "hi there"}])
    hyp = SegLST([{"session_id": "s", "speaker": "h0", "start_time": 0.1,
                   "end_time": 2.1, "words": "hi here"}])
    path = save_wer_visualization(ref, hyp, str(tmp_path))
    html = open(path).read()
    assert "REF A" in html and "HYP h0" in html and "hi there" in html


def test_audio_roundtrip_and_resample(tmp_path):
    from ts_asr_whisper_tpu.data.audio import load_audio, resample, save_wav

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    p = tmp_path / "a.wav"
    save_wav(str(p), wav, 16000)
    loaded, sr = load_audio(str(p))
    assert sr == 16000
    np.testing.assert_allclose(loaded[0], wav, atol=1e-3)

    # offset/duration slicing + resample
    sliced, _ = load_audio(str(p), offset=0.25, duration=0.5)
    assert sliced.shape[1] == 8000
    down = resample(loaded, 16000, 8000)
    assert down.shape[1] == 8000


def test_deprecated_decorator():
    import warnings

    from ts_asr_whisper_tpu.utils.deprecated import deprecated

    @deprecated("use new_fn")
    def old_fn():
        return 42

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert old_fn() == 42
        assert any(issubclass(x.category, DeprecationWarning) for x in w)


def test_condition_on_prev_rejected():
    """Parity: the reference raises NotImplementedError for
    condition_on_prev_tokens (generation.py:543-544); so do we at
    generation-config build time."""
    import pytest

    from ts_asr_whisper_tpu.config import Cfg
    from ts_asr_whisper_tpu.train import make_generation_config

    class _MC:
        decoder_start_token_id = 1
        eos_token_id = 0
        pad_token_id = 0
        bos_token_id = 0
        no_timestamps_token_id = 10

    class _Container:
        tokenizer = None
        model_config = _MC()

    cfg = Cfg()
    cfg.decoding.condition_on_prev = True
    with pytest.raises(NotImplementedError):
        make_generation_config(_Container(), cfg)
