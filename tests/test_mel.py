"""Golden tests: JAX mel front-end vs HF WhisperFeatureExtractor (fp32)."""

import numpy as np
import pytest

from ts_asr_whisper_tpu.ops import mel as mel_ops

transformers = pytest.importorskip("transformers")
from transformers import WhisperFeatureExtractor  # noqa: E402
from transformers.audio_utils import mel_filter_bank as hf_mel_filter_bank  # noqa: E402


def test_mel_filter_bank_matches_hf():
    ours = mel_ops.mel_filter_bank(num_mel_filters=80)
    hf = hf_mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney")
    np.testing.assert_allclose(ours, hf, atol=1e-7)


def test_mel_filter_bank_128_matches_hf():
    ours = mel_ops.mel_filter_bank(num_mel_filters=128)
    hf = hf_mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=128, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney")
    np.testing.assert_allclose(ours, hf, atol=1e-7)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_hf(rng, n_mels):
    fe = WhisperFeatureExtractor(feature_size=n_mels)
    # 7.3 s of noise + tone, padded by HF to 30 s
    t = np.arange(int(16000 * 7.3)) / 16000.0
    wav = (0.1 * np.sin(2 * np.pi * 440 * t)
           + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)

    hf_out = fe(wav, sampling_rate=16000, return_tensors="np",
                padding="max_length")["input_features"][0]

    padded = np.zeros(mel_ops.N_SAMPLES, dtype=np.float32)
    padded[: wav.shape[0]] = wav
    ours = np.asarray(mel_ops.log_mel_spectrogram(padded[None], n_mels)[0])

    assert ours.shape == hf_out.shape == (n_mels, 3000)
    np.testing.assert_allclose(ours, hf_out, atol=5e-5, rtol=1e-5)


def test_extract_features_longform(rng):
    """Long-form: >30 s input pads to a 60 s multiple with attention mask,
    matching the reference's pad_to_multiple_of=n_samples behavior."""
    wav = rng.standard_normal(int(16000 * 42.0)).astype(np.float32) * 0.05
    feats, attn = mel_ops.extract_features(wav)
    assert feats.shape == (80, 6000)
    assert attn.shape == (6000,)  # mel-frame level (HF FE downsamples by hop)
    assert attn.sum() == -(-wav.shape[0] // mel_ops.HOP_LENGTH)

    fe = WhisperFeatureExtractor(feature_size=80)
    hf_out = fe(wav, sampling_rate=16000, return_tensors="np",
                truncation=False, padding="longest",
                pad_to_multiple_of=fe.n_samples)["input_features"][0]
    np.testing.assert_allclose(feats, hf_out, atol=5e-5, rtol=1e-5)


def test_jit_and_batch(rng):
    import jax

    wavs = rng.standard_normal((3, mel_ops.N_SAMPLES)).astype(np.float32) * 0.1
    fn = jax.jit(mel_ops.log_mel_spectrogram, static_argnums=1)
    out = fn(wavs, 80)
    assert out.shape == (3, 80, 3000)
    # per-sample dynamic-range floor must be independent across the batch
    single = mel_ops.log_mel_spectrogram(wavs[1:2], 80)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single[0]),
                               atol=1e-6)


def test_numpy_mel_matches_jnp():
    """Host numpy mel (dataloader path) == on-device jnp mel to ~1e-5."""
    import numpy as np

    from ts_asr_whisper_tpu.ops.mel import log_mel_numpy, log_mel_spectrogram

    rng = np.random.default_rng(5)
    wav = (rng.standard_normal((2, 480_000)) * 0.1).astype(np.float32)
    a = np.asarray(log_mel_spectrogram(wav))
    b = log_mel_numpy(wav)
    assert a.shape == b.shape == (2, 80, 3000)
    assert np.max(np.abs(a - b)) < 2e-5
