"""Augmentations: SpecAug shape/masking, STNO corruption invariants,
speed perturb, collator joint SpecAug alignment."""

import numpy as np

from ts_asr_whisper_tpu.data.augmentations import (
    SpecAug,
    mask_along_axis,
    speed_perturb,
    stno_gaussian_noise,
    stno_soft_segment_augment,
    time_warp,
)


def test_spec_aug_shapes_and_masking(rng):
    x = rng.standard_normal((2, 200, 80)).astype(np.float32) + 5.0
    aug = SpecAug()
    np.random.seed(0)
    import random

    random.seed(0)
    out = aug(x)
    assert out.shape == x.shape
    # masking introduces exact zeros somewhere
    assert (out == 0.0).sum() > 0
    # input untouched
    assert (x != 0.0).all()


def test_mask_along_axis_zeroes_band(rng):
    x = np.ones((50, 20), dtype=np.float32)
    np.random.seed(1)
    out = mask_along_axis(x.copy(), dim=0, num_masks=1, width_range=(5, 5))
    zero_rows = np.where((out == 0).all(axis=1))[0]
    assert len(zero_rows) == 5
    assert np.all(np.diff(zero_rows) == 1)  # contiguous band


def test_time_warp_preserves_shape(rng):
    x = rng.standard_normal((100, 24)).astype(np.float32)
    import random

    random.seed(2)
    out = time_warp(x, window=5)
    assert out.shape == x.shape


def test_stno_gaussian_noise_keeps_distribution(rng):
    np.random.seed(3)
    m = rng.random((4, 4, 50)).astype(np.float32)
    m /= m.sum(axis=1, keepdims=True)
    out = stno_gaussian_noise(m, variance=0.2, fraction=1.0)
    assert out.shape == m.shape
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)
    assert (out >= 0).all()
    assert np.abs(out - m).max() > 0


def test_stno_segment_augment_renormalizes(rng):
    np.random.seed(4)
    m = rng.random((2, 4, 100)).astype(np.float32)
    m /= m.sum(axis=1, keepdims=True)
    out = stno_soft_segment_augment(m, change_prob=1.0, min_seg_len=10,
                                    max_seg_len=20)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)
    assert np.abs(out - m).max() > 0.1  # segments actually flipped


def test_speed_perturb_changes_length(rng):
    import random

    wav = rng.standard_normal(16000).astype(np.float32)
    random.seed(5)
    out = speed_perturb(wav, 16000, factors=(1.1,))
    assert abs(len(out) - int(16000 / 1.1)) < 20


def test_collator_joint_specaug_keeps_stno_normalized(rng):
    """Joint mel+STNO SpecAug must keep shapes aligned (collators.py:209-214
    semantics). STNO columns zeroed by time masks are legal (they mirror
    masked mel), so only shape/alignment is asserted."""
    from ts_asr_whisper_tpu.data.collators import DataCollator
    from ts_asr_whisper_tpu.data.tokenizer import ByteLevelTokenizer

    tok = ByteLevelTokenizer(2000)
    coll = DataCollator(tokenizer=tok, bos_token_id=tok.bos_token_id,
                        spec_aug_prob=1.0, stno_segment_augment_prob=0.0,
                        stno_gaussian_noise_var=None)
    samples = []
    for _ in range(2):
        samples.append({
            "input_features": rng.standard_normal((80, 3000)).astype(np.float32),
            "stno_mask": np.full((1500, 4), 0.25, np.float32),
            "attention_mask": np.ones(3000, np.int32),
            "transcript": "hello there",
            "is_long_form": False,
            "language": "en",
        })
    batch = coll(samples)
    assert batch["input_features"].shape == (2, 80, 3000)
    assert batch["stno_mask"].shape == (2, 4, 1500)


def test_interp_time_bicubic_matches_torch():
    """The 4-tap cubic-convolution resample must match torch
    F.interpolate(mode='bicubic', align_corners=False) along time."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from ts_asr_whisper_tpu.data.augmentations import _interp_time_bicubic

    rng = np.random.default_rng(0)
    for t, new_len in [(100, 137), (137, 100), (300, 301), (50, 13)]:
        x = rng.standard_normal((t, 24)).astype(np.float32)
        ours = _interp_time_bicubic(x, new_len)
        ref = F.interpolate(torch.tensor(x)[None, None], size=(new_len, 24),
                            mode="bicubic", align_corners=False)[0, 0].numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
