"""Loss parity: CTC vs torch.nn.functional.ctc_loss; soft-label CE semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ts_asr_whisper_tpu.models.config import DiCoWConfig  # noqa: E402
from ts_asr_whisper_tpu.models.losses import (  # noqa: E402
    decoder_ce_loss,
    prepare_ctc_labels,
    timestamp_smoothing_matrix,
)
from ts_asr_whisper_tpu.ops.ctc import (  # noqa: E402
    ctc_greedy_decode,
    ctc_loss,
    ctc_loss_from_padded_labels,
)


def _torch_ctc(logits, labels, logit_lens, label_lens, blank, reduction="mean"):
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    return torch.nn.functional.ctc_loss(
        lp, torch.tensor(labels), torch.tensor(logit_lens),
        torch.tensor(label_lens), blank=blank, reduction=reduction,
        zero_infinity=True).item()


@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_ctc_loss_matches_torch(rng, reduction):
    b, t, v = 3, 20, 12
    blank = v - 1
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    label_lens = np.array([5, 8, 1], dtype=np.int32)
    logit_lens = np.array([20, 17, 20], dtype=np.int32)
    labels = np.zeros((b, 8), dtype=np.int32)
    for i, n in enumerate(label_lens):
        labels[i, :n] = rng.integers(0, v - 1, n)

    ref = _torch_ctc(logits, labels, logit_lens, label_lens, blank, reduction)
    ours = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                          jnp.asarray(logit_lens), jnp.asarray(label_lens),
                          blank, reduction=reduction))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-5)


def test_ctc_loss_impossible_alignment_zeroed(rng):
    """Labels longer than frames -> inf NLL -> zero (zero_infinity)."""
    b, t, v = 1, 4, 8
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = np.array([[1, 2, 3, 4, 5, 6]], dtype=np.int32)
    ours = float(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                          jnp.asarray([t]), jnp.asarray([6]), v - 1))
    assert ours == 0.0


def test_ctc_padded_labels_wrapper(rng):
    b, t, v = 2, 15, 10
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = np.full((b, 6), -100, dtype=np.int32)
    labels[0, :4] = [1, 2, 2, 3]
    labels[1, :2] = [5, 7]
    ref = _torch_ctc(logits, np.where(labels < 0, 0, labels),
                     [t, t], [4, 2], v - 1)
    ours = float(ctc_loss_from_padded_labels(jnp.asarray(logits),
                                             jnp.asarray(labels), v - 1))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-5)


def test_ctc_greedy_decode():
    # argmax ids: [1 1 blank 2 2 3 blank blank] -> [1 2 3]
    v, blank = 5, 4
    ids = [1, 1, 4, 2, 2, 3, 4, 4]
    logits = np.full((1, len(ids), v), -10.0, dtype=np.float32)
    for t, i in enumerate(ids):
        logits[0, t, i] = 10.0
    out = np.asarray(ctc_greedy_decode(jnp.asarray(logits), blank))
    assert out[0, :3].tolist() == [1, 2, 3]
    assert (out[0, 3:] == -1).all()


def _np_soft_ce_oracle(logits, labels, upp_labels, ts_begin, ts_matrix):
    """Direct numpy transcription of SoftLabelCreator.compute_loss
    (modeling_dicow.py:95-144)."""
    v = logits.shape[-1]
    flat_logits = logits.reshape(-1, v).astype(np.float64)
    logp = flat_logits - np.log(np.exp(
        flat_logits - flat_logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        - flat_logits.max(-1, keepdims=True)

    def soft_dist(lab):
        lab = lab.reshape(-1)
        soft = np.zeros((lab.size, v))
        soft[np.arange(lab.size), np.clip(lab, 0, None)] = 1.0
        is_ts = lab >= ts_begin
        soft[is_ts] = 0.0
        soft[np.ix_(is_ts, np.arange(ts_begin, v))] = ts_matrix[lab[is_ts] - ts_begin]
        return soft

    l1 = -(soft_dist(labels) * logp).sum(-1)
    l2 = -(soft_dist(upp_labels) * logp).sum(-1)
    mask = (labels.reshape(-1) != -100)
    comb = np.minimum(l1, l2) * mask
    return comb.sum() / max(mask.sum(), 1)


def test_decoder_ce_loss_matches_oracle(rng):
    v = 1600  # > 1507 so timestamps exist
    cfg = DiCoWConfig(vocab_size=v, dtype="float32", eos_token_id=80,
                      pad_token_id=80, bos_token_id=80,
                      decoder_start_token_id=81)
    ts_begin = cfg.timestamp_begin
    b, t = 2, 6
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = np.array([
        [3, ts_begin + 10, 7, ts_begin + 50, -100, -100],
        [ts_begin, 5, 9, 11, 2, cfg.eos_token_id - 1],
    ], dtype=np.int32)
    # upper-case variant differs on a couple of letter tokens
    upp = labels.copy()
    upp[0, 2] = 8
    upp[1, 1] = 6

    ts_matrix = timestamp_smoothing_matrix()
    ref = _np_soft_ce_oracle(logits, labels, upp, ts_begin, ts_matrix)
    ours = float(decoder_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                                 jnp.asarray(upp), cfg))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_timestamp_matrix_properties():
    m = timestamp_smoothing_matrix()
    assert m.shape == (1501, 1501)
    np.testing.assert_allclose(m.sum(1), 1.0, atol=1e-5)
    # peak on the diagonal, symmetric-ish decay
    assert (np.argmax(m, axis=1) == np.arange(1501)).all()


def test_prepare_ctc_labels():
    cfg = DiCoWConfig(vocab_size=1600, remove_timestamps_from_ctc=True,
                      eos_token_id=80, pad_token_id=80, bos_token_id=80,
                      decoder_start_token_id=81)
    ts = cfg.timestamp_begin
    labels = np.array([
        [50, 51, 7, ts + 3, 9, cfg.eos_token_id, -100],
        [50, 51, ts, 2, 3, 4, cfg.eos_token_id],
    ], dtype=np.int32)
    out = np.asarray(prepare_ctc_labels(jnp.asarray(labels), cfg,
                                        num_prefix_tokens=2))
    assert out[0].tolist()[:2] == [7, 9]
    assert (out[0][2:] == -100).all()
    assert out[1].tolist()[:3] == [2, 3, 4]
    assert (out[1][3:] == -100).all()
