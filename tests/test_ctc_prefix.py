"""CTC prefix scorer parity vs the reference (ESPnet-style) CTCPrefixScore."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

import sys  # noqa: E402

sys.path.insert(0, "/root/reference/src")
from models.dicow.decoding import CTCPrefixScore as RefScorer  # noqa: E402

from ts_asr_whisper_tpu.ops.ctc_prefix import (  # noqa: E402
    ctc_prefix_scores,
    initial_ctc_state,
)

B, T, V = 2, 12, 20
BLANK = V - 1
EOS = 5
K = 6


@pytest.fixture(scope="module")
def logp(rng=None):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, T, V)).astype(np.float32)
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return x


def _ref_step(logp, y, cs, decoded_len, r_prev):
    ref = RefScorer(torch.tensor(logp), BLANK, EOS)
    psi, r = ref(torch.tensor(y), torch.tensor(cs),
                 torch.tensor(decoded_len),
                 torch.ones(len(y), dtype=torch.bool),
                 torch.tensor(r_prev))
    return psi.numpy(), r.numpy()  # r: (B, T, 2, K)


def test_first_step_parity(logp):
    cs = np.array([[1, 2, 3, EOS, 7, 8], [2, 4, 6, EOS, 9, 11]], dtype=np.int64)
    y = np.array([[BLANK], [BLANK]], dtype=np.int64)
    decoded_len = np.array([0, 0])

    r0, _ = initial_ctc_state(jnp.asarray(logp), BLANK)
    ref_psi, ref_r = _ref_step(logp, y, cs, decoded_len, np.asarray(r0))

    psi, states = ctc_prefix_scores(
        jnp.swapaxes(jnp.asarray(logp), 1, 2), jnp.arange(B), jnp.asarray(cs), r0,
        jnp.asarray(decoded_len), jnp.full((B,), BLANK), BLANK, EOS)
    np.testing.assert_allclose(np.asarray(psi), ref_psi, atol=1e-4, rtol=1e-4)
    # states: ref (B, T, 2, K) vs ours (B, K, T, 2)
    ours_r = np.moveaxis(np.asarray(states), 1, 3)  # (B, T, 2, K)
    np.testing.assert_allclose(
        np.clip(ours_r, -1e9, None), np.clip(ref_r, -1e9, None),
        atol=1e-4, rtol=1e-4)


def test_second_step_parity_with_label_repeat(logp):
    cs1 = np.array([[1, 2, 3, EOS, 7, 8], [2, 4, 6, EOS, 9, 11]],
                   dtype=np.int64)
    y1 = np.array([[BLANK], [BLANK]], dtype=np.int64)
    dl1 = np.array([0, 0])
    r0, _ = initial_ctc_state(jnp.asarray(logp), BLANK)

    ref_psi1, ref_r1 = _ref_step(logp, y1, cs1, dl1, np.asarray(r0))
    psi1, states1 = ctc_prefix_scores(
        jnp.swapaxes(jnp.asarray(logp), 1, 2), jnp.arange(B), jnp.asarray(cs1), r0,
        jnp.asarray(dl1), jnp.full((B,), BLANK), BLANK, EOS)

    # choose token index 0 for row 0 (id 1) and index 1 for row 1 (id 4)
    chosen_k = np.array([0, 1])
    chosen_ids = cs1[np.arange(B), chosen_k]
    ref_rprev = ref_r1[np.arange(B), :, :, chosen_k]    # (B, T, 2)
    ours_rprev = np.asarray(states1)[np.arange(B), chosen_k]  # (B, T, 2)
    np.testing.assert_allclose(np.clip(ours_rprev, -1e9, None),
                               np.clip(ref_rprev, -1e9, None),
                               atol=1e-4, rtol=1e-4)

    # step 2: candidates include the JUST-EMITTED label (repeat case)
    cs2 = np.stack([
        np.array([chosen_ids[0], 2, 3, EOS, 7, 8]),
        np.array([chosen_ids[1], 4, 6, EOS, 9, 11]),
    ]).astype(np.int64)
    y2 = np.concatenate([y1, chosen_ids[:, None]], axis=1)
    dl2 = np.array([1, 1])

    ref_psi2, _ = _ref_step(logp, y2, cs2, dl2, ref_rprev)
    psi2, _ = ctc_prefix_scores(
        jnp.swapaxes(jnp.asarray(logp), 1, 2), jnp.arange(B), jnp.asarray(cs2),
        jnp.asarray(ours_rprev), jnp.asarray(dl2),
        jnp.asarray(chosen_ids.astype(np.int32)), BLANK, EOS)
    np.testing.assert_allclose(np.asarray(psi2), ref_psi2,
                               atol=1e-4, rtol=1e-4)


def test_beam_sharing_logp(logp):
    """Hypotheses of the same audio row index the same logp block."""
    num_beams = 3
    bb = B * num_beams
    audio_idx = jnp.arange(bb) // num_beams
    r0, _ = initial_ctc_state(jnp.asarray(logp), BLANK)
    r_prev = r0[np.asarray(audio_idx)]
    cs = np.tile(np.array([[1, 2, 3, EOS, 7, 8]]), (bb, 1)).astype(np.int64)
    psi, _ = ctc_prefix_scores(
        jnp.swapaxes(jnp.asarray(logp), 1, 2), audio_idx, jnp.asarray(cs), r_prev,
        jnp.zeros(bb, jnp.int32), jnp.full((bb,), BLANK), BLANK, EOS)
    psi = np.asarray(psi)
    for b in range(B):
        for j in range(1, num_beams):
            np.testing.assert_allclose(psi[b * num_beams],
                                       psi[b * num_beams + j], atol=1e-6)
