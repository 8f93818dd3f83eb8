"""topk_thresholded must equal lax.top_k bit-for-bit, ties included."""

import numpy as np

import jax
import jax.numpy as jnp

from ts_asr_whisper_tpu.ops.topk import topk_thresholded


def _check(x, k):
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), k)
    v, i = topk_thresholded(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_random_rows():
    rng = np.random.default_rng(0)
    _check(rng.standard_normal((8, 4096)).astype(np.float32), 10)


def test_tie_heavy():
    rng = np.random.default_rng(1)
    # few distinct values -> many threshold ties, exercising the
    # index-order tie admission
    x = rng.choice(np.float32([-1e9, -2.0, 0.0, 0.5, 3.0]), (16, 2048))
    _check(x.astype(np.float32), 12)


def test_all_equal_and_neg_fill():
    x = np.full((4, 512), -1e9, np.float32)
    x[1, 37] = 1.0
    x[2, [5, 9]] = [2.0, 2.0]
    _check(x, 8)


def test_k_equals_width():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 16)).astype(np.float32)
    _check(x, 16)


def test_beam_shape():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((8, 51866 * 5)).astype(np.float32)
    # sprinkle exact duplicates across beam copies (common: identical
    # prefix scores in different beams)
    x[:, 51866:] = np.tile(x[:, :51866], (1, 4))
    _check(x, 10)
