"""Parity tests: our DiCoW encoder/model vs the PyTorch reference (fp32).

The reference implementation is imported read-only as an oracle
(tests/oracles.py); random weights, deterministic inputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ts_asr_whisper_tpu.models.config import DiCoWConfig  # noqa: E402
from ts_asr_whisper_tpu.models.convert import params_from_torch_model  # noqa: E402
from ts_asr_whisper_tpu.models import dicow as md  # noqa: E402
from ts_asr_whisper_tpu.models import whisper as w  # noqa: E402

try:
    from oracles import load_reference_dicow

    RefConfig, RefModel = load_reference_dicow()
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference oracle unavailable")

# vocab must be > 30*50+1+6 so first_task_token/timestamps exist
BASE_KW = dict(
    vocab_size=1600,
    num_mel_bins=24,
    d_model=64,
    encoder_layers=3,
    decoder_layers=2,
    encoder_attention_heads=4,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    max_source_positions=48,
    max_target_positions=32,
    decoder_start_token_id=1598,
    eos_token_id=1597,
    pad_token_id=1597,
    bos_token_id=1597,
)

DICOW_KW = dict(
    ctc_weight=0.3,
    use_fddt=True,
    fddt_is_diagonal=True,
    fddt_bias_only=False,
    use_pre_pos_fddt=True,
    non_target_fddt_value=0.5,
    fddt_init="random",  # random init exercises real (non-identity) weights
    additional_self_attention_layer=True,
    pre_ctc_sub_sample=True,
)


def _make_pair(dicow_overrides=None, seed=0):
    kw = dict(DICOW_KW)
    if dicow_overrides:
        kw.update(dicow_overrides)
    torch.manual_seed(seed)
    ref_cfg = RefConfig(**BASE_KW, **kw)
    ref = RefModel(ref_cfg).eval()
    cfg = DiCoWConfig(**BASE_KW, **kw, dtype="float32")
    params = params_from_torch_model(ref, cfg)
    return ref, cfg, params


def _inputs(rng, b=2):
    t_mel = BASE_KW["max_source_positions"] * 2
    feats = rng.standard_normal((b, BASE_KW["num_mel_bins"], t_mel)).astype(np.float32)
    # random soft STNO mask, rows sum to 1
    raw = rng.random((b, 4, BASE_KW["max_source_positions"])).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    return feats, stno


def test_encoder_parity_fddt(rng):
    ref, cfg, params = _make_pair()
    feats, stno = _inputs(rng)
    with torch.no_grad():
        out_ref = ref.model.encoder(
            torch.tensor(feats), stno_mask=torch.tensor(stno)
        ).last_hidden_state.numpy()
    ours = np.asarray(md.dicow_encoder_forward(
        params["encoder"], cfg, jnp.asarray(feats), jnp.asarray(stno)))
    np.testing.assert_allclose(ours, out_ref, atol=5e-5, rtol=1e-4)


def test_encoder_parity_bias_only(rng):
    ref, cfg, params = _make_pair({"fddt_bias_only": True})
    feats, stno = _inputs(rng)
    with torch.no_grad():
        out_ref = ref.model.encoder(
            torch.tensor(feats), stno_mask=torch.tensor(stno)
        ).last_hidden_state.numpy()
    ours = np.asarray(md.dicow_encoder_forward(
        params["encoder"], cfg, jnp.asarray(feats), jnp.asarray(stno)))
    np.testing.assert_allclose(ours, out_ref, atol=5e-5, rtol=1e-4)


def test_encoder_parity_full_linear_fddt(rng):
    ref, cfg, params = _make_pair({"fddt_is_diagonal": False,
                                   "fddt_init": "suppressive"})
    feats, stno = _inputs(rng)
    with torch.no_grad():
        out_ref = ref.model.encoder(
            torch.tensor(feats), stno_mask=torch.tensor(stno)
        ).last_hidden_state.numpy()
    ours = np.asarray(md.dicow_encoder_forward(
        params["encoder"], cfg, jnp.asarray(feats), jnp.asarray(stno)))
    np.testing.assert_allclose(ours, out_ref, atol=5e-5, rtol=1e-4)


def test_encoder_parity_partial_fddt_layers(rng):
    ref, cfg, params = _make_pair({"apply_fddt_to_n_layers": 2})
    feats, stno = _inputs(rng)
    with torch.no_grad():
        out_ref = ref.model.encoder(
            torch.tensor(feats), stno_mask=torch.tensor(stno)
        ).last_hidden_state.numpy()
    ours = np.asarray(md.dicow_encoder_forward(
        params["encoder"], cfg, jnp.asarray(feats), jnp.asarray(stno)))
    np.testing.assert_allclose(ours, out_ref, atol=5e-5, rtol=1e-4)


def test_ctc_logits_parity(rng):
    ref, cfg, params = _make_pair()
    feats, stno = _inputs(rng)
    with torch.no_grad():
        hidden_ref = ref.model.encoder(
            torch.tensor(feats), stno_mask=torch.tensor(stno)
        ).last_hidden_state
        logits_ref = ref.get_enc_logits(hidden_ref).numpy()
    ours_hidden = md.dicow_encoder_forward(
        params["encoder"], cfg, jnp.asarray(feats), jnp.asarray(stno))
    ours = np.asarray(md.encoder_ctc_logits(params["encoder"], cfg, ours_hidden))
    assert ours.shape == logits_ref.shape  # incl. the /4 subsample + vocab+1
    np.testing.assert_allclose(ours, logits_ref, atol=1e-4, rtol=1e-4)


def test_full_forward_parity(rng):
    ref, cfg, params = _make_pair()
    feats, stno = _inputs(rng)
    dec_ids = np.array([[1598, 5, 17, 200], [1598, 900, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        out_ref = ref(
            input_features=torch.tensor(feats),
            stno_mask=torch.tensor(stno),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.numpy()
    logits, _ = md.dicow_forward(params, cfg, jnp.asarray(feats),
                                 jnp.asarray(stno), jnp.asarray(dec_ids))
    np.testing.assert_allclose(np.asarray(logits), out_ref, atol=5e-4, rtol=1e-4)


def test_se_dicow_scb_parity(rng):
    """SE-DiCoW: explicit stream axis must match the reference's interleaved
    batch trick (encoder.py:152-154,208-213)."""
    ref, cfg, params = _make_pair({"use_enrollments": True, "scb_layers": 2})
    feats, stno = _inputs(rng)
    e_feats, e_stno = _inputs(np.random.default_rng(7))
    with torch.no_grad():
        out_ref = ref.model.encoder(
            torch.tensor(feats),
            stno_mask=torch.tensor(stno),
            enrollments={"input_features": torch.tensor(e_feats),
                         "stno_mask": torch.tensor(e_stno)},
        ).last_hidden_state.numpy()
    ours = np.asarray(md.dicow_encoder_forward(
        params["encoder"], cfg, jnp.asarray(feats), jnp.asarray(stno),
        jnp.asarray(e_feats), jnp.asarray(e_stno)))
    np.testing.assert_allclose(ours, out_ref, atol=5e-5, rtol=1e-4)
