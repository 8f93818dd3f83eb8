"""Bit-level parity tests: our functional Whisper core vs HF torch (fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from transformers import WhisperConfig, WhisperForConditionalGeneration  # noqa: E402

from ts_asr_whisper_tpu.models.config import DiCoWConfig  # noqa: E402
from ts_asr_whisper_tpu.models.convert import (  # noqa: E402
    hf_to_params,
    params_from_torch_model,
    params_to_hf,
)
from ts_asr_whisper_tpu.models import whisper as w  # noqa: E402

# small-but-real dims; short audio context to keep CPU tests fast
HF_KW = dict(
    vocab_size=1000,
    num_mel_bins=24,
    d_model=64,
    encoder_layers=2,
    decoder_layers=2,
    encoder_attention_heads=4,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    max_source_positions=48,
    max_target_positions=32,
    decoder_start_token_id=998,
    eos_token_id=997,
    pad_token_id=997,
    bos_token_id=997,
)


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(WhisperConfig(**HF_KW)).eval()
    return model


@pytest.fixture(scope="module")
def cfg():
    return DiCoWConfig(**HF_KW, dtype="float32", use_fddt=False)


@pytest.fixture(scope="module")
def params(hf_model, cfg):
    return params_from_torch_model(hf_model, cfg)


def _mel(rng, b=2, cfg=None):
    t = HF_KW["max_source_positions"] * 2
    return rng.standard_normal((b, HF_KW["num_mel_bins"], t)).astype(np.float32)


def test_encoder_parity(hf_model, cfg, params, rng):
    feats = _mel(rng)
    with torch.no_grad():
        ref = hf_model.model.encoder(torch.tensor(feats)).last_hidden_state.numpy()
    ours = np.asarray(w.encoder_forward(params["encoder"], cfg, jnp.asarray(feats)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_full_forward_parity(hf_model, cfg, params, rng):
    feats = _mel(rng)
    dec_ids = np.array([[998, 5, 17, 200], [998, 900, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = hf_model(
            input_features=torch.tensor(feats),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.numpy()
    enc = w.encoder_forward(params["encoder"], cfg, jnp.asarray(feats))
    hid = w.decoder_forward(params["decoder"], cfg, jnp.asarray(dec_ids), enc)
    ours = np.asarray(w.lm_logits(params["decoder"], hid))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-4)


def test_cached_decode_matches_teacher_forcing(cfg, params, rng):
    """prefill + single-token steps must reproduce the parallel decoder."""
    feats = _mel(rng)
    dec_ids = np.array([[998, 5, 17, 200, 7], [998, 900, 3, 42, 11]],
                       dtype=np.int32)
    enc = w.encoder_forward(params["encoder"], cfg, jnp.asarray(feats))

    # parallel (teacher-forced)
    hid = w.decoder_forward(params["decoder"], cfg, jnp.asarray(dec_ids), enc)
    ref_logits = np.asarray(w.lm_logits(params["decoder"], hid))

    # cached: prefill first 3 tokens, then 2 single steps
    cross_kv = w.precompute_cross_kv(params["decoder"], cfg, enc)
    cache = w.init_kv_cache(cfg, batch=2, max_len=16)
    h0, cache = w.decoder_cached(params["decoder"], cfg,
                                 jnp.asarray(dec_ids[:, :3]), 0, cache, cross_kv)
    out = [np.asarray(w.lm_logits(params["decoder"], h0))]
    for t in range(3, 5):
        ht, cache = w.decoder_cached(params["decoder"], cfg,
                                     jnp.asarray(dec_ids[:, t : t + 1]),
                                     t, cache, cross_kv)
        out.append(np.asarray(w.lm_logits(params["decoder"], ht)))
    cached_logits = np.concatenate(out, axis=1)
    np.testing.assert_allclose(cached_logits, ref_logits, atol=2e-4, rtol=1e-4)


def test_roundtrip_export(hf_model, cfg, params):
    sd = params_to_hf(params, cfg)
    ref_sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    missing = set(ref_sd) - set(sd)
    # HF ties proj_out; everything else must round-trip exactly
    assert not missing, f"missing keys: {sorted(missing)[:10]}"
    for k, v in ref_sd.items():
        np.testing.assert_array_equal(sd[k], v, err_msg=k)

    params2 = hf_to_params(sd, cfg)
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(params2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("attn_impl", ["xla", "pallas"])
def test_decoder_cached_ancestry_matches_permuted_cache(attn_impl):
    """decoder_cached_ancestry must equal a decoder_cached step on an
    explicitly permuted cache, for a nontrivial ancestry: rows within each
    beam group pick mixed ancestors across positions. The 'pallas' impl
    (ops/beam_attention.py fused kernel; interpret mode off-TPU) must
    match the XLA formulation."""
    import jax
    import jax.numpy as jnp

    from ts_asr_whisper_tpu.models import whisper as w
    from ts_asr_whisper_tpu.models.config import DiCoWConfig
    from ts_asr_whisper_tpu.models.dicow import init_dicow

    cfg = DiCoWConfig(
        vocab_size=120, num_mel_bins=8, d_model=32, encoder_layers=1,
        decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=16, max_target_positions=32,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=2,
        bos_token_id=2, dtype="float32")
    dec = init_dicow(jax.random.PRNGKey(0), cfg)["decoder"]
    n, b, t_total, pos = 3, 2, 12, 5
    bb = n * b
    rng = np.random.default_rng(7)

    enc = jnp.asarray(rng.standard_normal((bb, 16, 32)).astype(np.float32))
    cross = w.precompute_cross_kv(dec, cfg, enc)
    cache = w.init_kv_cache(cfg, bb, t_total)
    filled = {
        k: v.at[:, :, :, :pos].set(jnp.asarray(
            rng.standard_normal(v[:, :, :, :pos].shape).astype(np.float32)))
        for k, v in cache.items()}
    ids = jnp.asarray(rng.integers(3, 120, (bb, 1)), jnp.int32)

    # per-(row, position) ancestor within the group: valid only for t < pos
    hist = jnp.asarray(rng.integers(0, n, (bb, t_total)), jnp.int32)
    # hist[:, pos] must claim the row itself (the slot the step writes)
    own = jnp.tile(jnp.arange(n, dtype=jnp.int32), b)
    hist = hist.at[:, pos].set(own)

    h_anc, cache_anc = w.decoder_cached_ancestry(
        dec, cfg, ids, jnp.asarray(pos), filled, cross, hist, n,
        attn_impl=attn_impl)

    # reference: materialize each row's history by gathering its ancestors
    group_base = (jnp.arange(bb) // n) * n
    abs_hist = group_base[:, None] + hist            # (Bb, T) absolute rows
    perm = {
        k: jnp.stack([
            jnp.stack([v[:, abs_hist[r, t], :, t] for t in range(t_total)],
                      axis=-2)                       # (L, H, T, hd)
            for r in range(bb)], axis=1)             # (L, Bb, H, T, hd)
        for k, v in filled.items()}
    h_ref, _ = w.decoder_cached(dec, cfg, ids, jnp.asarray(pos), perm, cross)
    np.testing.assert_allclose(np.asarray(h_anc), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)
    # the append itself lands at (row, pos) of the un-permuted cache
    for k in ("k", "v"):
        got = np.asarray(cache_anc[k][:, :, :, pos])
        assert np.abs(got).sum() > 0
