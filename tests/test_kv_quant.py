"""int8 cross-KV cache quantization (GenerationConfig.cross_kv_quant).

Serving optimization: the cross-attention K/V cache is the dominant HBM read
of every decode step; int8 storage with per-row scales halves it. Lossy, so
it is opt-in — these tests bound the error and check the decode loops accept
the quantized cache end to end.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
from ts_asr_whisper_tpu.decoding.beam import beam_search
from ts_asr_whisper_tpu.decoding.greedy import greedy_decode
from ts_asr_whisper_tpu.models.config import DiCoWConfig
from ts_asr_whisper_tpu.models.whisper import (
    decoder_cached,
    init_decoder,
    init_kv_cache,
    precompute_cross_kv,
    quantize_cross_kv,
)

V = 1700
EOS, SOT = 30, 31
CFG = DiCoWConfig(vocab_size=V, num_mel_bins=24, d_model=64,
                  encoder_layers=2, decoder_layers=2,
                  encoder_attention_heads=4, decoder_attention_heads=4,
                  encoder_ffn_dim=128, decoder_ffn_dim=128,
                  max_source_positions=48, max_target_positions=64,
                  decoder_start_token_id=SOT, eos_token_id=EOS,
                  pad_token_id=EOS, bos_token_id=EOS, dtype="float32")
GEN = GenerationConfig(eos_token_id=EOS, pad_token_id=EOS, bos_token_id=EOS,
                       decoder_start_token_id=SOT,
                       no_timestamps_token_id=V - 1502,
                       return_timestamps=True, max_length=24)


def _setup():
    dec = init_decoder(jax.random.PRNGKey(0), CFG)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 64)) * 0.3
    return {"decoder": dec}, enc


def test_quantize_roundtrip_error_bounded():
    params, enc = _setup()
    k, v = precompute_cross_kv(params["decoder"], CFG, enc)
    q = quantize_cross_kv((k, v))
    assert q["k_q"].dtype == jnp.int8 and q["v_q"].dtype == jnp.int8
    k_hat = q["k_q"].astype(jnp.float32) * q["k_scale"]
    # symmetric per-row int8: worst-case error = half a quantization step
    step = q["k_scale"][..., 0]
    err = jnp.max(jnp.abs(k_hat - k), axis=-1)
    assert float(jnp.max(err - 0.5 * step - 1e-6)) <= 0.0


def test_decoder_cached_quantized_close_to_exact():
    params, enc = _setup()
    cross = precompute_cross_kv(params["decoder"], CFG, enc)
    ids = jnp.asarray([[SOT, 40, 41], [SOT, 42, 43]], jnp.int32)

    h_exact, _ = decoder_cached(params["decoder"], CFG, ids, 0,
                                init_kv_cache(CFG, 2, 8), cross)
    h_quant, _ = decoder_cached(params["decoder"], CFG, ids, 0,
                                init_kv_cache(CFG, 2, 8),
                                quantize_cross_kv(cross))
    scale = float(jnp.std(h_exact))
    assert float(jnp.max(jnp.abs(h_exact - h_quant))) < 0.05 * scale


def test_greedy_decode_with_quantized_cache():
    params, enc = _setup()
    prompts = jnp.full((2, 1), SOT, jnp.int32)
    exact = greedy_decode(params, CFG, GEN, enc, prompts, max_new_tokens=12)
    quant = greedy_decode(params, CFG,
                          GEN.__class__(**{**GEN.__dict__,
                                           "cross_kv_quant": True}),
                          enc, prompts, max_new_tokens=12)
    # deterministic seed: the ~0.5% quantization error does not flip argmax
    np.testing.assert_array_equal(np.asarray(exact.sequences),
                                  np.asarray(quant.sequences))


def test_beam_search_with_quantized_cache():
    params, enc = _setup()
    prompts = jnp.full((2, 1), SOT, jnp.int32)
    gen_q = GEN.__class__(**{**GEN.__dict__, "cross_kv_quant": True})
    out = beam_search(params, CFG, gen_q, enc, prompts, num_beams=2,
                      max_new_tokens=10)
    seq = np.asarray(out.sequences)
    assert seq.shape[0] == 2
    assert np.isfinite(np.asarray(out.scores)).all()
