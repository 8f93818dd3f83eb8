"""LoRA: init/merge semantics + only-adapters-train optimization."""

import numpy as np

import jax
import jax.numpy as jnp

from ts_asr_whisper_tpu.models.config import DiCoWConfig
from ts_asr_whisper_tpu.models.dicow import init_dicow
from ts_asr_whisper_tpu.training.lora import init_lora, merge_lora

CFG = DiCoWConfig(vocab_size=1700, num_mel_bins=24, d_model=32,
                  encoder_layers=2, decoder_layers=2,
                  encoder_attention_heads=2, decoder_attention_heads=2,
                  encoder_ffn_dim=64, decoder_ffn_dim=64,
                  max_source_positions=48, max_target_positions=32,
                  decoder_start_token_id=31, eos_token_id=30,
                  pad_token_id=30, bos_token_id=30, dtype="float32")


def test_lora_identity_at_init():
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    merged = merge_lora(params, lora)
    # B=0 at init -> merge is the identity
    k0 = params["decoder"]["layers"]["self_attn"]["q_proj"]["kernel"]
    k1 = merged["decoder"]["layers"]["self_attn"]["q_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    # targets present in the lora tree, non-targets absent
    assert "q_proj" in lora["decoder"]["layers"]["self_attn"]
    assert "k_proj" not in lora["decoder"]["layers"]["self_attn"]


def test_lora_merge_changes_targets_only():
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    # perturb B
    lora = jax.tree.map(lambda x: x + 0.1, lora)
    merged = merge_lora(params, lora, alpha=16.0, rank=4)
    q0 = np.asarray(params["decoder"]["layers"]["self_attn"]["q_proj"]["kernel"])
    q1 = np.asarray(merged["decoder"]["layers"]["self_attn"]["q_proj"]["kernel"])
    assert np.abs(q1 - q0).max() > 0
    k0 = np.asarray(params["decoder"]["layers"]["self_attn"]["k_proj"]["kernel"])
    k1 = np.asarray(merged["decoder"]["layers"]["self_attn"]["k_proj"]["kernel"])
    np.testing.assert_array_equal(k0, k1)
    # encoder untouched (scope='decoder')
    e0 = jax.tree.leaves(params["encoder"])
    e1 = jax.tree.leaves(merged["encoder"])
    for a, b in zip(e0, e1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_grads_flow():
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    x = jnp.ones((1, 4), jnp.int32)

    def loss(lora):
        merged = merge_lora(params, lora)
        from ts_asr_whisper_tpu.models.whisper import decoder_forward

        enc = jnp.zeros((1, CFG.max_source_positions, CFG.d_model))
        h = decoder_forward(merged["decoder"], CFG, x, enc)
        return (h**2).mean()

    g = jax.grad(loss)(lora)
    ga = np.asarray(
        g["decoder"]["layers"]["self_attn"]["q_proj"]["lora_A"])
    assert np.abs(ga).max() >= 0  # finite, structured
    gb = np.asarray(
        g["decoder"]["layers"]["self_attn"]["q_proj"]["lora_B"])
    assert np.isfinite(gb).all()
    assert np.abs(gb).max() > 0  # B receives signal through A != 0
