"""Checkpoint save/restore round-trip + HF export integrity."""

import numpy as np

import jax

from ts_asr_whisper_tpu.models.config import DiCoWConfig
from ts_asr_whisper_tpu.models.convert import hf_to_params, load_safetensors_dir
from ts_asr_whisper_tpu.models.dicow import init_dicow
from ts_asr_whisper_tpu.training.checkpoints import (
    export_hf_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)

CFG = DiCoWConfig(vocab_size=1700, num_mel_bins=24, d_model=32,
                  encoder_layers=2, decoder_layers=2,
                  encoder_attention_heads=2, decoder_attention_heads=2,
                  encoder_ffn_dim=64, decoder_ffn_dim=64,
                  max_source_positions=48, max_target_positions=32,
                  decoder_start_token_id=31, eos_token_id=30,
                  pad_token_id=30, bos_token_id=30, dtype="float32",
                  ctc_weight=0.3, use_fddt=True, use_pre_pos_fddt=True,
                  additional_self_attention_layer=True,
                  pre_ctc_sub_sample=True)


def test_orbax_roundtrip(tmp_path):
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    save_checkpoint(str(tmp_path / "ckpt"), params, step=7)
    save_checkpoint(str(tmp_path / "ckpt"), params, step=12, keep=1)
    # keep=1 pruned step_7
    assert not (tmp_path / "ckpt" / "step_7").exists()
    state, step = restore_checkpoint(str(tmp_path / "ckpt"),
                                     {"params": params})
    assert step == 12
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hf_export_reimport(tmp_path):
    params = init_dicow(jax.random.PRNGKey(1), CFG)
    export_hf_checkpoint(params, CFG, str(tmp_path / "hf"))
    assert (tmp_path / "hf" / "config.json").exists()
    sd = load_safetensors_dir(str(tmp_path / "hf" / "model.safetensors"))
    params2 = hf_to_params(sd, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
