"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from ts_asr_whisper_tpu.config import Cfg
from ts_asr_whisper_tpu.models.config import DiCoWConfig
from ts_asr_whisper_tpu.models.dicow import init_dicow
from ts_asr_whisper_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    shard_batch,
)
from ts_asr_whisper_tpu.training.optim import build_optimizer
from ts_asr_whisper_tpu.training.trainer import make_train_step

CFG = DiCoWConfig(vocab_size=1700, num_mel_bins=24, d_model=64,
                  encoder_layers=8, decoder_layers=2,
                  encoder_attention_heads=4, decoder_attention_heads=4,
                  encoder_ffn_dim=128, decoder_ffn_dim=128,
                  max_source_positions=48, max_target_positions=32,
                  decoder_start_token_id=31, eos_token_id=30,
                  pad_token_id=30, bos_token_id=30, dtype="float32",
                  ctc_weight=0.3, use_fddt=True, use_pre_pos_fddt=True,
                  additional_self_attention_layer=True,
                  pre_ctc_sub_sample=True)


def _batch(b):
    rng = np.random.default_rng(0)
    labels = np.concatenate(
        [rng.integers(0, 150, (b, 10)).astype(np.int32),
         np.full((b, 2), -100, np.int32)], axis=1)
    return {
        "input_features": rng.standard_normal((b, 24, 96)).astype(np.float32),
        "stno_mask": np.full((b, 4, 48), 0.25, np.float32),
        "labels": labels,
        "upp_labels": labels.copy(),
    }


def test_param_shardings_zero_style():
    mesh = make_mesh((8,), ("data",))
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    shardings = param_shardings(params, mesh, shard_params=True)
    # layer-stacked encoder leaves (L=8) shard over the mesh
    enc_q = shardings["encoder"]["layers"]["self_attn"]["q_proj"]["kernel"]
    assert enc_q.spec == P("data")
    # small vectors stay replicated
    ln = shardings["encoder"]["layer_norm"]["scale"]
    assert ln.spec == P()


def test_dp_train_step_on_mesh():
    mesh = make_mesh((8,), ("data",))
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    shardings = param_shardings(params, mesh, shard_params=True)
    params = jax.tree.map(jax.device_put, params, shardings)

    cfg = Cfg()
    cfg.training.use_custom_optimizer = True
    cfg.training.warmup_steps = 0  # linear warmup gives lr=0 at step 0
    tx, opt_state = build_optimizer(params, cfg.training,
                                    prefixes_to_preheat=["encoder/fddts"],
                                    frozen_keywords=[])
    step_fn, eval_fn = make_train_step(CFG, tx, num_prefix_tokens=2)

    batch = shard_batch(_batch(8), mesh)
    before = np.asarray(params["encoder"]["conv1"]["bias"]).copy()
    params2, opt_state, parts = step_fn(params, opt_state, batch)
    assert np.isfinite(float(parts["loss"]))
    assert np.isfinite(float(parts["grad_norm"]))
    after = np.asarray(params2["encoder"]["conv1"]["bias"])
    assert np.abs(after - before).max() > 0  # something trained

    # eval loss computes under the same shardings
    eval_parts = eval_fn(params2, batch)
    assert np.isfinite(float(eval_parts["loss"]))


def test_dp_matches_single_device():
    """Loss on the 8-device mesh equals the single-device loss."""
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    cfg = Cfg()
    tx, _ = build_optimizer(params, cfg.training)
    _, eval_fn = make_train_step(CFG, tx, num_prefix_tokens=2)

    batch = _batch(8)
    loss_single = float(eval_fn(params, batch)["loss"])

    mesh = make_mesh((8,), ("data",))
    sharded_params = jax.tree.map(
        jax.device_put, params, param_shardings(params, mesh, False))
    loss_mesh = float(eval_fn(sharded_params, shard_batch(batch, mesh))["loss"])
    np.testing.assert_allclose(loss_mesh, loss_single, rtol=1e-5)


def test_tp_shardings_and_train_step():
    """dp x tp mesh: Megatron-style column/row placement lands on the
    right axes, the jitted train step runs, and the loss matches the
    single-device value (TP is a pure re-layout)."""
    mesh = make_mesh((4, 2), ("data", "model"))
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    shardings = param_shardings(params, mesh, shard_params=True,
                                tp_axis="model")
    layers = shardings["encoder"]["layers"]
    assert layers["self_attn"]["q_proj"]["kernel"].spec == P("data", None, "model")
    assert layers["self_attn"]["out_proj"]["kernel"].spec == P("data", "model")
    assert layers["fc1"]["kernel"].spec == P("data", None, "model")
    assert layers["fc1"]["bias"].spec == P("data", "model")
    assert layers["fc2"]["kernel"].spec == P("data", "model")
    assert layers["fc2"]["bias"].spec == P("data")
    assert shardings["encoder"]["layer_norm"]["scale"].spec == P()

    params_tp = jax.tree.map(jax.device_put, params, shardings)
    cfg = Cfg()
    cfg.training.use_custom_optimizer = True
    cfg.training.warmup_steps = 0
    tx, opt_state = build_optimizer(params_tp, cfg.training,
                                    prefixes_to_preheat=["encoder/fddts"],
                                    frozen_keywords=[])
    step_fn, eval_fn = make_train_step(CFG, tx, num_prefix_tokens=2)
    batch = _batch(8)
    loss_single = float(eval_fn(params, batch)["loss"])

    dev_batch = shard_batch(batch, mesh)
    params2, opt_state, parts = step_fn(params_tp, opt_state, dev_batch)
    assert np.isfinite(float(parts["grad_norm"]))
    np.testing.assert_allclose(float(parts["loss"]), loss_single, rtol=1e-5)
    # updated params keep their TP placement (no silent re-replication)
    q_after = params2["encoder"]["layers"]["self_attn"]["q_proj"]["kernel"]
    assert q_after.sharding.spec == P("data", None, "model")
