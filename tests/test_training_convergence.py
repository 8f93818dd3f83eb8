"""Training sanity: loss decreases when overfitting one batch (grads,
optimizer groups, preheat schedule, and accumulation all exercised)."""

import numpy as np

import jax

from ts_asr_whisper_tpu.config import Cfg
from ts_asr_whisper_tpu.models.config import DiCoWConfig
from ts_asr_whisper_tpu.models.dicow import init_dicow
from ts_asr_whisper_tpu.training.optim import build_optimizer
from ts_asr_whisper_tpu.training.trainer import make_train_step

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


def _batch(b=2):
    rng = np.random.default_rng(0)
    labels = np.concatenate(
        [rng.integers(0, 150, (b, 8)).astype(np.int32),
         np.full((b, 2), -100, np.int32)], axis=1)
    return {
        "input_features": rng.standard_normal((b, 24, 96)).astype(np.float32),
        "stno_mask": np.full((b, 4, 48), 0.25, np.float32),
        "labels": labels,
        "upp_labels": labels.copy(),
    }


def test_overfit_one_batch():
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    t = Cfg().training
    t.learning_rate = 3e-3
    t.warmup_steps = 0
    t.lr_scheduler_type = "constant"
    t.use_custom_optimizer = False
    tx, opt_state = build_optimizer(params, t)
    step_fn, _ = make_train_step(CFG, tx, num_prefix_tokens=2)
    batch = _batch()
    losses = []
    for _ in range(25):
        params, opt_state, parts = step_fn(params, opt_state, batch)
        losses.append(float(parts["loss"]))
    assert losses[-1] < losses[0] * 0.6, losses[::6]
    assert np.isfinite(losses).all()


def test_grad_accumulation_matches_big_batch():
    """MultiSteps(k) over k micro-batches == one k-sized batch update."""
    import optax

    params = init_dicow(jax.random.PRNGKey(0), CFG)
    t = Cfg().training
    t.learning_rate = 1e-3
    t.warmup_steps = 0
    t.lr_scheduler_type = "constant"
    t.use_custom_optimizer = False

    big = _batch(4)
    micro1 = {k: v[:2] for k, v in big.items()}
    micro2 = {k: v[2:] for k, v in big.items()}

    # the train step donates params/opt_state buffers; keep host copies
    params_np = jax.tree.map(lambda x: np.asarray(x).copy(), params)

    def fresh():
        import jax.numpy as jnp

        return jax.tree.map(jnp.asarray, params_np)

    tx_big, st_big = build_optimizer(params, t)
    step_big, _ = make_train_step(CFG, tx_big, num_prefix_tokens=2)
    p_big, _, _ = step_big(fresh(), st_big, big)

    p0 = fresh()
    tx_acc, _ = build_optimizer(p0, t)
    tx_acc = optax.MultiSteps(tx_acc, 2)
    st_acc = tx_acc.init(p0)
    step_acc, _ = make_train_step(CFG, tx_acc, num_prefix_tokens=2)
    p_acc, st_acc, _ = step_acc(p0, st_acc, micro1)
    # first micro-step must not change params
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(params_np)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p_acc, st_acc, _ = step_acc(p_acc, st_acc, micro2)

    # accumulated update ~= big-batch update (losses are batch means)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3)


def test_trainer_early_stopping_and_eval_cadence(tmp_path):
    """Eval fires on the step cadence; early stopping halts after patience
    non-improving evals (reference trainers/early-stopping semantics)."""
    from ts_asr_whisper_tpu.config import Cfg
    from ts_asr_whisper_tpu.training.trainer import Trainer

    cfg = Cfg()
    t = cfg.training
    t.output_dir = str(tmp_path)
    t.max_steps = 50
    t.logging_steps = 100
    t.eval_strategy = "steps"
    t.eval_steps = 2
    t.save_strategy = "no"
    t.warmup_steps = 0
    t.use_fddt_only_n_steps = 0
    t.use_custom_optimizer = False
    t.metric_for_best_model = "wer"
    t.greater_is_better = False
    t.early_stopping_patience = 2
    t.mesh_shape = [1]

    params = init_dicow(jax.random.PRNGKey(0), CFG)
    eval_calls = []

    def eval_fn(params, step):
        eval_calls.append(step)
        # wer never improves after the first eval
        return {"wer": 0.5 + 0.01 * len(eval_calls)}

    trainer = Trainer(cfg, CFG, params, num_prefix_tokens=2, eval_fn=eval_fn)
    batch = _batch(2)

    def batches():
        while True:
            yield batch

    state = trainer.train(batches())
    # evals at steps 2,4,6: first sets best, next two exhaust patience=2
    assert eval_calls == [2, 4, 6]
    assert state.step == 6  # stopped early, not at max_steps
