"""Trainer schedule knobs: epoch-based eval/save, eval_delay,
best-checkpoint tracking + load_best_model_at_end, and the
auto_find_batch_size OOM retry (reference trainers.py:141-168,
configs/base.yaml:80-93)."""

import numpy as np

import jax
import jax.numpy as jnp

from ts_asr_whisper_tpu.config import Cfg
from ts_asr_whisper_tpu.models.config import DiCoWConfig
from ts_asr_whisper_tpu.models.dicow import init_dicow
from ts_asr_whisper_tpu.training.trainer import Trainer

CFG = DiCoWConfig(vocab_size=1700, num_mel_bins=24, d_model=32,
                  encoder_layers=1, decoder_layers=1,
                  encoder_attention_heads=2, decoder_attention_heads=2,
                  encoder_ffn_dim=64, decoder_ffn_dim=64,
                  max_source_positions=48, max_target_positions=32,
                  decoder_start_token_id=31, eos_token_id=30,
                  pad_token_id=30, bos_token_id=30, dtype="float32")


def _batch(b=2):
    rng = np.random.default_rng(0)
    labels = np.concatenate(
        [rng.integers(0, 150, (b, 6)).astype(np.int32),
         np.full((b, 2), -100, np.int32)], axis=1)
    return {
        "input_features": rng.standard_normal((b, 24, 96)).astype(np.float32),
        "stno_mask": np.full((b, 4, 48), 0.25, np.float32),
        "labels": labels,
        "upp_labels": labels.copy(),
    }


def _cfg(tmp_path, **overrides):
    cfg = Cfg()
    t = cfg.training
    t.learning_rate = 1e-4
    t.warmup_steps = 0
    t.lr_scheduler_type = "constant"
    t.use_custom_optimizer = False
    t.use_fddt_only_n_steps = 0
    t.logging_steps = 100
    t.mesh_shape = [1]
    t.output_dir = str(tmp_path)
    for k, v in overrides.items():
        setattr(t, k, v)
    return cfg


def _run(cfg, steps_per_epoch, eval_vals, tmp_path):
    """Drive Trainer with scripted eval metrics; returns bookkeeping."""
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    evals, saves, bests = [], [], []

    def eval_fn(params, step):
        evals.append(step)
        return {"m": eval_vals[step]}

    def ckpt_fn(params, step):
        saves.append(step)

    def save_best(params, step):
        host = jax.tree.map(lambda x: np.asarray(x).copy(), params)
        bests.append((host, step))

    def load_best(template):
        return jax.tree.map(jnp.asarray, bests[-1][0])

    trainer = Trainer(cfg, CFG, params, num_prefix_tokens=2,
                      eval_fn=eval_fn, checkpoint_fn=ckpt_fn,
                      save_best_fn=save_best, load_best_fn=load_best,
                      steps_per_epoch=steps_per_epoch)
    state = trainer.train(_batch() for _ in range(50))
    return state, evals, saves, bests


def test_epoch_eval_save_and_best_model(tmp_path):
    cfg = _cfg(tmp_path, max_steps=6, eval_strategy="epoch",
               save_strategy="epoch", eval_delay=0,
               metric_for_best_model="m", greater_is_better=False,
               load_best_model_at_end=True)
    # 2 steps/epoch -> boundaries at 2, 4, 6; best (lowest) metric at step 2
    state, evals, saves, bests = _run(
        cfg, steps_per_epoch=2,
        eval_vals={2: 0.5, 4: 0.9, 6: 0.7}, tmp_path=tmp_path)
    assert evals == [2, 4, 6]
    assert saves == [2, 4, 6]
    assert [s for _, s in bests] == [2]
    # final params were reloaded from the best checkpoint
    best_leaves = jax.tree.leaves(bests[-1][0])
    final_leaves = jax.tree.leaves(state.params)
    for b, f in zip(best_leaves, final_leaves):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(f))


def test_eval_delay_counts_epochs(tmp_path):
    cfg = _cfg(tmp_path, max_steps=6, eval_strategy="epoch",
               save_strategy="no", eval_delay=2)
    _, evals, saves, _ = _run(cfg, steps_per_epoch=2,
                              eval_vals={4: 0.9, 6: 0.7},
                              tmp_path=tmp_path)
    # first eval only once 2 full epochs completed (HF eval_delay semantics)
    assert evals == [4, 6]
    assert saves == []


def test_best_model_improving_last(tmp_path):
    """Best at the LAST eval: no reload needed but best must track it."""
    cfg = _cfg(tmp_path, max_steps=4, eval_strategy="epoch",
               save_strategy="no", eval_delay=0,
               metric_for_best_model="m", greater_is_better=False,
               load_best_model_at_end=True)
    _, evals, _, bests = _run(cfg, steps_per_epoch=2,
                              eval_vals={2: 0.9, 4: 0.5},
                              tmp_path=tmp_path)
    assert evals == [2, 4]
    assert [s for _, s in bests] == [2, 4]


def test_preheat_epochs_gate_unfreeze(tmp_path):
    """use_fddt_only_n_epochs: the preheat phase persists until BOTH the
    step and epoch thresholds pass (reference trainers.py:122)."""
    cfg = _cfg(tmp_path, max_steps=6, eval_strategy="no", save_strategy="no",
               use_fddt=True, use_fddt_only_n_steps=1,
               use_fddt_only_n_epochs=2)
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    cfg.model.prefixes_to_preheat = ["encoder/conv1"]
    trainer = Trainer(cfg, CFG, params, num_prefix_tokens=2,
                      steps_per_epoch=2)
    phases = []

    orig = trainer._maybe_unfreeze

    def spy():
        orig()
        phases.append((trainer.state.step, trainer.state.phase))

    trainer._maybe_unfreeze = spy
    trainer.train(_batch() for _ in range(10))
    by_step = dict(phases)
    # steps 1-3 still preheat (epoch threshold 2 epochs = 4 steps)
    assert by_step[1] == "preheat" and by_step[3] == "preheat"
    assert by_step[4] == "base" and by_step[5] == "base"


def test_watch_grads_logs_module_norms(tmp_path):
    cfg = _cfg(tmp_path, max_steps=1, eval_strategy="no", save_strategy="no",
               watch_grads=True)
    params = init_dicow(jax.random.PRNGKey(0), CFG)
    trainer = Trainer(cfg, CFG, params, num_prefix_tokens=2)
    step_fn, _ = trainer._steps
    p2, _, parts = step_fn(trainer.state.params, trainer.state.opt_state,
                           _batch())
    keys = [k for k in parts if k.startswith("grad_norm/")]
    assert any("encoder" in k for k in keys)
    assert any("decoder" in k for k in keys)
    assert all(np.isfinite(float(parts[k])) for k in keys)
