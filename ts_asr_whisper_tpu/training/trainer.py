"""Trainer: pjit train step over a data-parallel mesh + the reference's
training behaviors (two-phase FDDT preheat, 2-group optimizer, eval-driven
early stopping, checkpointing).

Replaces the HF Trainer orchestration (/root/reference/src/utils/trainers.py)
with an explicit jitted step: params live on the mesh (replicated or
ZeRO-sharded), batches are host-sharded over the ``data`` axis, and XLA
inserts the gradient reductions. The unfreeze boundary
(trainers.py:116-139) swaps in a freshly initialized optimizer — matching
the reference's optimizer rebuild — at the cost of one recompile.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Cfg
from ..models.config import DiCoWConfig
from ..models.dicow import dicow_forward, encoder_ctc_logits
from ..models.losses import dicow_loss
from ..parallel.mesh import make_mesh, param_shardings, shard_batch
from ..utils.logging_def import get_logger
from .optim import build_optimizer

logger = get_logger(__name__)


def shift_tokens_right(labels: jax.Array, pad_token_id: int,
                       decoder_start_token_id: int) -> jax.Array:
    """HF shift_tokens_right semantics (labels -100 -> pad)."""
    shifted = jnp.roll(labels, 1, axis=-1)
    shifted = shifted.at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == -100, pad_token_id, shifted)


def make_train_step(model_cfg: DiCoWConfig, tx: optax.GradientTransformation,
                    num_prefix_tokens: int, remat: bool = False,
                    trainable_mask=None, watch_grads: bool = False):
    """Build the jitted train step. Batch keys: input_features, stno_mask,
    labels, upp_labels [, enroll_features, enroll_stno].

    ``trainable_mask`` (bool pytree) stops gradients through frozen params
    INSIDE the loss: XLA then skips their backward compute and never
    materializes their gradient buffers (the optimizer's set_to_zero alone
    still pays both).

    ``watch_grads`` adds per-top-level-module gradient norms to the step
    metrics (the reference's wandb.watch gradient telemetry,
    train.py:171-172 + trainers.py GradLogger)."""

    def loss_fn(params, batch):
        if trainable_mask is not None:
            params = jax.tree.map(
                lambda p, t: p if t else jax.lax.stop_gradient(p),
                params, trainable_mask)
        if "lora" in params:
            from .lora import merge_lora

            base = {k: v for k, v in params.items() if k != "lora"}
            params = merge_lora(base, params["lora"])
        dec_in = shift_tokens_right(batch["labels"], model_cfg.pad_token_id,
                                    model_cfg.decoder_start_token_id)
        logits, enc_hidden = dicow_forward(
            params, model_cfg, batch["input_features"], batch["stno_mask"],
            dec_in, batch.get("enroll_features"), batch.get("enroll_stno"),
            remat=remat)
        enc_logits = None
        if model_cfg.ctc_weight > 0.0:
            enc_logits = encoder_ctc_logits(params["encoder"], model_cfg,
                                            enc_hidden)
        total, parts = dicow_loss(logits, enc_logits, batch["labels"],
                                  batch.get("upp_labels"), model_cfg,
                                  num_prefix_tokens=num_prefix_tokens)
        return total, parts

    # donate params + opt_state: XLA updates them in place instead of
    # double-buffering ~2x(params+moments) HBM (the difference between
    # fitting batch 8 and OOM for turbo on one v5e chip)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        parts = dict(parts, grad_norm=gnorm)
        if watch_grads:
            for top_key, sub in grads.items():
                if isinstance(sub, dict):
                    for mod_key, leaves in sub.items():
                        parts[f"grad_norm/{top_key}/{mod_key}"] = \
                            optax.global_norm(leaves)
                else:
                    parts[f"grad_norm/{top_key}"] = optax.global_norm(sub)
        return params, opt_state, parts

    @jax.jit
    def eval_loss_step(params, batch):
        _, parts = loss_fn(params, batch)
        return parts

    return train_step, eval_loss_step


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0
    phase: str = "base"  # "preheat" | "base"


class Trainer:
    """Minimal-but-complete training driver. Data pipeline supplies an
    iterator of host batches; evaluation is a callback (wired to the
    long-form decode + WER stack by train.py)."""

    def __init__(
        self,
        cfg: Cfg,
        model_cfg: DiCoWConfig,
        params,
        num_prefix_tokens: int = 0,
        eval_fn: Optional[Callable[[Any, int], Dict[str, float]]] = None,
        checkpoint_fn: Optional[Callable[[Any, int], None]] = None,
        mesh=None,
        start_step: int = 0,
        steps_per_epoch: Optional[int] = None,
        save_best_fn: Optional[Callable[[Any, int], None]] = None,
        load_best_fn: Optional[Callable[[Any], Any]] = None,
    ):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.mesh = mesh or make_mesh(cfg.training.mesh_shape,
                                      cfg.training.mesh_axis_names)
        self.eval_fn = eval_fn
        self.checkpoint_fn = checkpoint_fn
        self.num_prefix_tokens = num_prefix_tokens
        # epoch-strategy support (reference configs/base.yaml:80-81 default
        # eval/save at every epoch boundary; eval_delay counts epochs there)
        self.steps_per_epoch = steps_per_epoch
        self.save_best_fn = save_best_fn
        self.load_best_fn = load_best_fn
        self._best_saved = False

        t = cfg.training
        if t.use_lora and "lora" not in params:
            from .lora import init_lora

            lora = init_lora(jax.random.PRNGKey(t.seed + 1), params)
            params = dict(params, lora=lora)
        from ..utils.observability import MetricsLogger

        self.metrics_logger = MetricsLogger(
            t.output_dir, run_name=t.run_name,
            use_wandb=bool(t.report_to) and "wandb" in str(t.report_to),
            project=cfg.wandb.project)
        self._preheat_steps = t.use_fddt_only_n_steps if t.use_fddt else 0
        self._preheat_epochs = t.use_fddt_only_n_epochs if t.use_fddt else 0
        phase = ("preheat" if (self._preheat_steps > 0
                               or self._preheat_epochs > 0) else "base")

        start_epochs = (start_step // steps_per_epoch
                        if steps_per_epoch else self._preheat_epochs)
        if (start_step >= self._preheat_steps
                and start_epochs >= self._preheat_epochs):
            phase = "base"
        tp_axis = "model" if "model" in self.mesh.axis_names else None
        shardings = param_shardings(params, self.mesh, t.shard_params,
                                    tp_axis=tp_axis)
        params = jax.tree.map(jax.device_put, params, shardings)
        tx, opt_state = self._build_tx(params, preheat_only=(phase == "preheat"))
        self.tx = tx
        self.state = TrainState(params, opt_state, start_step, phase)
        self._steps = self._make_steps(tx)

        self._best_metric = None
        self._bad_evals = 0

    # -- construction helpers ------------------------------------------------
    def _build_tx(self, params, preheat_only: bool):
        t = self.cfg.training
        tx, opt_state = build_optimizer(
            params, t,
            prefixes_to_preheat=self.cfg.model.prefixes_to_preheat,
            frozen_keywords=self.cfg.model.params_to_keep_frozen_keywords,
            preheat_only=preheat_only)
        if t.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, t.gradient_accumulation_steps)
            opt_state = tx.init(params)
        return tx, opt_state

    def _make_steps(self, tx):
        from .optim import trainable_mask

        mask = trainable_mask(
            self.state.params,
            self.cfg.model.prefixes_to_preheat,
            self.cfg.model.params_to_keep_frozen_keywords,
            preheat_only=(self.state.phase == "preheat"))
        if self.cfg.training.gradient_checkpointing:
            from ..models.whisper import set_remat_policy

            set_remat_policy(self.cfg.training.remat_policy)
        return make_train_step(self.model_cfg, tx, self.num_prefix_tokens,
                               remat=self.cfg.training.gradient_checkpointing,
                               trainable_mask=mask,
                               watch_grads=self.cfg.training.watch_grads)

    # -- phases --------------------------------------------------------------
    def _maybe_unfreeze(self):
        # reference trainers.py:122: the preheat phase ends only once BOTH
        # the step threshold (use_fddt_only_n_steps) and the epoch threshold
        # (use_fddt_only_n_epochs) have passed. Without a known epoch length
        # the epoch threshold is vacuous (cannot deadlock the unfreeze).
        epochs_done = (self.state.step // self.steps_per_epoch
                       if self.steps_per_epoch else self._preheat_epochs)
        if (self.state.phase == "preheat"
                and epochs_done >= self._preheat_epochs
                and self.state.step >= self._preheat_steps):
            logger.info("Unfreezing at step %d (fresh optimizer state, "
                        "reference trainers.py:116-139)", self.state.step)
            tx, opt_state = self._build_tx(self.state.params, preheat_only=False)
            self.tx = tx
            self.state.opt_state = opt_state
            self.state.phase = "base"
            self._steps = self._make_steps(tx)

    # -- main loop -----------------------------------------------------------
    def train(self, train_iter: Iterable[Dict[str, np.ndarray]]):
        t = self.cfg.training
        train_step, _ = self._steps
        last_log = time.time()
        profiling = False
        if t.profile_dir:
            jax.profiler.start_trace(t.profile_dir)
            profiling = True
        for batch in train_iter:
            # max_steps <= 0 = HF's "train by num_train_epochs" convention:
            # termination is then the loader exhausting its epochs
            if t.max_steps > 0 and self.state.step >= t.max_steps:
                break
            self._maybe_unfreeze()
            train_step, _ = self._steps
            device_batch = shard_batch(batch, self.mesh)
            self.state.params, self.state.opt_state, parts = train_step(
                self.state.params, self.state.opt_state, device_batch)
            self.state.step += 1

            if self.state.step % t.logging_steps == 0:
                parts = {k: float(v) for k, v in parts.items()}
                dt = time.time() - last_log
                last_log = time.time()
                logger.info("step %d %s (%.2f s/%d steps)", self.state.step,
                            {k: round(v, 4) for k, v in parts.items()},
                            dt, t.logging_steps)
                self.metrics_logger.log(parts, self.state.step)

            # epoch boundary (the loader yields drop_last batches, so
            # steps_per_epoch = len(dataset) // batch_size)
            spe = self.steps_per_epoch
            at_epoch_end = bool(spe) and self.state.step % spe == 0
            epochs_done = self.state.step // spe if spe else 0

            # eval_delay counts units of the active strategy (HF semantics)
            if self.eval_fn is not None and (
                    (t.eval_strategy == "steps"
                     and self.state.step % t.eval_steps == 0
                     and self.state.step >= t.eval_delay)
                    or (t.eval_strategy == "epoch" and at_epoch_end
                        and epochs_done >= t.eval_delay)):
                if self._run_eval():
                    break
            if self.checkpoint_fn is not None and (
                    (t.save_strategy == "steps"
                     and self.state.step % t.save_steps == 0)
                    or (t.save_strategy == "epoch" and at_epoch_end)):
                self.checkpoint_fn(self.state.params, self.state.step)
            if profiling and self.state.step >= 12:
                jax.profiler.stop_trace()  # profile the first dozen steps
                profiling = False
        if profiling:
            jax.profiler.stop_trace()
        # reference configs/base.yaml:91 load_best_model_at_end: the final
        # test eval must use the best-dev-metric params, not the last step's
        if (t.load_best_model_at_end and self._best_saved
                and self.load_best_fn is not None):
            logger.info("Reloading best checkpoint (metric %s = %s)",
                        t.metric_for_best_model, self._best_metric)
            self.state.params = self.load_best_fn(self.state.params)
        return self.state

    def _run_eval(self) -> bool:
        """Returns True if early stopping triggered."""
        t = self.cfg.training
        metrics = self.eval_fn(self.state.params, self.state.step)
        logger.info("eval @ %d: %s", self.state.step, metrics)
        self.metrics_logger.log(metrics, self.state.step)
        key = t.metric_for_best_model
        if key and key in metrics:
            value = metrics[key]
            better = (self._best_metric is None
                      or (value > self._best_metric) == t.greater_is_better)
            if better and value != self._best_metric:
                self._best_metric = value
                self._bad_evals = 0
                if self.save_best_fn is not None:
                    self.save_best_fn(self.state.params, self.state.step)
                    self._best_saved = True
            else:
                self._bad_evals += 1
                if (t.early_stopping_patience > 0
                        and self._bad_evals >= t.early_stopping_patience):
                    logger.info("Early stopping at step %d", self.state.step)
                    return True
        return False
