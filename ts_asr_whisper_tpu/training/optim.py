"""Optimizer construction: 2-group AdamW + FDDT-preheat freeze schedule.

Mirrors the reference's custom optimizer (containers.py:100-114: parameters
under ``prefixes_to_preheat`` train at lr * fddt_lr_multiplier) and the
two-phase freeze schedule (trainers.py:116-139: first ``use_fddt_only_n_steps``
steps only the preheat params train; then everything unfreezes except
``params_to_keep_frozen_keywords``, with a fresh optimizer state).

Param labels are path strings like ``encoder/fddts/target/weight`` so the
reference's module-path prefixes translate directly.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import jax
import optax

from ..config import TrainingConfig


def param_path_tree(params):
    """Pytree of 'a/b/c' path strings with the same structure as params."""
    paths_leaves = jax.tree_util.tree_leaves_with_path(params)
    paths = [
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for path, _ in paths_leaves
    ]
    treedef = jax.tree.structure(params)
    return jax.tree.unflatten(treedef, paths)


def _normalize_prefix(prefix: str) -> str:
    # accept both our 'encoder/fddts' and the reference's
    # 'model.encoder.fddts' notations
    return prefix.removeprefix("model.").replace(".", "/")


def path_matches(path: str, prefixes: Iterable[str]) -> bool:
    return any(path.startswith(_normalize_prefix(p)) for p in prefixes)


def path_contains(path: str, keywords: Iterable[str]) -> bool:
    return any(k in path for k in keywords)


def make_lr_schedule(cfg: TrainingConfig, base_lr: Optional[float] = None):
    lr = base_lr if base_lr is not None else cfg.learning_rate
    warmup = optax.linear_schedule(0.0, lr, max(cfg.warmup_steps, 1))
    steps_after = max(cfg.max_steps - cfg.warmup_steps, 1)
    if cfg.lr_scheduler_type == "cosine":
        decay = optax.cosine_decay_schedule(lr, steps_after)
    elif cfg.lr_scheduler_type == "constant":
        decay = optax.constant_schedule(lr)
    else:  # linear (HF default)
        decay = optax.linear_schedule(lr, 0.0, steps_after)
    return optax.join_schedules([warmup, decay], [cfg.warmup_steps])


def build_optimizer(
    params,
    cfg: TrainingConfig,
    prefixes_to_preheat: Sequence[str] = (),
    frozen_keywords: Sequence[str] = (),
    preheat_only: bool = False,
) -> Tuple[optax.GradientTransformation, object]:
    """Returns (tx, opt_state). Three labels:
    'preheat' -> lr * fddt_lr_multiplier, 'base' -> lr, 'frozen' -> zero.
    With ``preheat_only`` everything but the preheat group is frozen
    (phase 1 of the schedule)."""
    paths = param_path_tree(params)

    def label(path: str) -> str:
        if path.startswith("lora/"):
            # LoRA adapters always train (the dense weights they wrap are
            # frozen separately via frozen_keywords)
            return "frozen" if preheat_only else "base"
        if path_matches(path, prefixes_to_preheat):
            return "preheat"
        if preheat_only:
            return "frozen"
        if path_contains(path, frozen_keywords):
            return "frozen"
        return "base"

    labels = jax.tree.map(label, paths)

    def adamw(lr_mult: float):
        sched = make_lr_schedule(cfg, cfg.learning_rate * lr_mult)
        mu_dtype = getattr(cfg, "adam_mu_dtype", None)
        return optax.adamw(sched, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                           eps=cfg.adam_epsilon, weight_decay=cfg.weight_decay,
                           mu_dtype=mu_dtype)

    mult = cfg.fddt_lr_multiplier if cfg.use_custom_optimizer else 1.0
    # ONE global-norm clip over all groups BEFORE the per-group transforms —
    # HF Trainer clips a single norm over every trainable parameter; frozen
    # params' grads are exact zeros (stop_gradient in the loss) so they do
    # not perturb the norm
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(
            {"preheat": adamw(mult), "base": adamw(1.0),
             "frozen": optax.set_to_zero()},
            labels))
    return tx, tx.init(params)


def trainable_mask(params, prefixes_to_preheat, frozen_keywords,
                   preheat_only: bool):
    """Boolean pytree: which params receive gradients in this phase."""
    paths = param_path_tree(params)

    def is_trainable(path: str) -> bool:
        if path.startswith("lora/"):
            return not preheat_only
        if preheat_only:
            return path_matches(path, prefixes_to_preheat)
        return not path_contains(path, frozen_keywords)

    return jax.tree.map(is_trainable, paths)
