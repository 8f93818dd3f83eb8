"""CTC encoder pre-training on LibriSpeech-style cutsets.

Port of /root/reference/src/pretrain_encoder.py:20-102: freeze everything
except the CTC-head modules (additional layer / self-attn layer / lm_head /
subsample convs), train the encoder with CTC on prefix-stripped labels, and
evaluate with greedy CTC decode + WER.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np
import optax

from .config import Cfg
from .data.collators import DataCollatorForPretraining
from .data.datasets import TS_ASR_Dataset, load_cutsets
from .eval.metrics import compute_shortform_metrics
from .models.containers import WhisperContainer
from .models.dicow import dicow_encoder_forward, encoder_ctc_logits
from .models.losses import prepare_ctc_labels
from .ops.ctc import ctc_greedy_decode, ctc_loss_from_padded_labels
from .training.checkpoints import export_hf_checkpoint, save_checkpoint
from .training.dataloader import DataLoader, eval_batches
from .training.optim import build_optimizer
from .txt_norm import get_text_norm
from .utils.logging_def import get_logger

logger = get_logger(__name__)

# modules that stay trainable (reference pretrain_encoder.py:42-51)
PRETRAIN_TRAINABLE = (
    "encoder/additional_layer",
    "encoder/additional_self_attention_layer",
    "encoder/lm_head",
    "encoder/subsample_conv1",
    "encoder/subsample_conv2",
)


def make_pretrain_step(model_cfg, tx, num_prefix_tokens: int):
    def loss_fn(params, batch):
        hidden = dicow_encoder_forward(params["encoder"], model_cfg,
                                       batch["input_features"], None)
        logits = encoder_ctc_logits(params["encoder"], model_cfg, hidden)
        labels = prepare_ctc_labels(batch["labels"], model_cfg,
                                    num_prefix_tokens)
        loss = ctc_loss_from_padded_labels(
            logits, labels, blank_id=model_cfg.ctc_vocab_size - 1)
        return loss, {"loss": loss}

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, parts

    return step


def main(cfg: Cfg) -> Dict[str, float]:
    cfg.model.use_fddt = False
    cfg.training.use_fddt = False
    # pretrain uses the plain optimizer (no fddt lr multiplier,
    # reference pretrain_encoder.py uses the stock HF optimizer)
    cfg.training.use_custom_optimizer = False
    container = WhisperContainer(cfg, seed=cfg.training.seed)
    mc = container.model_config
    tok = container.tokenizer
    text_norm = get_text_norm(cfg.data.train_text_norm)

    train_csets = load_cutsets(list(cfg.data.train_cutsets), False)
    train_ds = TS_ASR_Dataset(train_csets, text_norm=text_norm,
                              use_timestamps=False, num_mel_bins=mc.num_mel_bins,
                              global_lang_id=cfg.data.global_lang_id,
                              dataset_weights=cfg.data.dataset_weights)
    collator = DataCollatorForPretraining(
        tokenizer=tok, bos_token_id=mc.bos_token_id,
        max_length=cfg.training.generation_max_length)

    num_prefix = len(tok.prefix_tokens) - 1

    def label_fn_freeze(params):
        # everything frozen except CTC head modules, via 'preheat' labels
        return build_optimizer(
            params, cfg.training,
            prefixes_to_preheat=list(PRETRAIN_TRAINABLE),
            frozen_keywords=[], preheat_only=True)

    tx, opt_state = label_fn_freeze(container.params)
    step_fn = make_pretrain_step(mc, tx, num_prefix)

    params = container.params
    t = cfg.training
    loader = DataLoader(train_ds, collator,
                        batch_size=t.per_device_train_batch_size,
                        seed=t.seed, num_workers=t.dataloader_num_workers)
    step = 0
    for batch in loader:
        if step >= t.max_steps:
            break
        params, opt_state, parts = step_fn(params, opt_state, batch)
        step += 1
        if step % t.logging_steps == 0:
            logger.info("pretrain step %d loss %.4f", step,
                        float(parts["loss"]))
        if t.save_strategy == "steps" and step % t.save_steps == 0:
            save_checkpoint(os.path.join(t.output_dir, "ckpt"), params,
                            step=step, keep=t.save_total_limit)

    os.makedirs(t.output_dir, exist_ok=True)
    export_hf_checkpoint(params, mc, os.path.join(t.output_dir, "hf_export"))

    # eval: greedy CTC decode + WER on dev cutsets (pretrain_encoder.py:52-102)
    metrics: Dict[str, float] = {}
    if cfg.data.dev_cutsets:
        from pathlib import Path

        from .utils.observability import MetricsLogger

        mlogger = MetricsLogger(
            t.output_dir, run_name=t.run_name,
            use_wandb=bool(t.report_to) and "wandb" in str(t.report_to),
            project=cfg.wandb.project)

        for path in cfg.data.dev_cutsets:
            if not Path(path).exists():
                continue
            dev_csets = load_cutsets([path], False)
            dev_ds = TS_ASR_Dataset(dev_csets, text_norm=text_norm,
                                    use_timestamps=False,
                                    num_mel_bins=mc.num_mel_bins,
                                    global_lang_id=cfg.data.global_lang_id)
            preds, labels = [], []
            window = 2 * mc.max_source_positions
            for _, batch in eval_batches(dev_ds, collator,
                                         t.per_device_eval_batch_size):
                feats = batch["input_features"]
                b, n_mels, t_mel = feats.shape
                # inputs longer than 30 s are chunked into 30 s pieces and
                # their CTC logits concatenated (reference trainers.py:52-63)
                k = max(1, -(-t_mel // window))
                if t_mel < k * window:
                    feats = np.pad(feats,
                                   ((0, 0), (0, 0), (0, k * window - t_mel)))
                chunked = feats.reshape(b, n_mels, k, window) \
                    .transpose(0, 2, 1, 3).reshape(b * k, n_mels, window)
                hidden = dicow_encoder_forward(
                    params["encoder"], mc, chunked, None)
                logits = encoder_ctc_logits(params["encoder"], mc, hidden)
                t_out = logits.shape[1]
                logits = logits.reshape(b, k * t_out, logits.shape[-1])
                decoded = np.asarray(ctc_greedy_decode(
                    logits, mc.ctc_vocab_size - 1))
                preds.extend(list(decoded))
                labels.extend(list(batch["labels"]))
            name = os.path.basename(path).removesuffix(".jsonl.gz")
            res, pred_str, label_str = compute_shortform_metrics(
                preds, labels, tok, text_norm, return_texts=True)
            metrics.update({f"eval_{name}_{k}": v for k, v in res.items()})
            logger.info("pretrain eval %s: %s", name, res)
            # prediction table (reference write_wandb_pred,
            # evaluation.py:37-51): JSONL artifact + wandb table
            mlogger.log_predictions(pred_str, label_str, step, tag=name)
        mlogger.close()
    return metrics
