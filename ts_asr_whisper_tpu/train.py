"""Fine-tune / decode orchestration — the reference's ModelTrainer
(/root/reference/src/train.py:23-268) rebuilt around the JAX trainer:

container init -> cutset loading (+ enrollment union) -> datasets/collator ->
optional weight re-init -> pjit trainer with long-form eval callbacks ->
final test evaluation. ``decode_only`` skips straight to evaluation.
"""

from __future__ import annotations

import os
from functools import reduce
from pathlib import Path
from typing import Dict

import numpy as np

from .config import Cfg
from .data.collators import DataCollator
from .data.datasets import TS_ASR_Dataset, build_datasets, load_cutsets
from .decoding.generation_config import GenerationConfig
from .decoding.longform import longform_generate
from .eval.metrics import compute_longform_metrics
from .models.containers import WhisperContainer
from .training.checkpoints import export_hf_checkpoint, save_checkpoint
from .training.dataloader import DataLoader, eval_batches
from .training.trainer import Trainer
from .txt_norm import get_text_norm
from .utils.logging_def import get_logger

logger = get_logger(__name__)


def make_generation_config(container: WhisperContainer, cfg: Cfg,
                           predict_timestamps: bool = True) -> GenerationConfig:
    """update_generation_config equivalent (reference general.py:19-37)."""
    tok = container.tokenizer
    mc = container.model_config
    kw = dict(
        max_length=cfg.training.generation_max_length,
        num_beams=cfg.training.generation_num_beams,
        decoder_start_token_id=mc.decoder_start_token_id,
        eos_token_id=mc.eos_token_id,
        pad_token_id=mc.pad_token_id,
        bos_token_id=mc.bos_token_id,
        no_timestamps_token_id=mc.no_timestamps_token_id,
        return_timestamps=predict_timestamps,
        ctc_weight=cfg.decoding.decoding_ctc_weight or 0.0,
        length_penalty=cfg.decoding.length_penalty or 1.0,
        repetition_penalty=cfg.decoding.repetition_penalty,
        cross_kv_quant=cfg.decoding.cross_kv_quant,
        ctc_p_bf16=cfg.decoding.ctc_p_bf16,
        ctc_psi_impl=cfg.decoding.ctc_psi_impl,
        joint_debug=cfg.decoding.joint_decode_debug,
        begin_suppress_tokens=(),
        max_initial_timestamp_index=None,
    )
    if cfg.decoding.condition_on_prev:
        # parity: the reference rejects this too (generation.py:543-544)
        raise NotImplementedError(
            "condition_on_prev is not supported (matches the reference)")
    gen_json = None
    model_dir = Path(cfg.model.whisper_model)
    if model_dir.exists() and (model_dir / "generation_config.json").exists():
        gen_json = model_dir / "generation_config.json"
    if gen_json:
        gc = GenerationConfig.from_json(str(gen_json), **kw)
        if not gc.lang_ids and hasattr(tok, "lang_to_id"):
            # language detection needs the lang-token ids even when the
            # exported json carries no lang_to_id map
            import dataclasses

            gc = dataclasses.replace(
                gc, lang_ids=tuple(sorted(tok.lang_to_id.values())))
        return gc
    if hasattr(tok, "lang_to_id"):
        kw["lang_ids"] = tuple(sorted(tok.lang_to_id.values()))
    return GenerationConfig(**kw)


class ModelTrainer:
    def __init__(self, cfg: Cfg):
        self.cfg = cfg
        self.container = WhisperContainer(cfg, seed=cfg.training.seed)

        # weight re-init (reference train.py:102-125)
        if cfg.model.reinit_encoder_from:
            self.container.reinit_encoder_from(cfg.model.reinit_encoder_from)
        elif cfg.model.reinit_from:
            self.container.reinit_from(cfg.model.reinit_from)

        self.train_text_norm = get_text_norm(cfg.data.train_text_norm)
        self.eval_text_norm = get_text_norm(cfg.data.eval_text_norm)

        data = cfg.data
        self.enrollment_cutset = None
        if data.use_enrollments and data.enrollment_cutsets:
            csets = load_cutsets(list(data.enrollment_cutsets), False)
            self.enrollment_cutset = reduce(lambda a, b: a + b, csets)

        num_mel = self.container.model_config.num_mel_bins
        self.train_dataset = None
        if data.train_cutsets and not cfg.training.decode_only:
            train_csets = load_cutsets(list(data.train_cutsets),
                                       data.use_enrollments)
            self.train_dataset = TS_ASR_Dataset(
                train_csets,
                text_norm=self.train_text_norm,
                use_timestamps=data.use_timestamps,
                dataset_weights=data.dataset_weights,
                num_mel_bins=num_mel,
                global_lang_id=data.global_lang_id,
                musan_augment_prob=cfg.aug.musan_augment_prob,
                musan_root=cfg.aug.musan_root,
                use_enrollments=data.use_enrollments,
                enrollment_cutset=self.enrollment_cutset,
                num_other_speakers=data.number_of_mixed_speakers,
                min_overlap_ratio=data.min_enrollment_mix_overlap,
                max_overlap_ratio=data.max_enrollment_mix_overlap,
            )

        self.dev_datasets = self._build_eval(data.dev_cutsets,
                                             data.dev_diar_cutsets)
        self.eval_datasets = self._build_eval(data.eval_cutsets,
                                              data.eval_diar_cutsets)

        self.collator = DataCollator(
            tokenizer=self.container.tokenizer,
            bos_token_id=self.container.model_config.bos_token_id,
            max_length=cfg.training.generation_max_length,
            stno_gaussian_noise_var=cfg.aug.stno_gaussian_noise_var,
            stno_gaussian_noise_prob=cfg.aug.stno_gaussian_noise_prob,
            stno_segment_augment_prob=cfg.aug.stno_segment_augment_prob,
            stno_segment_change_prob=cfg.aug.stno_segment_change_prob,
            stno_min_segment_length=cfg.aug.stno_min_segment_length,
            stno_max_segment_length=cfg.aug.stno_max_segment_length,
            spec_aug_prob=cfg.aug.spec_aug_prob if cfg.aug.do_augment
            or cfg.aug.spec_aug_prob else 0.0,
            use_enrollments=data.use_enrollments,
        )
        self.gen_cfg = make_generation_config(
            self.container, cfg, predict_timestamps=data.use_timestamps)

    def _build_eval(self, cutset_paths, diar_paths) -> Dict[str, object]:
        if not cutset_paths:
            return {}
        existing = [p for p in cutset_paths if Path(p).exists()
                    or Path(str(p).replace("_external_enrollment", "")).exists()]
        if not existing:
            logger.warning("No eval cutsets found among %s", cutset_paths)
            return {}
        return build_datasets(
            existing, self.cfg.data, self.eval_text_norm,
            self.container.model_config.num_mel_bins,
            diar_cutset_paths=diar_paths if self.cfg.data.use_diar else None,
            enrollment_cutset=self.enrollment_cutset)

    # -- evaluation ------------------------------------------------------------
    def evaluate_dataset(self, params, name: str, dataset,
                         output_dir: str,
                         metrics_list=None) -> Dict[str, float]:
        tok = self.container.tokenizer
        mc = self.container.model_config
        import jax

        if self.gen_cfg.joint_debug:
            from .decoding.ctc_rescorer import set_joint_debug_decoder

            set_joint_debug_decoder(
                lambda ids: tok.decode(ids, skip_special_tokens=False))
        n_proc = jax.process_count()
        mesh = getattr(self, "_eval_mesh", None)
        if mesh is None and len(jax.local_devices()) > 1:
            from .parallel.mesh import make_mesh

            # DP decode over every LOCAL chip; multi-host runs shard the
            # eval batches across processes instead of the mesh (the
            # reference's DDP eval sampler, evaluation.py:262-264), so
            # each process decodes independently on its own devices
            mesh = self._eval_mesh = make_mesh(
                devices=jax.local_devices())

        # case-invariant CTC rescoring: the reference ALWAYS folds the CTC
        # log-probs with the tokenizer's lower->upper map
        # (decoding.py:183-186 via tokenizer.upper_cased_tokens)
        upper_to_lower = None
        upper_map = getattr(tok, "upper_cased_tokens", None)
        if upper_map:
            upper_to_lower = np.stack([
                np.fromiter(upper_map.values(), dtype=np.int64,
                            count=len(upper_map)),   # upper ids
                np.fromiter(upper_map.keys(), dtype=np.int64,
                            count=len(upper_map)),   # lower ids
            ])
        preds = []  # (batch_index, sequences, label keys) per decoded batch
        bs = self.cfg.training.per_device_eval_batch_size
        for bi, batch in eval_batches(dataset, self.collator, bs,
                                      pad_to_full=True,
                                      batch_offset=jax.process_index()
                                      % n_proc,
                                      batch_stride=n_proc):
            forced = batch.get("forced_decoder_ids")
            # no language provided by the dataset -> STNO-aware language
            # detection on the first window (reference generation.py:151-221
            # via HF _retrieve_init_tokens when language is None)
            detect = forced is None and bool(self.gen_cfg.lang_ids)
            if forced is None:
                prefix = np.asarray(tok.prefix_tokens[:3], dtype=np.int64)
                forced = np.tile(prefix, (batch["input_features"].shape[0], 1))
            out = longform_generate(
                params, mc, self.gen_cfg,
                batch["input_features"], batch["stno_mask"],
                batch["attention_mask"], forced,
                enroll_features=batch.get("enroll_features"),
                enroll_stno=batch.get("enroll_stno"),
                upper_to_lower=upper_to_lower,
                detect_lang=detect,
                mesh=mesh)
            batch_keys = []
            for row in batch["labels"]:
                row = row[row != -100]
                batch_keys.append(tok.decode(row, skip_special_tokens=True))
            preds.append((bi, [np.asarray(s) for s in out.sequences],
                          batch_keys))
        if n_proc > 1:
            # reference evaluation.py:239-291: predictions gather across
            # ranks, rank 0 scores, result broadcast to every rank
            from .parallel.dist import (broadcast_from_main,
                                        gather_from_processes, is_zero_rank)

            all_parts = sorted(
                (part for rank in gather_from_processes(preds)
                 for part in rank),
                key=lambda p: p[0])
            res = None
            if is_zero_rank():
                res = compute_longform_metrics(
                    [s for _, ps, _ in all_parts for s in ps],
                    [k for _, _, ks in all_parts for k in ks],
                    dataset, tok, output_dir, self.eval_text_norm,
                    metrics_list=(metrics_list
                                  or self.cfg.training.eval_metrics_list),
                    save_visualizations=self.cfg.training.save_visualizations)
            return broadcast_from_main(res)
        preds.sort(key=lambda p: p[0])
        return compute_longform_metrics(
            [s for _, ps, _ in preds for s in ps],
            [k for _, _, ks in preds for k in ks],
            dataset, tok, output_dir, self.eval_text_norm,
            metrics_list=metrics_list or self.cfg.training.eval_metrics_list,
            save_visualizations=self.cfg.training.save_visualizations)

    def _store_run_artifacts(self):
        """training.store_src: persist the composed config and a source
        snapshot next to the run (the reference uploads both to wandb,
        general.py:113-135; here they land in output_dir so runs are
        reproducible without a wandb backend)."""
        import dataclasses
        import tarfile

        out = Path(self.cfg.training.output_dir)
        try:
            import yaml

            with open(out / "config.yaml", "w") as f:
                yaml.safe_dump(dataclasses.asdict(self.cfg), f,
                               default_flow_style=False)
        except Exception:  # config still recoverable from the src snapshot
            logger.exception("store_src: could not serialize config")
        pkg_root = Path(__file__).resolve().parent
        with tarfile.open(out / "src.tar.gz", "w:gz") as tar:
            for py in sorted(pkg_root.rglob("*.py")):
                tar.add(py, arcname=str(py.relative_to(pkg_root.parent)))
        logger.info("store_src: wrote config.yaml + src.tar.gz to %s", out)

    def do_eval(self, params, datasets: Dict[str, object], step: int,
                split: str) -> Dict[str, float]:
        # reference train.py:150-193: in-training dev evals score
        # train_metrics_list; the final test eval scores eval_metrics_list
        metrics_list = (self.cfg.training.train_metrics_list
                        if split == "dev"
                        else self.cfg.training.eval_metrics_list)
        # bf16 eval (reference trainers.py autocast equivalent): bf16 weights
        # halve decode weight streaming
        if (self.cfg.training.bf16_full_eval
                and self.container.model_config.dtype == "bfloat16"):
            import jax.numpy as jnp

            from .models.convert import cast_params

            params = cast_params(params, jnp.bfloat16)
        metrics: Dict[str, float] = {}
        out_root = Path(self.cfg.training.output_dir)
        for name, ds in datasets.items():
            out_dir = out_root / f"{split}_{name}" / f"step_{step}"
            res = self.evaluate_dataset(params, name, ds, str(out_dir),
                                        metrics_list=metrics_list)
            metrics.update({f"eval_{name}_{k}": v for k, v in res.items()})
            logger.info("eval %s@%d: %s", name, step,
                        {k: round(v, 4) for k, v in res.items()})
        # combined cross-split stats (reference trainers.py:209-227)
        if self.cfg.training.compute_combined_metrics or len(datasets) > 1:
            for m in metrics_list:
                prefix = m.split("_", 1)[0]
                errors = sum(v for k, v in metrics.items()
                             if k.endswith(f"_{prefix}_errors"))
                length = sum(v for k, v in metrics.items()
                             if k.endswith(f"_{prefix}_length"))
                if length:
                    metrics[f"eval_combined_{prefix}_wer"] = errors / length
        return metrics

    # -- training ---------------------------------------------------------------
    def _fit(self, t, num_prefix, start_step, eval_fn, checkpoint_fn,
             save_best_fn, load_best_fn):
        """Build Trainer + DataLoader and run; with ``auto_find_batch_size``
        the per-device batch halves on OOM (gradient accumulation doubles to
        keep the global batch, reference trainers.py:141-168)."""
        import jax

        bs = t.per_device_train_batch_size

        def params_alive(params):
            leaves = jax.tree.leaves(params)
            return not leaves or not getattr(
                leaves[0], "is_deleted", lambda: False)()

        from .parallel.mesh import make_mesh

        mesh = make_mesh(t.mesh_shape, t.mesh_axis_names)
        resume_path = t.resume_from_checkpoint or t.restart_from or None
        while True:
            if not params_alive(self.container.params):
                # the failed attempt's donated buffers are gone; reload —
                # and RE-RESTORE checkpointed weights, else an OOM retry on
                # a resumed run would silently continue from the pretrained
                # init at the resumed step
                logger.info("Rebuilding model params after OOM retry")
                self.container = WhisperContainer(self.cfg,
                                                  seed=t.seed)
                if self.cfg.model.reinit_encoder_from:
                    self.container.reinit_encoder_from(
                        self.cfg.model.reinit_encoder_from)
                elif self.cfg.model.reinit_from:
                    self.container.reinit_from(self.cfg.model.reinit_from)
                if resume_path:
                    from .training.checkpoints import restore_checkpoint

                    state, _ = restore_checkpoint(
                        str(resume_path), {"params": self.container.params})
                    self.container.params = state["params"]
                    logger.info("Re-restored resume checkpoint %s after "
                                "OOM retry", resume_path)
            global_bs = bs * max(1, mesh.size)
            if t.max_steps <= 0:
                # HF convention: train by epochs; derive the step budget so
                # the lr schedule and the loop agree
                spe = len(self.train_dataset) // global_bs or 1
                t.max_steps = spe * t.num_train_epochs
                logger.info("max_steps<=0: training %d epochs = %d steps",
                            t.num_train_epochs, t.max_steps)
            trainer = Trainer(self.cfg, self.container.model_config,
                              self.container.params,
                              num_prefix_tokens=num_prefix,
                              eval_fn=eval_fn if self.dev_datasets else None,
                              checkpoint_fn=checkpoint_fn,
                              save_best_fn=save_best_fn,
                              load_best_fn=load_best_fn,
                              mesh=mesh,
                              start_step=start_step,
                              steps_per_epoch=(
                                  len(self.train_dataset) // global_bs
                                  or None))
            loader = DataLoader(
                self.train_dataset, self.collator,
                batch_size=global_bs,
                seed=t.seed,
                num_workers=t.dataloader_num_workers,
                prefetch_factor=t.dataloader_prefetch_factor,
                worker_type=t.dataloader_worker_type,
                num_epochs=(None if t.max_steps and t.max_steps > 0
                            else t.num_train_epochs),
                # multi-host SPMD: each process feeds its local rows of
                # every global batch (see parallel/dist.py module doc)
                process_index=jax.process_index(),
                process_count=jax.process_count())
            try:
                return trainer.train(iter(loader))
            except Exception as e:
                oom = "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in \
                    str(e).lower()
                if not (t.auto_find_batch_size and oom and bs > 1):
                    raise
                bs //= 2
                t.per_device_train_batch_size = bs
                t.gradient_accumulation_steps *= 2
                logger.warning(
                    "OOM at per-device batch %d -> retrying with %d "
                    "(grad accumulation x2)", bs * 2, bs)

    def train(self):
        t = self.cfg.training
        os.makedirs(t.output_dir, exist_ok=True)
        if t.store_src:
            self._store_run_artifacts()

        if t.decode_only:
            if not self.eval_datasets:
                raise ValueError(
                    "decode_only=true but no eval cutsets could be loaded "
                    f"from {self.cfg.data.eval_cutsets} — refusing to "
                    "produce an empty decode run")
            metrics = self.do_eval(self.container.params, self.eval_datasets,
                                   0, "test")
            return metrics

        num_prefix = len(self.container.tokenizer.prefix_tokens) - 1

        # resume / restart (reference train.py:259, training_args.py:19-21):
        # params restored from an Orbax checkpoint; optimizer state restarts
        # fresh at the restored step
        start_step = 0
        resume_path = t.resume_from_checkpoint or t.restart_from or None
        if resume_path:
            from .training.checkpoints import restore_checkpoint

            state, start_step = restore_checkpoint(
                str(resume_path), {"params": self.container.params})
            self.container.params = state["params"]
            logger.info("Resumed params from %s at step %d", resume_path,
                        start_step)

        def eval_fn(params, step):
            return self.do_eval(params, self.dev_datasets, step, "dev")

        if not t.predict_with_generate:
            # reference train.py:159-167: compute_metrics is only attached
            # when predict_with_generate is set; without it dev evals
            # (and their early-stopping signal) are skipped
            eval_fn = None

        def checkpoint_fn(params, step):
            save_checkpoint(os.path.join(t.output_dir, "ckpt"), params,
                            step=step, keep=t.save_total_limit)

        best_dir = os.path.join(t.output_dir, "ckpt_best")

        def save_best_fn(params, step):
            # best-dev-metric checkpoint for load_best_model_at_end
            # (reference configs/base.yaml:91)
            save_checkpoint(best_dir, params, step=step, keep=1)

        def load_best_fn(template_params):
            from .training.checkpoints import restore_checkpoint

            state, _ = restore_checkpoint(best_dir,
                                          {"params": template_params})
            return state["params"]

        state = self._fit(t, num_prefix, start_step, eval_fn, checkpoint_fn,
                          save_best_fn, load_best_fn)

        final_params = state.params
        if "lora" in final_params:
            from .training.lora import merge_lora

            base = {k: v for k, v in final_params.items() if k != "lora"}
            final_params = merge_lora(base, final_params["lora"])

        gen_json = {
            "max_length": self.gen_cfg.max_length,
            "decoder_start_token_id": self.gen_cfg.decoder_start_token_id,
            "eos_token_id": self.gen_cfg.eos_token_id,
            "pad_token_id": self.gen_cfg.pad_token_id,
            "bos_token_id": self.gen_cfg.bos_token_id,
            "no_timestamps_token_id": self.gen_cfg.no_timestamps_token_id,
            "return_timestamps": self.gen_cfg.return_timestamps,
            "ctc_weight": self.gen_cfg.ctc_weight,
            "suppress_tokens": list(self.gen_cfg.suppress_tokens),
            "begin_suppress_tokens": None,
        }
        export_hf_checkpoint(final_params, self.container.model_config,
                             os.path.join(t.output_dir, "hf_export"),
                             generation_config=gen_json)
        # reference train.py:245: the final generate-eval is gated on
        # predict_with_generate (the in-training dev evals likewise)
        if self.eval_datasets and t.predict_with_generate:
            return self.do_eval(final_params, self.eval_datasets,
                                state.step, "test")
        return {}


def main(cfg: Cfg):
    return ModelTrainer(cfg).train()
