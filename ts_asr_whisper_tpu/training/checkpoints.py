"""Checkpointing: Orbax for native train state + HF-safetensors bridge.

The reference delegates to HF Trainer (safetensors snapshots,
configs/base.yaml:81-92) and ships hub-export tooling
(utils/export_dicow.py). Here: Orbax checkpoints carry params + optimizer
state + step for exact resume; export/import to HF safetensors keeps
checkpoint interoperability with the torch ecosystem (BASELINE.md).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import numpy as np

from ..models.config import DiCoWConfig
from ..models.convert import params_to_hf, save_safetensors
from ..utils.logging_def import get_logger

logger = get_logger(__name__)


def save_checkpoint(directory: str, params: Any, opt_state: Any = None,
                    step: int = 0, keep: int = 1) -> str:
    """Orbax checkpoint under directory/step_<n>; prunes old ones."""
    import orbax.checkpoint as ocp

    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    (directory / "latest").write_text(str(step))
    # prune
    ckpts = sorted(directory.glob("step_*"),
                   key=lambda p: int(p.name.split("_")[1]))
    for old in ckpts[:-keep]:
        import shutil

        shutil.rmtree(old, ignore_errors=True)
    return str(path)


def restore_checkpoint(directory: str, template: Any,
                       step: Optional[int] = None) -> tuple:
    import orbax.checkpoint as ocp

    directory = Path(directory).resolve()
    if step is None:
        step = int((directory / "latest").read_text())
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(directory / f"step_{step}", template)
    return state, step


def export_hf_checkpoint(params: Any, cfg: DiCoWConfig, out_dir: str,
                         generation_config: Optional[dict] = None) -> None:
    """Write model.safetensors + config.json in the DiCoW HF layout
    (utils/export_dicow.py equivalent, minus the hub push)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    sd = params_to_hf(params, cfg)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    save_safetensors(sd, str(out / "model.safetensors"))
    config = {
        "model_type": "DiCoW",
        "architectures": ["DiCoWForConditionalGeneration"],
        **{k: getattr(cfg, k) for k in (
            "vocab_size", "num_mel_bins", "d_model", "encoder_layers",
            "decoder_layers", "encoder_attention_heads",
            "decoder_attention_heads", "encoder_ffn_dim", "decoder_ffn_dim",
            "max_source_positions", "max_target_positions",
            "decoder_start_token_id", "eos_token_id", "pad_token_id",
            "bos_token_id", "ctc_weight", "additional_layer",
            "additional_self_attention_layer", "pre_ctc_sub_sample",
            "use_fddt", "fddt_is_diagonal", "fddt_bias_only",
            "fddt_use_silence", "fddt_use_target", "fddt_use_overlap",
            "fddt_use_non_target", "remove_timestamps_from_ctc",
            "apply_fddt_to_n_layers", "fddt_init", "non_target_fddt_value",
            "use_enrollments", "scb_layers", "use_pre_pos_fddt")},
    }
    with open(out / "config.json", "w") as f:
        json.dump(config, f, indent=2)
    if generation_config:
        with open(out / "generation_config.json", "w") as f:
            json.dump(generation_config, f, indent=2)
    # model card mirroring the reference's export_sources/readmes/ shape:
    # architecture summary, usage for both runtimes, benchmark context
    # (published DiCoW v3.3 table, export_sources/readmes/DiCoW_v3_3.md:88-99)
    card = (f"# DiCoW (TPU-native export)\n\n"
            f"Diarization-Conditioned Whisper exported from "
            f"ts-asr-whisper-tpu.\n\n"
            f"## Architecture\n\n"
            f"- d_model {cfg.d_model}, encoder {cfg.encoder_layers}L / "
            f"decoder {cfg.decoder_layers}L, vocab {cfg.vocab_size}\n"
            f"- FDDT: {'on' if cfg.use_fddt else 'off'} "
            f"(diagonal={cfg.fddt_is_diagonal}, init={cfg.fddt_init}, "
            f"pre-positional={cfg.use_pre_pos_fddt})\n"
            f"- CTC weight {cfg.ctc_weight}; "
            f"SE-DiCoW SCB layers: {cfg.scb_layers}\n\n"
            f"## Usage\n\n"
            f"JAX/TPU (this framework):\n\n"
            f"```python\n"
            f"from ts_asr_whisper_tpu.models.containers import "
            f"WhisperContainer\n"
            f"container = WhisperContainer(whisper_model='<this dir>')\n"
            f"```\n\n"
            f"PyTorch (upstream BUTSpeechFIT/TS-ASR-Whisper):\n\n"
            f"```python\n"
            f"DiCoWForConditionalGeneration.from_pretrained('<this dir>')\n"
            f"```\n\n"
            f"Decode via `python main.py +decode=dicow_v3_beam_joint "
            f"model.whisper_model=<this dir>` or "
            f"`scripts/smoke_decode.py`.\n\n"
            f"## Benchmark context\n\n"
            f"Published tcpWER (5 s collar, DiariZen diarization) of the "
            f"upstream DiCoW v3.3 / SE-DiCoW releases this architecture "
            f"reproduces:\n\n"
            f"| dataset | DiCoW v3.3 | SE-DiCoW |\n|---|---|---|\n"
            f"| Libri2Mix (both) | 9.7 % | 9.7 % |\n"
            f"| LibriSpeechMix (2) | 3.1 % | 3.1 % |\n"
            f"| AMI (SDM) | 18.7 % | 18.5 % |\n"
            f"| NOTSOFAR-1 (small, SC) | 26.6 % | 26.2 % |\n\n"
            f"Scores for THIS checkpoint depend on its training run; "
            f"reproduce with `scripts/smoke_decode.py` + "
            f"`scripts/score.py`.\n")
    with open(out / "README.md", "w") as f:
        f.write(card)
    logger.info("Exported HF checkpoint to %s", out)
