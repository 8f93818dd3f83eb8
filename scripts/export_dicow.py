#!/usr/bin/env python
"""Export a trained checkpoint to the HF DiCoW layout
(reference utils/export_dicow.py, minus the hub push — zero-egress)."""

from __future__ import annotations

import argparse
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from ts_asr_whisper_tpu.config import load_config
    from ts_asr_whisper_tpu.models.containers import WhisperContainer
    from ts_asr_whisper_tpu.training.checkpoints import (
        export_hf_checkpoint,
        restore_checkpoint,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=Path, required=True,
                    help="orbax checkpoint dir (output_dir/ckpt)")
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("overrides", nargs="*", default=[])
    args = ap.parse_args()

    cfg = load_config(list(args.overrides))
    container = WhisperContainer(cfg)
    state, step = restore_checkpoint(str(args.ckpt),
                                     {"params": container.params})
    export_hf_checkpoint(state["params"], container.model_config,
                         str(args.out))
    print(f"Exported step {step} to {args.out}")


if __name__ == "__main__":
    main()
