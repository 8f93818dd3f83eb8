#!/usr/bin/env python
"""CLI entry point.

Usage mirrors the reference (/root/reference/src/main.py + README):

    python main.py +train=dicow_v3 training.max_steps=1000
    python main.py +pretrain=turbo
    python main.py +decode=dicow_v3_greedy

Config composition: ts_asr_whisper_tpu/configs/base.yaml + ``+group=name``
overlays + dotted overrides (see ts_asr_whisper_tpu/config.py).
"""

import sys

from ts_asr_whisper_tpu.config import load_config
from ts_asr_whisper_tpu.utils.logging_def import get_logger

logger = get_logger("main")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config(list(argv))
    logger.info("experiment=%s output_dir=%s", cfg.experiment,
                cfg.training.output_dir)
    if cfg.training.pretrain_encoder:
        from ts_asr_whisper_tpu.pretrain_encoder import main as pretrain_main

        return pretrain_main(cfg)
    from ts_asr_whisper_tpu.train import main as train_main

    return train_main(cfg)


if __name__ == "__main__":
    out = main()
    if out:
        logger.info("final metrics: %s", out)
