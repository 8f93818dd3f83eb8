#!/usr/bin/env python
"""CLI entry point.

Usage mirrors the reference (/root/reference/src/main.py + README):

    python main.py +train=dicow_v3 training.max_steps=1000
    python main.py +pretrain=turbo
    python main.py +decode=dicow_v3_greedy

Config composition: ts_asr_whisper_tpu/configs/base.yaml + ``+group=name``
overlays + dotted overrides (see ts_asr_whisper_tpu/config.py).
"""

import os
import sys

from ts_asr_whisper_tpu.config import load_config
from ts_asr_whisper_tpu.utils.logging_def import get_logger

logger = get_logger("main")


def _enable_compilation_cache():
    """Persistent XLA compilation cache: repeat CLI invocations skip the
    60-90 s cold compile of the train/decode programs. Opt out with
    TSAW_XLA_CACHE=0 or point TSAW_XLA_CACHE at a different directory."""
    cache = os.environ.get("TSAW_XLA_CACHE")
    if cache == "0":
        return
    if not cache:
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "ts_asr_whisper_tpu", "xla")
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort
        logger.warning("could not enable the XLA compilation cache",
                       exc_info=True)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    _enable_compilation_cache()
    # multi-host coordination (torchrun equivalent, submit_tpu.sh): no-op
    # unless JAX_COORDINATOR_ADDRESS is set in the environment
    from ts_asr_whisper_tpu.parallel.dist import initialize as dist_init

    dist_init()
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
