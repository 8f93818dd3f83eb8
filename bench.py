"""Benchmark: DiCoW large-v3-turbo long-form decode throughput on one chip.

Measures the full per-window inference pipeline (mel->encoder+FDDT->KV-cached
greedy decode of a fixed token budget) and reports real-time factor:
audio-seconds transcribed per wall-clock second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 50 — the north-star target of >=50x real time per
v5e chip (BASELINE.json; the reference publishes no throughput numbers).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
    from ts_asr_whisper_tpu.decoding.greedy import greedy_decode
    from ts_asr_whisper_tpu.models.config import make_config
    from ts_asr_whisper_tpu.models.dicow import dicow_encoder_forward, init_dicow
    from ts_asr_whisper_tpu.ops.mel import log_mel_spectrogram

    batch = 16
    decode_tokens = 128   # realistic tokens per 30 s window
    iters = 8

    from ts_asr_whisper_tpu.ops.attention import set_attention_impl

    if jax.default_backend() == "tpu":
        set_attention_impl("pallas")  # flash kernel: +26% encoder throughput

    cfg = make_config(
        "large-v3-turbo",
        ctc_weight=0.0,          # greedy decode config (ctc_weight 0)
        use_fddt=True,
        use_pre_pos_fddt=True,
        non_target_fddt_value=0.5,
        dtype="bfloat16",
    )
    gen_cfg = GenerationConfig(return_timestamps=True, max_length=448)

    params = init_dicow(jax.random.PRNGKey(0), cfg)
    # serving: bf16 weights halve the weight-streaming traffic that
    # dominates small-batch decode steps
    from ts_asr_whisper_tpu.models.convert import cast_params

    params = cast_params(params, jnp.bfloat16)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.05
    audio_j = jnp.asarray(audio)
    stno = jnp.full((batch, 4, 1500), 0.25, jnp.float32)
    prompts = jnp.tile(jnp.asarray([[50258, 50259, 50360]], jnp.int32),
                       (batch, 1))

    @jax.jit
    def encode(params, audio, stno):
        feats = log_mel_spectrogram(audio, cfg.num_mel_bins)
        return dicow_encoder_forward(params["encoder"], cfg, feats, stno)

    def window(params):
        enc = encode(params, audio_j, stno)
        out = greedy_decode(params, cfg, gen_cfg, enc, prompts,
                            max_new_tokens=decode_tokens,
                            force_full_length=True)
        return out.sequences

    # warmup/compile (np.asarray forces full materialization — on remoted
    # backends block_until_ready alone can return before execution finishes)
    np.asarray(window(params))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = window(params)
    np.asarray(out)
    elapsed = time.perf_counter() - t0

    audio_seconds = batch * 30.0 * iters
    rtfx = audio_seconds / elapsed
    print(json.dumps({
        "metric": "longform_decode_rtfx_large-v3-turbo",
        "value": round(rtfx, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtfx / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
