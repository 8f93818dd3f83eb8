"""Benchmarks: DiCoW large-v3-turbo on one chip, measured on the REAL paths.

Three metrics, one JSON line each (the greedy long-form RTFx first — the
north-star headline):

1. longform_greedy_rtfx  — full longform_generate() on multi-window
   synthetic meetings: on-device mel + encoder+FDDT + KV-cached greedy
   window decode PLUS the host seek orchestration (segment retrieval,
   active-row compaction, timestamp re-blocking). Audio-seconds transcribed
   per wall-clock second.
2. longform_beam_joint_rtfx — same pipeline with the reference's headline
   beam-5 joint-CTC decode envelope (ctc_weight 0.2, length_penalty 0.1,
   configs/decode/dicow_v3_beam_joint.yaml).
3. train_step_samples_per_s — jitted train step (bf16 compute, remat,
   AdamW, donated buffers) at batch 8 on 30 s windows.

Plus one line per remaining README throughput claim (every README number
maps 1:1 onto an emitted metric): the beam device-window rate, the
encoder-only RTFx, the single-worker dataloader rate, and the native
tcpWER session-scoring latency.

``vs_baseline`` for decode = value / 50 (the >=50x real-time north star;
the reference publishes no throughput numbers). For training there is no
reference number; vs_baseline is null.
"""

from __future__ import annotations

import gc
import json
import time

import numpy as np


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      "vs_baseline": vs_baseline}), flush=True)


# TSAW_BENCH_MODEL overrides the benchmarked architecture (e.g. 'tiny' for
# a CPU smoke of the bench plumbing itself); TSAW_BENCH_BATCH divides the
# batch sizes accordingly. Production numbers use the defaults.
import os

_BENCH_MODEL = os.environ.get("TSAW_BENCH_MODEL", "large-v3-turbo")
_BATCH_DIV = int(os.environ.get("TSAW_BENCH_BATCH_DIV", "1"))


def _bench_longform(num_beams: int, ctc_weight: float, batch: int,
                    n_windows: int, length_penalty: float = 1.0):
    import jax
    import jax.numpy as jnp

    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
    from ts_asr_whisper_tpu.decoding.longform import longform_generate
    from ts_asr_whisper_tpu.models.config import make_config
    from ts_asr_whisper_tpu.models.convert import cast_params
    from ts_asr_whisper_tpu.models.dicow import init_dicow
    from ts_asr_whisper_tpu.ops.mel import log_mel_spectrogram

    batch = max(batch // _BATCH_DIV, 1)
    cfg = make_config(
        _BENCH_MODEL,
        ctc_weight=ctc_weight,
        use_fddt=True,
        use_pre_pos_fddt=True,
        non_target_fddt_value=0.5,
        dtype="bfloat16",
    )
    # beam-mode A/B knobs (lossy, default OFF to match the parity-exact
    # configuration the README numbers quote): TSAW_BENCH_KVQ=1 turns on
    # the int8 cross-KV cache, TSAW_BENCH_CTC_PBF16=1 the bf16 CTC
    # posterior for the psi matmul
    # exact-equivalent strategy knobs (see docs/PERFORMANCE.md matrix):
    # TSAW_BENCH_REORDER (pallas|onehot|fused|fused_onehot|ancestry),
    # TSAW_BENCH_TOPK (lax|thresholded), TSAW_BENCH_KV_LAYOUT (bhtd|tbhd|thbd)
    if os.environ.get("TSAW_BENCH_REORDER"):
        from ts_asr_whisper_tpu.ops.reorder import set_reorder_impl
        set_reorder_impl(os.environ["TSAW_BENCH_REORDER"])
    if os.environ.get("TSAW_BENCH_TOPK"):
        from ts_asr_whisper_tpu.ops.topk import set_topk_impl
        set_topk_impl(os.environ["TSAW_BENCH_TOPK"])
    if os.environ.get("TSAW_BENCH_KV_LAYOUT"):
        from ts_asr_whisper_tpu.models.whisper import set_kv_cache_layout
        set_kv_cache_layout(os.environ["TSAW_BENCH_KV_LAYOUT"])
    gen_cfg = GenerationConfig(return_timestamps=True, max_length=448,
                               num_beams=num_beams, ctc_weight=ctc_weight,
                               length_penalty=length_penalty,
                               cross_kv_quant=os.environ.get(
                                   "TSAW_BENCH_KVQ") == "1",
                               ctc_p_bf16=os.environ.get(
                                   "TSAW_BENCH_CTC_PBF16") == "1")
    params = init_dicow(jax.random.PRNGKey(0), cfg)
    params = cast_params(params, jnp.bfloat16)

    t_total = 3000 * n_windows
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 160 * t_total)).astype(np.float32) \
        * 0.05
    # mel runs on device and the features STAY there: a production server
    # overlaps audio ingest with the previous meeting's decode, so the
    # steady-state rate is set by mel+decode, not by the host link. (On
    # this harness's remoted TPU the link is ~45 MB/s — 100x slower than a
    # real v5e host's PCIe — so the _incl_upload variant reported
    # separately is a hard lower bound, not the expected production rate.)
    feats = jax.jit(lambda a: log_mel_spectrogram(a, cfg.num_mel_bins))(
        jnp.asarray(audio)).astype(jnp.float32)
    feats_host = np.asarray(feats, dtype=np.float32)
    stno = np.full((batch, 4, t_total // 2), 0.25, np.float32)
    attn = np.ones((batch, t_total), np.int64)
    prompts = np.tile(np.asarray([[50258, 50259, 50360]], np.int64),
                      (batch, 1))

    def run(f_in):
        return longform_generate(params, cfg, gen_cfg, f_in, stno, attn,
                                 prompts, max_new_tokens=128)

    run(feats)  # compile (encoder + decode loop + all bucket shapes)
    nominal_s = float(attn.sum()) / 100.0  # unique audio seconds per call

    def measure(f_in, iters=2):
        t0 = time.perf_counter()
        windows = 0
        for _ in range(iters):
            out = run(f_in)
            windows += out.windows_decoded
        np.asarray(out.sequences)
        elapsed = time.perf_counter() - t0
        # conservative headline: unique audio transcribed per second.
        # Random-weight decodes trigger seek rollbacks (windows re-decoded
        # with partial advance) that sane checkpoints don't, so the device
        # actually decoded windows*30 s of input; that device-throughput
        # rate is returned separately.
        return nominal_s * iters / elapsed, windows * 30.0 / elapsed

    rtfx, rtfx_dev = measure(feats)
    rtfx_upload, _ = measure(feats_host)
    del params
    gc.collect()
    return rtfx, rtfx_upload, rtfx_dev


def _bench_encoder(batch: int = 16):
    """Encoder-only RTFx on 30 s windows (conv stem + FDDT + layer stack),
    bf16, whatever attention impl main() selected."""
    import jax
    import jax.numpy as jnp

    from ts_asr_whisper_tpu.models.config import make_config
    from ts_asr_whisper_tpu.models.convert import cast_params
    from ts_asr_whisper_tpu.models.dicow import (
        dicow_encoder_forward,
        init_dicow,
    )

    batch = max(batch // _BATCH_DIV, 1)
    cfg = make_config(_BENCH_MODEL, ctc_weight=0.0, use_fddt=True,
                      use_pre_pos_fddt=True, non_target_fddt_value=0.5,
                      dtype="bfloat16")
    params = cast_params(init_dicow(jax.random.PRNGKey(0), cfg),
                         jnp.bfloat16)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal(
        (batch, cfg.num_mel_bins, 3000)).astype(np.float32))
    stno = jnp.full((batch, 4, 1500), 0.25, jnp.float32)

    # params as an ARGUMENT: closing over them would bake ~800 M weights
    # into the program as constants (docs/PERFORMANCE.md timing pitfalls)
    fwd = jax.jit(lambda p, f, s: dicow_encoder_forward(p, cfg, f, s))
    jax.block_until_ready(fwd(params["encoder"], feats, stno))  # compile
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params["encoder"], feats, stno)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    del params
    gc.collect()
    return batch * 30.0 * iters / elapsed


def _bench_dataloader():
    """Single-worker host featurization rate (WAV -> mel -> STNO ->
    collate) via scripts/bench_dataloader.py; multi-worker scaling lives
    there too (--sweep) but is core-bound, so the driver line is the
    per-core rate."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "scripts/bench_dataloader.py", "--workers", "1",
         "--n-cuts", "96"],
        capture_output=True, text=True, timeout=600)
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
            return float(rec["value"])
        except (ValueError, KeyError):
            continue
    raise RuntimeError(f"bench_dataloader produced no metric: {out.stdout!r} "
                       f"{out.stderr[-500:]!r}")


def _bench_tcpwer_session(n_words: int = 2400, n_spk: int = 4):
    """Native-matcher scoring latency for one long session (the host-side
    cost per meeting at eval time)."""
    from ts_asr_whisper_tpu.eval.seglst import SegLST
    from ts_asr_whisper_tpu.eval.wer import calc_session_tcp_wer

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(200)]

    def session(prefix):
        segs, t = [], 0.0
        per_seg = 8
        for i in range(n_words // per_seg):
            segs.append({
                "session_id": "s",
                "speaker": f"{prefix}{i % n_spk}",
                "start_time": t,
                "end_time": t + 3.0,
                "words": " ".join(rng.choice(vocab, per_seg))})
            t += 2.5
        return SegLST(segs)

    ref, hyp = session("A"), session("h")
    calc_session_tcp_wer(ref, hyp, collar=5)  # warm (loads the .so)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        calc_session_tcp_wer(ref, hyp, collar=5)
    return (time.perf_counter() - t0) / iters * 1000.0


def _bench_train_step(batch: int = 8):
    import jax

    from ts_asr_whisper_tpu.config import Cfg
    from ts_asr_whisper_tpu.models.config import make_config
    from ts_asr_whisper_tpu.models.dicow import init_dicow
    from ts_asr_whisper_tpu.training.trainer import make_train_step

    batch = max(batch // _BATCH_DIV, 1)
    cfg = make_config(
        _BENCH_MODEL,
        ctc_weight=0.3,
        use_fddt=True,
        use_pre_pos_fddt=True,
        non_target_fddt_value=0.5,
        dtype="bfloat16",
    )
    t = Cfg().training
    t.learning_rate = 2e-6
    t.lr_scheduler_type = "cosine"
    t.max_steps = 1000
    t.warmup_steps = 100
    params = init_dicow(jax.random.PRNGKey(0), cfg)

    # the dicow_v3 fine-tune recipe: decoder frozen (configs/train/
    # dicow_v3.yaml params_to_keep_frozen_keywords), built through the real
    # optimizer path — multi_transform allocates NO Adam state for frozen
    # params, which is what lets larger batches fit
    from ts_asr_whisper_tpu.training.optim import (
        build_optimizer,
        trainable_mask,
    )

    t.adam_mu_dtype = "bfloat16"
    # TSAW_BENCH_REMAT picks the remat policy (full | dots | attn) for
    # A/B runs; 'attn' saves per-layer attention outputs so the backward
    # replay skips the flash forward (models/whisper.py::set_remat_policy)
    from ts_asr_whisper_tpu.models.whisper import set_remat_policy

    set_remat_policy(os.environ.get("TSAW_BENCH_REMAT", "attn"))
    tx, opt_state = build_optimizer(params, t,
                                    frozen_keywords=("decoder",))
    mask = trainable_mask(params, (), ("decoder",), preheat_only=False)
    step_fn, _ = make_train_step(cfg, tx, num_prefix_tokens=3, remat=True,
                                 trainable_mask=mask)

    rng = np.random.default_rng(0)
    labels = np.concatenate(
        [np.full((batch, 1), 50258, np.int32),
         rng.integers(0, 20000, (batch, 95)).astype(np.int32)], axis=1)
    batch_data = {
        "input_features": rng.standard_normal(
            (batch, cfg.num_mel_bins, 3000)).astype(np.float32),
        "stno_mask": np.full((batch, 4, 1500), 0.25, np.float32),
        "labels": labels,
        "upp_labels": labels.copy(),
    }
    from ts_asr_whisper_tpu.utils.device import force_execution as _force

    params, opt_state, _ = step_fn(params, opt_state, batch_data)  # compile
    _force(params)
    t0 = time.perf_counter()
    steps = 5
    for _ in range(steps):
        params, opt_state, parts = step_fn(params, opt_state, batch_data)
    _force(params)
    elapsed = time.perf_counter() - t0
    return batch * steps / elapsed


def main():
    import jax

    from ts_asr_whisper_tpu.ops.attention import set_attention_impl

    if jax.default_backend() == "tpu":
        set_attention_impl("pallas")  # flash kernel: +26% encoder throughput

    # batch 16 = the reference's greedy eval envelope
    # (configs/decode/dicow_v3_greedy.yaml); measured sweet spot on v5e
    rtfx, rtfx_up, rtfx_dev = _bench_longform(num_beams=1, ctc_weight=0.0,
                                              batch=16, n_windows=3)
    _emit("longform_greedy_rtfx_large-v3-turbo", round(rtfx, 2),
          "x_realtime_per_chip", round(rtfx / 50.0, 3))
    _emit("longform_greedy_device_window_rtfx_large-v3-turbo",
          round(rtfx_dev, 2), "x_realtime_per_chip",
          round(rtfx_dev / 50.0, 3))
    _emit("longform_greedy_rtfx_incl_upload_large-v3-turbo",
          round(rtfx_up, 2), "x_realtime_per_chip",
          round(rtfx_up / 50.0, 3))

    rtfx_beam, _, rtfx_beam_dev = _bench_longform(
        num_beams=5, ctc_weight=0.2, batch=8, n_windows=2,
        length_penalty=0.1)
    _emit("longform_beam5_joint_ctc_rtfx_large-v3-turbo", round(rtfx_beam, 2),
          "x_realtime_per_chip", round(rtfx_beam / 50.0, 3))
    _emit("longform_beam5_joint_ctc_device_window_rtfx_large-v3-turbo",
          round(rtfx_beam_dev, 2), "x_realtime_per_chip",
          round(rtfx_beam_dev / 50.0, 3))

    enc_rtfx = _bench_encoder(batch=16)
    _emit("encoder_rtfx_large-v3-turbo", round(enc_rtfx, 2),
          "x_realtime_per_chip", round(enc_rtfx / 50.0, 3))

    sps = _bench_train_step(batch=8)
    _emit("train_step_samples_per_s_large-v3-turbo", round(sps, 2),
          "samples_per_s_per_chip", None)

    loader_sps = _bench_dataloader()
    _emit("dataloader_samples_per_s_w1", round(loader_sps, 2),
          "samples_per_s_per_core", None)

    tcp_ms = _bench_tcpwer_session()
    _emit("tcpwer_session_2400w_ms", round(tcp_ms, 2), "ms_per_session",
          None)


if __name__ == "__main__":
    main()
