"""Decode timing decomposition on the current default device.

Times each stage of the long-form pipeline separately (mel, encoder,
greedy loop, beam-joint loop, CTC rescore share, device window slicing,
host segment retrieval) plus the end-to-end longform_generate, so bench
regressions can be attributed to a stage. Run on TPU:

    python scripts/profile_decode.py [--batch 16] [--beams 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from ts_asr_whisper_tpu.utils.device import force_execution as _force  # noqa: E402


def timeit(fn, iters=3, warmup=1):
    for _ in range(warmup):
        _force(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--beam-batch", type=int, default=8)
    ap.add_argument("--beams", type=int, default=5)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--model", default="large-v3-turbo")
    ap.add_argument("--reorder", default=None,
                    help="beam KV reorder strategy (ops/reorder.py)")
    ap.add_argument("--topk", default=None,
                    help="beam candidate top-k impl (ops/topk.py)")
    ap.add_argument("--kv-layout", default=None,
                    help="KV cache layout (models/whisper.py)")
    args = ap.parse_args()

    if args.reorder:
        from ts_asr_whisper_tpu.ops.reorder import set_reorder_impl
        set_reorder_impl(args.reorder)
    if args.topk:
        from ts_asr_whisper_tpu.ops.topk import set_topk_impl
        set_topk_impl(args.topk)
    if args.kv_layout:
        from ts_asr_whisper_tpu.models.whisper import set_kv_cache_layout
        set_kv_cache_layout(args.kv_layout)

    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
    from ts_asr_whisper_tpu.decoding.greedy import greedy_decode
    from ts_asr_whisper_tpu.decoding.beam import beam_search
    from ts_asr_whisper_tpu.decoding.longform import (
        _encoder_jit,
        _ctc_logits_jit,
        _slice_windows_dev,
        longform_generate,
    )
    from ts_asr_whisper_tpu.models.config import make_config
    from ts_asr_whisper_tpu.models.convert import cast_params
    from ts_asr_whisper_tpu.models.dicow import init_dicow
    from ts_asr_whisper_tpu.ops.attention import set_attention_impl
    from ts_asr_whisper_tpu.ops.mel import log_mel_spectrogram

    if jax.default_backend() == "tpu":
        set_attention_impl("pallas")

    cfg = make_config(args.model, ctc_weight=0.3, use_fddt=True,
                      use_pre_pos_fddt=True, non_target_fddt_value=0.5,
                      dtype="bfloat16")
    params = cast_params(init_dicow(jax.random.PRNGKey(0), cfg), jnp.bfloat16)

    b = args.batch
    n_windows = 3
    t_total = 3000 * n_windows
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((b, 160 * t_total)).astype(np.float32) * 0.05

    # --- mel ---
    audio_dev = jnp.asarray(audio)
    mel_fn = jax.jit(lambda a: log_mel_spectrogram(a, cfg.num_mel_bins))
    t_mel = timeit(lambda: mel_fn(audio_dev))
    print(f"mel (batch {b}, {n_windows * 30}s):      {t_mel * 1e3:8.1f} ms")

    feats = mel_fn(audio_dev)
    feats_dev = jnp.pad(feats.astype(jnp.float32), ((0, 0), (0, 0), (0, 3000)))
    stno_dev = jnp.pad(
        jnp.full((b, 4, t_total // 2), 0.25, jnp.float32),
        ((0, 0), (0, 0), (0, 1500)))

    meta = jnp.stack([jnp.arange(b, dtype=jnp.int32),
                      jnp.zeros(b, jnp.int32),
                      jnp.full(b, 3000, jnp.int32),
                      jnp.full(b, 1500, jnp.int32)])
    forced0 = jnp.tile(jnp.asarray([[50258, 50259, 50360]], jnp.int32),
                       (b, 1))
    t_slice = timeit(lambda: _slice_windows_dev(
        feats_dev, stno_dev, forced0, meta, nsf=3000))
    print(f"window slice (batch {b}):    {t_slice * 1e3:8.1f} ms")

    window, stno_w, _ = _slice_windows_dev(
        feats_dev, stno_dev, forced0, meta, nsf=3000)

    t_enc = timeit(lambda: _encoder_jit(params["encoder"], cfg, window, stno_w))
    print(f"encoder (batch {b}):         {t_enc * 1e3:8.1f} ms")
    enc = _encoder_jit(params["encoder"], cfg, window, stno_w)

    gen = GenerationConfig(return_timestamps=True, max_length=448)
    prompts = jnp.tile(jnp.asarray([[50258, 50259, 50360]], jnp.int64), (b, 1))

    t_greedy = timeit(lambda: greedy_decode(
        params, cfg, gen, enc, prompts, args.max_new, force_full_length=True))
    print(f"greedy loop {args.max_new} tok (b{b}):  {t_greedy * 1e3:8.1f} ms"
          f"  ({t_greedy / args.max_new * 1e3:.2f} ms/tok)")

    # --- beam-joint pieces at the beam envelope ---
    bb = args.beam_batch
    enc_b = enc[:bb]
    prompts_b = prompts[:bb]
    gen_beam = GenerationConfig(return_timestamps=True, max_length=448,
                                num_beams=args.beams, ctc_weight=0.2,
                                length_penalty=0.1)
    t_beam_plain = timeit(lambda: beam_search(
        params, cfg, gen_beam, enc_b, prompts_b, args.max_new,
        num_beams=args.beams))
    print(f"beam-{args.beams} loop no-CTC (b{bb}): {t_beam_plain * 1e3:8.1f} ms")

    from ts_asr_whisper_tpu.decoding.ctc_rescorer import (
        CTCRescorer,
        init_ctc_state,
    )

    enc_logits = _ctc_logits_jit(params["encoder"], cfg, enc_b)
    blank = cfg.ctc_vocab_size - 1
    scorer = CTCRescorer(blank_id=blank, eos_id=gen_beam.eos_token_id,
                         timestamp_begin=gen_beam.timestamp_begin,
                         ctc_weight=0.2, k=min(500, gen_beam.timestamp_begin - 1),
                         prefix_len=3)

    def beam_joint():
        state = init_ctc_state(enc_logits, blank, None,
                               num_beams=args.beams, k=scorer.k)
        return beam_search(params, cfg, gen_beam, enc_b, prompts_b,
                           args.max_new, num_beams=args.beams,
                           ctc_scorer=scorer, ctc_state=state)

    t_beam_joint = timeit(beam_joint)
    print(f"beam-{args.beams} loop +CTC (b{bb}):  {t_beam_joint * 1e3:8.1f} ms"
          f"  (rescore share {100 * (1 - t_beam_plain / t_beam_joint):.0f}%)")

    # --- end-to-end longform (greedy) ---
    feats_np = np.asarray(feats, np.float32)
    stno_np = np.full((b, 4, t_total // 2), 0.25, np.float32)
    attn = np.ones((b, t_total), np.int64)
    prompts_np = np.tile(np.asarray([[50258, 50259, 50360]], np.int64), (b, 1))

    def run_lf(f_in, s_in):
        return longform_generate(params, cfg, gen, f_in, s_in, attn,
                                 prompts_np, max_new_tokens=args.max_new)

    stno_jdev = jnp.asarray(stno_np)
    for label, f_in, s_in in (("host feats", feats_np, stno_np),
                              ("device feats", feats, stno_jdev)):
        out = run_lf(f_in, s_in)  # compile / warm
        t0 = time.perf_counter()
        out = run_lf(f_in, s_in)
        t_lf = time.perf_counter() - t0
        audio_s = out.windows_decoded * 30.0
        print(f"longform greedy e2e [{label}]: {t_lf * 1e3:8.1f} ms  "
              f"({out.windows_decoded} windows, {audio_s / t_lf:.0f}x "
              f"realtime)")
        per_window_dev = (t_enc + t_greedy)
        est = per_window_dev * out.windows_decoded / b
        print(f"  device-stage estimate:    {est * 1e3:8.1f} ms  "
              f"(host+transfer overhead {(t_lf - est) * 1e3:.0f} ms)")


if __name__ == "__main__":
    main()
