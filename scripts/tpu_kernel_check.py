"""Compiled-Pallas-kernel equivalence checks on REAL TPU hardware.

The CI test suite pins the CPU backend (tests/conftest.py), so every
Pallas kernel there runs in interpret mode — the Mosaic-compiled path is
exercised only by benchmarks, which never compare numerics. This script
closes that gap: run it on a machine with a TPU attached and it asserts,
against the pure-XLA formulations the CPU suite already trusts:

1. fused ancestry-mask beam attention (`ops/beam_attention.py`) — full
   beam_search token/score equivalence `ancestry_pallas` vs `onehot`;
2. the standalone block-DMA KV reorder kernel (`ops/reorder.py` 'pallas');
3. flash attention fwd + bwd (`ops/attention.py` 'pallas' vs 'xla').

Exit code 0 = all compiled kernels numerically match. Wire it into any
TPU-equipped CI as `python scripts/tpu_kernel_check.py`.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def check_beam_ancestry_and_reorder():
    from ts_asr_whisper_tpu.decoding.beam import beam_search
    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig
    from ts_asr_whisper_tpu.models.config import DiCoWConfig
    from ts_asr_whisper_tpu.models.dicow import (
        dicow_encoder_forward,
        init_dicow,
    )
    from ts_asr_whisper_tpu.ops import reorder as R

    v = 1700
    eos, sot = 30, 31
    cfg = DiCoWConfig(
        vocab_size=v, num_mel_bins=24, d_model=64, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_ffn_dim=128, max_source_positions=48,
        max_target_positions=64, decoder_start_token_id=sot,
        eos_token_id=eos, pad_token_id=eos, bos_token_id=eos,
        dtype="float32", use_fddt=True, use_pre_pos_fddt=True)
    params = init_dicow(jax.random.PRNGKey(7), cfg)
    gen_cfg = GenerationConfig(
        eos_token_id=eos, pad_token_id=eos, bos_token_id=eos,
        decoder_start_token_id=sot, no_timestamps_token_id=v - 1502,
        return_timestamps=True, max_length=64, length_penalty=1.0)
    rng = np.random.default_rng(23)
    feats = rng.standard_normal((2, 24, 96)).astype(np.float32)
    raw = rng.random((2, 4, 48)).astype(np.float32)
    stno = raw / raw.sum(axis=1, keepdims=True)
    enc = dicow_encoder_forward(params["encoder"], cfg, jnp.asarray(feats),
                                jnp.asarray(stno))
    prompt = jnp.asarray([[sot, 50], [sot, 50]], jnp.int32)

    outs = {}
    prev = R.get_reorder_impl(raw=True)
    try:
        for impl in ("onehot", "pallas", "ancestry_pallas"):
            R.set_reorder_impl(impl)
            beam_search.clear_cache()
            outs[impl] = beam_search(params, cfg, gen_cfg, enc, prompt,
                                     max_new_tokens=9, num_beams=4)
    finally:
        R.set_reorder_impl(prev)
        beam_search.clear_cache()

    base = outs["onehot"]
    for impl in ("pallas", "ancestry_pallas"):
        alt = outs[impl]
        assert np.asarray(base.sequences).tolist() == \
            np.asarray(alt.sequences).tolist(), \
            f"{impl}: compiled-kernel beam tokens diverge from XLA"
        np.testing.assert_allclose(
            np.asarray(base.scores), np.asarray(alt.scores),
            rtol=2e-5, atol=2e-5,
            err_msg=f"{impl}: compiled-kernel beam scores diverge")
        print(f"  beam '{impl}' vs 'onehot': tokens identical, "
              f"scores within 2e-5")


def check_flash_attention():
    from ts_asr_whisper_tpu.ops import attention as A

    rng = np.random.default_rng(3)
    b, h, t, hd = 2, 4, 300, 64  # t >= 256 and non-multiple of block_q
    q, k, vv = (jnp.asarray(rng.standard_normal((b, h, t, hd)) * hd ** -0.5,
                            jnp.float32) for _ in range(3))

    def run(impl):
        prev = A.get_attention_impl()
        try:
            A.set_attention_impl(impl)

            def loss(q, k, vv):
                return jnp.sum(A.sdpa(q, k, vv) ** 2)

            out = jax.jit(A.sdpa)(q, k, vv)
            grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, vv)
            return out, grads
        finally:
            A.set_attention_impl(prev)

    out_x, g_x = run("xla")
    out_p, g_p = run("pallas")
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5,
                               err_msg="flash fwd diverges from XLA")
    for gx, gp, name in zip(g_x, g_p, "qkv"):
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gp),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"flash bwd d{name} diverges")
    print("  flash attention fwd + bwd (q/k/v grads) within 2e-4 of XLA")


def main():
    backend = jax.default_backend()
    if backend != "tpu":
        print(f"SKIP: backend is '{backend}', need a real TPU "
              "(the CPU suite already covers interpret mode)")
        return 0
    print(f"devices: {jax.devices()}")
    print("checking compiled beam kernels (ancestry + reorder)...")
    check_beam_ancestry_and_reorder()
    print("checking compiled flash attention...")
    check_flash_attention()
    print("OK: all compiled Pallas kernels match their XLA formulations")
    return 0


if __name__ == "__main__":
    sys.exit(main())
