"""Probe: candidate-restricted CTC psi vs the full-vocab matmul (r05 task 1).

The r04 beam-step trace (docs/PERFORMANCE.md "Beam-step roofline") puts the
CTC psi matmul at 1.65 ms/step — the single largest op — reading the full
(8, 1500, 51867) posterior every token. Candidates actually scored are the
top-500-by-attention per hypothesis (reference decoding.py:309-313), i.e.
~0.5 % of the vocab. This probe measures, on REAL TPU at the beam-5 batch-8
large-v3-turbo envelope, each primitive of a candidate-restricted path:

  1. baseline: ctc_psi_matmul (bf16 + fp32 posterior)
  2. candidate-id extraction from the membership mask
     (a) vectorized binary search over the mask cumsum (take_along_axis)
     (b) two-level: coarse block counts + gathered-block local search
  3. Pallas gather+dot kernel: per-(hyp, candidate) T-row DMAs from HBM
     with manual double buffering, fused psi partial dot in VMEM
     (G-row groups; sweep G) — fp32 and bf16 posterior
  4. dense scatter of (Bb, K) psi back over the vocab
  5. the XLA gather formulation (known-bad reference point, ~35 GB/s)

Run: python scripts/probe_psi_gather.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B_AUDIO, N_BEAMS, T, V = 8, 5, 1500, 51867   # CTC vocab incl. blank
BB = B_AUDIO * N_BEAMS
K = 512                                       # 500 candidates (+eos) padded
TS_BEGIN = 50364
EOS = 50257
LOG_FLOOR = -1e10                             # log-prob pad: exp -> 0


def _timeit(fn, *args, reps=20, warmup=3):
    """DEVICE time per call (profiler-derived; wall clock here has a ~25 ms
    tunnel-dispatch floor that swamps ms-scale ops)."""
    from ts_asr_whisper_tpu.utils.devicetime import measure_device_ms

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    def thunk():
        r = None
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)

    dev_ms = measure_device_ms(thunk)
    if dev_ms is None:   # CPU fallback: wall clock
        t0 = time.perf_counter()
        thunk()
        dev_ms = (time.perf_counter() - t0) * 1e3
    return dev_ms / reps, out


# ---------------------------------------------------------------- extraction

@jax.jit
def extract_binsearch(mask: jax.Array) -> jax.Array:
    """ids[b, j] = index of the (j+1)-th set bit of mask[b] (V if absent),
    via vectorized binary search on the inclusive cumsum."""
    bb, v = mask.shape
    csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
    targets = jnp.arange(1, K + 1, dtype=jnp.int32)[None, :]    # (1, K)
    lo = jnp.zeros((bb, K), jnp.int32)
    hi = jnp.full((bb, K), v - 1, jnp.int32)
    # invariant: first index with csum >= target lies in [lo, hi] (or > hi)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        val = jnp.take_along_axis(csum, mid, axis=1)
        ge = val >= targets
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 17, body, (lo, hi))
    found = jnp.take_along_axis(csum, lo, axis=1) >= targets
    return jnp.where(found, lo, v - 1).astype(jnp.int32)


BLK = 512


@jax.jit
def extract_twolevel(mask: jax.Array) -> jax.Array:
    """Same contract as extract_binsearch: coarse search over per-block
    cumulative counts (VPU broadcast compare), then one row-gather of the
    512-wide local cumsum block per query and a local comparison count."""
    bb, v = mask.shape
    nb = (v + BLK - 1) // BLK
    pad = nb * BLK - v
    m = jnp.pad(mask, ((0, 0), (0, pad))).astype(jnp.int32)
    local = jnp.cumsum(m.reshape(bb, nb, BLK), axis=2)          # (Bb,nb,512)
    blk_end = local[:, :, -1]
    coarse = jnp.cumsum(blk_end, axis=1)                        # (Bb, nb)
    targets = jnp.arange(1, K + 1, dtype=jnp.int32)             # (K,)
    # first block whose cumulative count >= target
    blk_idx = (coarse[:, :, None] < targets[None, None, :]) \
        .sum(axis=1).astype(jnp.int32)                          # (Bb, K)
    blk_idx = jnp.minimum(blk_idx, nb - 1)
    base = jnp.where(blk_idx > 0,
                     jnp.take_along_axis(coarse, jnp.maximum(blk_idx - 1, 0),
                                         axis=1),
                     0)
    rows = jnp.take_along_axis(local, blk_idx[:, :, None], axis=1)  # (Bb,K,512)
    local_t = (targets[None, :] - base)[:, :, None]             # (Bb, K, 1)
    off = (rows < local_t).sum(axis=2).astype(jnp.int32)        # (Bb, K)
    ids = blk_idx * BLK + off
    return jnp.minimum(ids, v - 1).astype(jnp.int32)


# ---------------------------------------------------------------- the kernel

R = 8   # hyps per grid step: one fp32 sublane tile, so every store is static
S = 8   # sublane fold of the time axis: posterior rows are stored as
#         (8, Tp/8) blocks so a candidate row is a FULL trailing-2D slice —
#         Mosaic requires DMA slices along tiled (last-two) dims to be
#         8/128-aligned, so a (T,) row of a (B, V, T) tensor cannot be
#         DMA'd directly ("Slice shape along dimension 1 must be aligned
#         to tiling (8), but is 1", probed r05)


def fold_time(p_vt: jax.Array, pad_value: float) -> jax.Array:
    """(B, V, T) -> (B, V, 8, ceil(T/1024)*128): a candidate row becomes a
    full trailing-2D block whose dims satisfy Mosaic's DMA slice tiling
    (sublane multiple of 8, lane multiple of 128 — 'Slice shape along
    dimension 3 must be aligned to tiling (128)', probed r05). T=1500 pads
    to 2048 (+36% bytes, still ~20x less than the full-vocab read)."""
    b, v, t = p_vt.shape
    tp = -(-t // (S * 128)) * S * 128
    p = jnp.pad(p_vt, ((0, 0), (0, 0), (0, tp - t)),
                constant_values=pad_value)
    return p.reshape(b, v, S, tp // S)


def _psi_gather_kernel(G, take_exp=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_groups = K // G

    def kernel(cand_ref, aidx_ref, p_hbm, w_ref, out_ref, rows, sems):
        bi = pl.program_id(0)                 # hyp-tile (R hyps each)
        g = pl.program_id(1)
        nb = pl.num_programs(0)
        ng = pl.num_programs(1)
        flat = bi * ng + g
        total = nb * ng

        def issue(slot, flat_idx):
            bi_ = flat_idx // ng
            g_ = flat_idx % ng
            for r in range(R):                # static rows
                b_ = bi_ * R + r
                a = aidx_ref[b_]

                def body(j, _):
                    cid = cand_ref[b_, g_ * G + j]
                    pltpu.make_async_copy(
                        p_hbm.at[a, cid], rows.at[slot, r, j],
                        sems.at[slot, r]).start()
                    return 0

                jax.lax.fori_loop(0, G, body, 0)

        @pl.when(flat == 0)
        def _():
            issue(0, 0)

        @pl.when(flat + 1 < total)
        def _():
            issue((flat + 1) % 2, flat + 1)

        slot = flat % 2

        # wait: copies of a row share one DMA semaphore and have identical
        # byte counts, so G waits on it complete exactly the row's G copies
        # regardless of arrival order
        for r in range(R):
            b_ = bi * R + r
            a = aidx_ref[b_]

            def wait_body(j, _, r=r, b_=b_, a=a):
                cid = cand_ref[b_, g * G + j]
                pltpu.make_async_copy(
                    p_hbm.at[a, cid], rows.at[slot, r, j],
                    sems.at[slot, r]).wait()
                return 0

            jax.lax.fori_loop(0, G, wait_body, 0)

        for r in range(R):                    # static (1, G) stores
            mat = rows[slot, r].astype(jnp.float32)       # (G, 8, Tp/8)
            if take_exp:                      # rows hold log-probs; P = exp
                mat = jnp.exp(mat)
            # VPU: broadcast-multiply by this hyp's folded weights and
            # reduce the trailing (8, Tp/8) tile — no MXU, no relayout
            out_ref[r, :] = jnp.sum(mat * w_ref[r][None], axis=(1, 2))

    return kernel, n_groups


@functools.partial(jax.jit, static_argnames=("g", "interpret", "take_exp"))
def psi_gather_dot(cand: jax.Array, audio_idx: jax.Array, p4: jax.Array,
                   w4: jax.Array, g: int = 128,
                   interpret: bool = False, take_exp: bool = False) -> jax.Array:
    """(Bb, K) psi partial sums: out[b, k] = sum_t w[b, t] * P[a_b, c_bk, t].
    p4: (B_audio, V, 8, Tp/8) time-folded posterior (fold_time); stays in
    HBM. w4: (Bb, 8, Tp/8) folded weights (zero beyond T). Candidate blocks
    are DMA'd G at a time per hyp, R=8 hyps per grid step (out block (R, G)
    keeps every store index static), double-buffered across grid steps.
    take_exp=True reads LOG-probs and exponentiates in VMEM — the
    integration shape, which needs no separate probability tensor."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel, n_groups = _psi_gather_kernel(g, take_exp)
    bb, k = cand.shape
    assert bb % R == 0 and k % g == 0 and g % 128 == 0
    t8 = p4.shape[-1]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bb // R, n_groups),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((R, S, t8),
                             lambda bi, gi, cand_ref, aidx_ref: (bi, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (R, g), lambda bi, gi, cand_ref, aidx_ref: (bi, gi)),
            scratch_shapes=[
                pltpu.VMEM((2, R, g, S, t8), p4.dtype),
                pltpu.SemaphoreType.DMA((2, R)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bb, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(cand.astype(jnp.int32), audio_idx.astype(jnp.int32), p4, w4)


def _gather_rows_kernel(cand_ref, aidx_ref, p_hbm, out_hbm, sem):
    """Pure-DMA candidate row gather, HBM->HBM: no vector compute at all,
    so nothing for Mosaic layout inference to trip on. Measures the scalar
    core's DMA descriptor issue rate — the feasibility gate for any
    candidate-restricted psi (Bb*K = 20480 row copies per decode step)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    a = aidx_ref[b]
    k = cand_ref.shape[1]

    def issue(j, _):
        pltpu.make_async_copy(
            p_hbm.at[a, cand_ref[b, j]], out_hbm.at[b, j], sem).start()
        return 0

    jax.lax.fori_loop(0, k, issue, 0)

    def drain(j, _):
        pltpu.make_async_copy(
            p_hbm.at[a, cand_ref[b, j]], out_hbm.at[b, j], sem).wait()
        return 0

    jax.lax.fori_loop(0, k, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(cand: jax.Array, audio_idx: jax.Array, p4: jax.Array,
                interpret: bool = False) -> jax.Array:
    """(Bb, K, S, Tp/S) compacted candidate rows out of the time-folded
    posterior (stays in HBM end to end)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bb, k = cand.shape
    s, t8 = p4.shape[-2:]
    return pl.pallas_call(
        _gather_rows_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((bb, k, s, t8), p4.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(cand.astype(jnp.int32), audio_idx.astype(jnp.int32), p4)


@jax.jit
def psi_compact_einsum(rows, w4):
    """psi partial sums from compacted rows: (Bb,K,S,T8)x(Bb,S,T8)->(Bb,K)."""
    return jnp.einsum("bkst,bst->bk", rows.astype(jnp.float32), w4,
                      preferred_element_type=jnp.float32)


@jax.jit
def psi_xla_gather(cand, audio_idx, p_vt, w):
    """Reference point: the same computation as an XLA row gather."""
    rows = p_vt[audio_idx[:, None], cand]                   # (Bb, K, T)
    return jnp.einsum("bt,bkt->bk", w, rows.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


@jax.jit
def dense_scatter(ids, vals, mask):
    tmp = jnp.full((BB, V - 1), -1e10, jnp.float32)
    tmp = jax.vmap(lambda row, i, x: row.at[i].set(x))(
        tmp, jnp.minimum(ids, V - 2), vals)
    return jnp.where(mask, tmp, -1e10)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    reps = 5 if args.quick else 20

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  envelope: B_audio={B_AUDIO} "
          f"beams={N_BEAMS} T={T} V={V} K={K}", flush=True)

    # synthetic but realistically-shaped state — generated ON DEVICE (a host
    # upload of the 2.5 GB posterior would take minutes over the tunnel).
    # Tensors are built/deleted in phases: holding every layout at once is
    # ~17 GB and OOMs the 16 GB chip (first folded-layout run, r05).
    keys = jax.random.split(jax.random.PRNGKey(0), 4)

    @jax.jit
    def make_state():
        logits = jax.random.normal(keys[0], (B_AUDIO, T, V), jnp.float32) * 2
        logp = jax.nn.log_softmax(logits, axis=-1)
        p_tv32 = jnp.exp(logp)
        r_prev = jax.random.normal(keys[1], (BB, T, 2)) * 2 - 8
        scores = jax.random.normal(keys[2], (BB, V - 1))
        return p_tv32, r_prev, scores

    p_tv32, r_prev, scores = map(jax.block_until_ready, make_state())
    print("state built", flush=True)

    audio_idx = jnp.arange(BB) // N_BEAMS
    decoded_len = jnp.asarray(rng.integers(0, 40, size=(BB,)), jnp.int32)
    last_label = jnp.asarray(rng.integers(0, 1000, size=(BB,)), jnp.int32)

    from ts_asr_whisper_tpu.ops.ctc_prefix import (
        ctc_psi_matmul, kth_largest_keys)

    blank = V - 1

    # ---- 1. baseline matmul
    xl = jax.jit(lambda p: jnp.log(jnp.maximum(
        p[audio_idx, :, last_label], 1e-38)))(p_tv32)
    f32 = jax.jit(lambda p: ctc_psi_matmul(
        p, xl, r_prev, decoded_len, last_label, blank, EOS))
    p_tv16 = jax.block_until_ready(
        jax.jit(lambda x: x.astype(jnp.bfloat16))(p_tv32))
    ms, psi_ref = _timeit(f32, p_tv16, reps=reps)
    print(f"[1] ctc_psi_matmul bf16 posterior : {ms:8.3f} ms")
    ms, _ = _timeit(f32, p_tv32, reps=reps)
    print(f"[1] ctc_psi_matmul fp32 posterior : {ms:8.3f} ms")
    p_tv16.delete()

    # ---- candidate mask (exact top-k membership, as rescore builds it)
    @jax.jit
    def build_mask(scores):
        keys, kth = kth_largest_keys(scores[:, :TS_BEGIN], 500)
        topk = keys >= kth[:, None]
        mask = jnp.zeros((BB, V - 1), bool)
        mask = mask.at[:, :TS_BEGIN].set(topk)
        return mask.at[:, EOS].set(True)

    ms, mask = _timeit(build_mask, scores, reps=reps)
    print(f"[-] membership mask (existing)    : {ms:8.3f} ms")

    # ---- 2. extraction
    ms, ids_a = _timeit(extract_binsearch, mask, reps=reps)
    print(f"[2a] extract binsearch            : {ms:8.3f} ms")
    ms, ids_b = _timeit(extract_twolevel, mask, reps=reps)
    print(f"[2b] extract two-level            : {ms:8.3f} ms")
    ia, ib = np.asarray(ids_a), np.asarray(ids_b)
    assert (ia == ib).all(), "extraction variants disagree"
    # verify against numpy
    mnp = np.asarray(mask)
    for b in range(0, BB, 7):
        want = np.flatnonzero(mnp[b])
        got = ia[b][: len(want)]
        assert (got == want).all(), b
    print("    extraction verified vs numpy")

    # ---- 4. dense scatter (measured early — always runs)
    w = jnp.abs(jnp.asarray(rng.standard_normal((BB, T)), jnp.float32))
    ids = jnp.minimum(ids_a, V - 2)
    vals0 = jnp.asarray(rng.standard_normal((BB, K)), jnp.float32)
    ms, _ = _timeit(dense_scatter, ids, vals0, mask, reps=reps)
    print(f"[4] dense scatter (Bb,K)->(Bb,V)  : {ms:8.3f} ms")

    # ---- 6. int8 posterior matmul (approximate alternative): per-frame
    # scale, int8 read halves the bf16 posterior's HBM traffic IF XLA fuses
    # the int8->bf16 convert into the matmul read (else it materializes)
    @jax.jit
    def quant_int8(p):
        scale = jnp.max(p, axis=-1, keepdims=True) / 127.0    # (B, T, 1)
        q = jnp.round(p / jnp.maximum(scale, 1e-30)).astype(jnp.int8)
        return q, scale[..., 0]

    p_q, p_scale = map(jax.block_until_ready, quant_int8(p_tv32))

    @jax.jit
    def psi_int8(q, scale, w):
        wn = w.reshape(B_AUDIO, N_BEAMS, T) * scale[:, None, :]
        return jnp.einsum("bnt,btv->bnv", wn.astype(jnp.bfloat16),
                          q.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    ms, _ = _timeit(psi_int8, p_q, p_scale, w, reps=reps)
    print(f"[6] int8 posterior einsum (XLA)   : {ms:8.3f} ms")
    p_q.delete(), p_scale.delete()

    # ---- 3. Pallas gather+dot kernel (time-folded posterior layout)
    p_vt32 = jax.block_until_ready(
        jax.jit(lambda p: jnp.swapaxes(p, 1, 2))(p_tv32))
    p_tv32.delete()
    fold32 = jax.jit(lambda p: fold_time(p, 0.0))
    fold16 = jax.jit(lambda p: fold_time(p, 0.0).astype(jnp.bfloat16))
    foldlog = jax.jit(lambda p: fold_time(
        jnp.log(jnp.maximum(p, 1e-38)), LOG_FLOOR))
    p4_32 = jax.block_until_ready(fold32(p_vt32))
    p4_16 = jax.block_until_ready(fold16(p_vt32))
    logp4 = jax.block_until_ready(foldlog(p_vt32))
    tp = p4_32.shape[2] * p4_32.shape[3]
    w4 = jax.jit(lambda w: jnp.pad(w, ((0, 0), (0, tp - T)))
                 .reshape(BB, S, tp // S))(w)

    for g, name, p in ((128, "bf16", p4_16), (256, "bf16", p4_16),
                       (128, "fp32", p4_32)):
        try:
            ms, out_k = _timeit(
                lambda c, a, pp, ww: psi_gather_dot(c, a, pp, ww, g=g),
                ids, audio_idx, p, w4, reps=reps)
            gb = BB * K * tp * p.dtype.itemsize / 1e9
            print(f"[3] pallas gather+dot G={g:<3} {name}: {ms:8.3f} ms "
                  f"({gb / (ms / 1e3):6.1f} GB/s effective)")
        except Exception as e:
            print(f"[3] pallas gather+dot G={g:<3} {name}: FAILED "
                  f"{type(e).__name__}: {str(e)[:250]}")
            continue
    # exp-fused variant: gather LOG-probs (state.logp_vt already exists in
    # the rescorer — no second posterior tensor at all)
    for g in (128, 256):
        try:
            ms, _ = _timeit(
                lambda c, a, pp, ww: psi_gather_dot(c, a, pp, ww, g=g,
                                                    take_exp=True),
                ids, audio_idx, logp4, w4, reps=reps)
            gb = BB * K * tp * 4 / 1e9
            print(f"[3e] pallas gather+exp+dot G={g:<3} fp32logp: {ms:8.3f} ms "
                  f"({gb / (ms / 1e3):6.1f} GB/s effective)")
        except Exception as e:
            print(f"[3e] pallas gather+exp+dot G={g:<3}: FAILED "
                  f"{type(e).__name__}: {str(e)[:250]}")

    # ---- 3b. pure-DMA gather to a compact tensor + XLA einsum
    for name, p in (("bf16", p4_16), ("fp32", p4_32)):
        try:
            ms_g, rows_out = _timeit(gather_rows, ids, audio_idx, p,
                                     reps=reps)
            gb = BB * K * tp * p.dtype.itemsize / 1e9
            print(f"[3b] pure-DMA gather {name}       : {ms_g:8.3f} ms "
                  f"({gb / (ms_g / 1e3):6.1f} GB/s, "
                  f"{BB * K / (ms_g * 1e3):5.1f} rows/us)")
            ms_e, _ = _timeit(psi_compact_einsum, rows_out, w4, reps=reps)
            print(f"[3b] compact einsum {name}        : {ms_e:8.3f} ms "
                  f"(gather+einsum total {ms_g + ms_e:6.3f} ms)")
            if name == "fp32":
                ref_c = psi_xla_gather(ids, audio_idx, p_vt32, w)
                got_c = psi_compact_einsum(rows_out, w4)
                err_c = float(jnp.max(jnp.abs(ref_c - got_c)
                                      / (jnp.abs(ref_c) + 1e-9)))
                print(f"    compact path vs XLA gather max rel err: {err_c:.2e}")
            rows_out.delete()
        except Exception as e:
            print(f"[3b] pure-DMA gather {name}: FAILED "
                  f"{type(e).__name__}: {str(e)[:250]}")

    # numeric check vs XLA formulation
    try:
        ref = psi_xla_gather(ids, audio_idx, p_vt32, w)
        got = psi_gather_dot(ids, audio_idx, p4_32, w4, g=128)
        err = float(jnp.max(jnp.abs(ref - got) / (jnp.abs(ref) + 1e-9)))
        print(f"    kernel vs XLA gather max rel err: {err:.2e}")
        got_e = psi_gather_dot(ids, audio_idx, logp4, w4, g=128,
                               take_exp=True)
        err_e = float(jnp.max(jnp.abs(ref - got_e) / (jnp.abs(ref) + 1e-9)))
        print(f"    exp-fused vs XLA gather max rel err: {err_e:.2e}")
    except Exception as e:
        print(f"    fused-kernel numeric check skipped: {type(e).__name__}")

    # ---- 5. XLA gather reference point (free the folded layouts first —
    # +1.25 GB for the bf16 vocab-major copy)
    p4_16.delete(), logp4.delete()
    p_vt16 = jax.block_until_ready(
        jax.jit(lambda p: p.astype(jnp.bfloat16))(p_vt32))
    ms, _ = _timeit(psi_xla_gather, ids, audio_idx, p_vt16, w, reps=reps)
    print(f"[5] XLA gather+einsum bf16        : {ms:8.3f} ms")


if __name__ == "__main__":
    main()
