"""Pallas attention kernel for the encoder self-attention hot path.

Replaces the reference's FlashAttention-2 CUDA dependency
(/root/reference/models/containers.py:26, configs/base.yaml:51) with a
TPU-native kernel. At Whisper's fixed 1500-frame encoder length the whole
K/V for one (batch, head) fits VMEM, so the kernel is a block-Q attention:
scores never touch HBM (XLA's unfused path writes the (B,H,1500,1500) score
tensor to HBM twice), softmax runs in fp32 on the VPU, both matmuls hit the
MXU.

custom_vjp with a fused Pallas BACKWARD on TPU as well: per q-block the
kernel recomputes scores/probs in VMEM and emits dq plus dk/dv accumulated
across q-blocks — none of the (B,H,T,T)-shaped intermediates ever reach HBM
(the XLA fallback backward streams them per scan step; measured 16.9 ms vs
4.6 ms per turbo encoder layer at batch 8).

Enable via ``set_attention_impl('pallas')`` BEFORE the first trace of model
functions: the implementation choice is read at trace time and is not part
of jit cache keys, so flipping it later requires new function objects (set
it once at startup — models/containers.py wires ``model.attention_impl``).
The decoder's masked attention keeps the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_IMPL = "xla"  # 'xla' | 'pallas'
_SCORE_DTYPE = jnp.float32  # accumulation/materialization dtype for scores


def set_attention_impl(impl: str) -> None:
    global _IMPL
    assert impl in ("xla", "pallas", "xla_bf16"), impl
    global _SCORE_DTYPE
    if impl == "xla_bf16":
        # halve the HBM traffic of the (B,H,T,T) score tensor — the encoder
        # hot spot at T=1500 — at the cost of bf16 attention logits
        _SCORE_DTYPE = jnp.bfloat16
        impl = "xla"
    else:
        _SCORE_DTYPE = jnp.float32
    _IMPL = impl


def get_attention_impl() -> str:
    return _IMPL


def _xla_sdpa(q, k, v):
    scores = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int):
    """One (batch*head, q-block): full-K attention in VMEM."""
    q = q_ref[0]                      # (BQ, D)
    k = k_ref[0]                      # (T_pad, D)
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BQ, T_pad)
    t_pad = scores.shape[-1]
    if t_pad != t_real:  # mask the padded keys (static at trace time)
        key_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(key_idx < t_real, scores,
                           jnp.finfo(jnp.float32).min)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _flash_mha_fwd(q, k, v, block_q: int = 256, interpret: bool = False):
    """(B, H, T, hd) -> (B, H, T, hd); q pre-scaled, no mask (encoder)."""
    from jax.experimental import pallas as pl

    b, h, t, d = q.shape
    bh = b * h
    # NO host-side padding: Pallas pads partial boundary blocks in VMEM and
    # drops out-of-bounds output rows. The flat_pad/slice version moved
    # 4x(B,H,T,hd) extra HBM traffic per call — measured 1.6 ms/layer-call
    # slower at (16,20,1500,64), bit-identical results.
    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)
    grid = (bh, -(-t // block_q))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, t_real=t),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, t, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, t, d), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     *, t_real: int):
    """One (batch*head, q-block): recompute attention for the block in VMEM
    and emit dq for the block + accumulate dk/dv across q-blocks (the q-block
    axis is the LAST grid dim, so the dk/dv output blocks stay resident)."""
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    q = q_ref[0]                       # (BQ, D)
    k = k_ref[0]                       # (T_pad, D)
    v = v_ref[0]
    g = g_ref[0]                       # (BQ, D) cotangent (0 on padded rows)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (BQ, T_pad)
    t_pad = scores.shape[-1]
    if t_pad != t_real:
        key_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(key_idx < t_real, scores,
                           jnp.finfo(jnp.float32).min)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)         # (BQ, T_pad) fp32
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (BQ, T_pad)
    dsoft = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    # out-of-bounds q rows of a partial boundary block carry garbage (their
    # dq rows are dropped on write, but they MUST NOT leak into the dk/dv
    # accumulation) — select, not multiply: garbage may be NaN
    block_q = scores.shape[0]
    q_pos = i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0)
    row_ok = q_pos < t_real
    dsoft = jnp.where(row_ok, dsoft, 0.0)
    p = jnp.where(row_ok, p, 0.0)
    # the dk/dv dots contract over q rows: the masked rows' zeros meet the
    # out-of-bounds q/g values (NaN in interpret mode) — 0*NaN = NaN, so
    # the operands must be masked as well, not just the coefficients
    q = jnp.where(row_ok, q, 0.0)
    g = jnp.where(row_ok, g, 0.0)
    ds_lo = dsoft.astype(q.dtype)
    p_lo = p.astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds_lo, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_i = jax.lax.dot_general(
        ds_lo, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (T_pad, D)
    dv_i = jax.lax.dot_general(
        p_lo, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dk_ref[0] = dk_i
        dv_ref[0] = dv_i

    @pl.when(i > 0)
    def _():
        dk_ref[0] += dk_i
        dv_ref[0] += dv_i


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _flash_mha_bwd_pallas(q, k, v, g, block_q: int = 256,
                          interpret: bool = False):
    """Fused flash backward: scores/probs/dsoft never leave VMEM. The XLA
    blocked backward below streams ~(B*H*block_q*T) fp32 intermediates
    through HBM per scan step — measured 16.9 ms/layer vs 3.0 ms fwd at
    batch 8 on v5e (540 ms of a 1603 ms turbo train step)."""
    from jax.experimental import pallas as pl

    b, h, t, d = q.shape
    bh = b * h
    # no host-side padding (see _flash_mha_fwd); partial-block q rows are
    # masked inside the kernel before the dk/dv accumulation
    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)
    gf = g.reshape(bh, t, d)
    grid = (bh, -(-t // block_q))
    kv_spec = pl.BlockSpec((1, t, d), lambda b_, i: (b_, 0, 0))
    blk_spec = pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, t_real=t),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, t, d), jnp.float32),
        ),
        grid=grid,
        in_specs=[blk_spec, kv_spec, kv_spec, blk_spec],
        out_specs=(blk_spec, kv_spec, kv_spec),
        interpret=interpret,
    )(qf, kf, vf, gf)

    def unshape(x, dtype):
        return x.reshape(b, h, t, d).astype(dtype)

    return unshape(dq, q.dtype), unshape(dk, k.dtype), unshape(dv, v.dtype)


@jax.custom_vjp
def flash_mha(q, k, v):
    return _flash_mha_fwd(q, k, v)


def _fwd(q, k, v):
    return _flash_mha_fwd(q, k, v), (q, k, v)


def _bwd(res, g, block_q: int = 256):
    q, k, v = res
    if jax.default_backend() == "tpu":
        return _flash_mha_bwd_pallas(q, k, v, g, block_q=block_q)
    return _bwd_xla(res, g, block_q=block_q)


def _bwd_xla(res, g, block_q: int = 256):
    """Flash-style blocked backward in XLA: recompute attention per q-block
    inside a scan so the full (B, H, T, T) fp32 score tensor is NEVER
    materialized (that transient is what OOMs large-batch training)."""
    q, k, v = res
    b, h, t, d = q.shape
    t_pad = -(-t // block_q) * block_q
    n_blocks = t_pad // block_q

    def pad_q(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))) \
            if t_pad != t else x

    qp, gp = pad_q(q), pad_q(g)
    # (n_blocks, B, H, block_q, d)
    q_blocks = jnp.moveaxis(
        qp.reshape(b, h, n_blocks, block_q, d), 2, 0)
    g_blocks = jnp.moveaxis(
        gp.reshape(b, h, n_blocks, block_q, d), 2, 0)
    # padded q rows carry zero cotangents, so their dsoft/dv terms vanish

    def step(carry, xs):
        dk_acc, dv_acc = carry
        qi, gi = xs
        scores = jnp.einsum("bhqd,bhkd->bhqk", qi, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(scores, axis=-1)
        dp = jnp.einsum("bhqd,bhkd->bhqk", gi, v).astype(jnp.float32)
        dsoft = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))) \
            .astype(q.dtype)
        pq = p.astype(q.dtype)
        dq_i = jnp.einsum("bhqk,bhkd->bhqd", dsoft, k)
        dk_acc = dk_acc + jnp.einsum("bhqk,bhqd->bhkd", dsoft, qi)
        dv_acc = dv_acc + jnp.einsum("bhqk,bhqd->bhkd", pq, gi)
        return (dk_acc, dv_acc), dq_i

    zeros = jnp.zeros_like(k, dtype=jnp.float32)
    (dk, dv), dq_blocks = jax.lax.scan(step, (zeros, zeros),
                                       (q_blocks, g_blocks))
    dq = jnp.moveaxis(dq_blocks, 0, 2).reshape(b, h, t_pad, d)[:, :, :t]
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


flash_mha.defvjp(_fwd, _bwd)


def sdpa(q, k, v, mask=None):
    """Dispatching scaled-dot-product attention core (q pre-scaled)."""
    if (mask is None and _IMPL == "pallas" and q.ndim >= 4
            and q.shape[-2] == k.shape[-2] and q.shape[-2] >= 256):
        # Pallas kernel only for long unmasked self-attention (the encoder);
        # decoder cross-attention (q_len != kv_len, tiny q) stays on XLA.
        # Extra leading dims (SE-DiCoW's (B, S, H, T, hd) streams) flatten
        # into the kernel's batch axis.
        if q.ndim > 4:
            lead = q.shape[:-3]
            flat = lambda x: x.reshape(-1, *x.shape[-3:])  # noqa: E731
            out = flash_mha(flat(q), flat(k), flat(v))
            return out.reshape(*lead, *out.shape[-3:])
        return flash_mha(q, k, v)
    scores = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=_SCORE_DTYPE)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min
                           if scores.dtype == jnp.float32 else -1e30)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v)
