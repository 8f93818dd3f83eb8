"""Whisper encoder/decoder core — pure-functional JAX, TPU-first.

Design (not a port of HF/torch modeling):
- parameters are nested dicts of jnp arrays with HF-compatible leaf names,
  but per-layer weights are STACKED on a leading layer axis and the layer
  stack runs under ``lax.scan`` — one compiled layer body regardless of depth
  (32-layer turbo compiles as fast as tiny), remat-friendly;
- all ops are written over '...td' leading batch dims so the same layer code
  serves (B, T, D) training batches and (B, S, T, D) SE-DiCoW dual streams;
- fp32 parameters, configurable bf16 compute; softmax and layer norms in fp32;
- decode path is explicit: ``decoder_prefill`` builds a static-shape KV cache,
  ``decoder_step`` advances it functionally (jit/while_loop friendly).

Numerics match HF ``WhisperEncoder``/``WhisperDecoder`` (eager) at fp32:
q-scaling by head_dim**-0.5, pre-LN blocks, erf GELU, learned positions.
Reference behaviors mirrored from /root/reference/src/models/dicow/encoder.py
and transformers' modeling_whisper.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np

from .config import DiCoWConfig

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def linear(p: Params, x: jax.Array, dtype=None) -> jax.Array:
    kernel = p["kernel"]
    if dtype is not None:
        kernel = kernel.astype(dtype)
        x = x.astype(dtype)
    y = x @ kernel
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    # (..., T, D) -> (..., H, T, hd)
    *lead, t, d = x.shape
    x = x.reshape(*lead, t, num_heads, d // num_heads)
    return jnp.swapaxes(x, -3, -2)


def _merge_heads(x: jax.Array) -> jax.Array:
    # (..., H, T, hd) -> (..., T, D)
    x = jnp.swapaxes(x, -3, -2)
    *lead, t, h, hd = x.shape
    return x.reshape(*lead, t, h * hd)


def multi_head_attention(
    p: Params,
    x_q: jax.Array,
    x_kv: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    dtype=None,
) -> jax.Array:
    """Standard MHA matching HF WhisperAttention numerics.

    mask: broadcastable to (..., H, Tq, Tk), True = attend.
    """
    head_dim = x_q.shape[-1] // num_heads
    scaling = head_dim ** -0.5
    q = linear(p["q_proj"], x_q, dtype) * scaling
    k = linear(p["k_proj"], x_kv, dtype)
    v = linear(p["v_proj"], x_kv, dtype)
    q, k, v = (_split_heads(t, num_heads) for t in (q, k, v))
    out = sdpa(q, k, v, mask)
    # named for the 'attn' remat policy: saving this one tensor lets the
    # backward replay skip the flash-attention forward (its custom_vjp
    # needs only q/k/v — cheap projections — and recomputes scores inside
    # the fused backward kernel anyway)
    out = jax.ad_checkpoint.checkpoint_name(out, "attn_out")
    return linear(p["out_proj"], _merge_heads(out), dtype)


# attention core lives in ops.attention (XLA path + optional Pallas flash
# kernel for unmasked 4-D attention, selected via set_attention_impl)
from ..ops.attention import sdpa  # noqa: E402


def mlp_block(p: Params, x: jax.Array, dtype=None) -> jax.Array:
    return linear(p["fc2"], gelu(linear(p["fc1"], x, dtype)), dtype)


# ---------------------------------------------------------------------------
# transformer layers (scan bodies)
# ---------------------------------------------------------------------------


def encoder_layer(p: Params, x: jax.Array, num_heads: int, dtype=None) -> jax.Array:
    res = x
    h = layer_norm(p["self_attn_layer_norm"], x)
    h = multi_head_attention(p["self_attn"], h, h, num_heads, dtype=dtype)
    x = res + h
    res = x
    h = layer_norm(p["final_layer_norm"], x)
    h = mlp_block(p, h, dtype)
    return res + h


def decoder_layer(
    p: Params,
    x: jax.Array,
    enc: jax.Array,
    num_heads: int,
    self_mask: Optional[jax.Array],
    dtype=None,
) -> jax.Array:
    res = x
    h = layer_norm(p["self_attn_layer_norm"], x)
    h = multi_head_attention(p["self_attn"], h, h, num_heads, mask=self_mask, dtype=dtype)
    x = res + h
    res = x
    h = layer_norm(p["encoder_attn_layer_norm"], x)
    h = multi_head_attention(p["encoder_attn"], h, enc, num_heads, dtype=dtype)
    x = res + h
    res = x
    h = layer_norm(p["final_layer_norm"], x)
    h = mlp_block(p, h, dtype)
    return res + h


_REMAT_POLICY = None  # None = recompute everything inside each layer


def set_remat_policy(name: str) -> None:
    """'full' (default) recomputes the whole layer in the backward pass —
    minimum memory; 'dots' saves matmul outputs
    (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — trades HBM
    for less recompute. Measured on v5e (turbo fine-tune, batch 8): 'full'
    1764 ms/step vs 'dots' 2199 ms/step — this model is HBM-bound, so extra
    residual traffic loses. 'attn' saves ONLY the per-layer attention
    outputs (the 'attn_out' checkpoint_name, ~1 GB bf16 at turbo batch 8):
    the backward replay then skips the flash-attention forward while
    everything else still recomputes — the targeted middle ground between
    'full' and 'dots'. Read at trace time (set before building train
    steps, like ops.attention.set_attention_impl)."""
    global _REMAT_POLICY
    assert name in ("full", "dots", "attn"), name
    _REMAT_POLICY = {
        "full": None,
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "attn": jax.checkpoint_policies.save_only_these_names("attn_out"),
    }[name]


def scan_layers(layer_fn, stacked: Params, x: jax.Array, remat: bool = False):
    """Run x through a stack of layers whose params carry a leading layer
    axis, via lax.scan (single traced body)."""
    body = layer_fn
    if remat:
        body = jax.checkpoint(layer_fn, policy=_REMAT_POLICY)

    def step(h, layer_params):
        return body(layer_params, h), None

    out, _ = jax.lax.scan(step, x, stacked)
    return out


# ---------------------------------------------------------------------------
# conv stem
# ---------------------------------------------------------------------------


def conv1d(p: Params, x: jax.Array, stride: int = 1, dtype=None) -> jax.Array:
    """x: (B, T, C_in); kernel: (k, C_in, C_out); SAME-1 padding (pad=1, k=3).

    No preferred_element_type: the TPU MXU accumulates conv in fp32
    internally anyway, and a widened output dtype breaks the conv transpose
    rule under grad when operands are bf16."""
    kernel = p["kernel"]
    if dtype is not None:
        kernel = kernel.astype(dtype)
        x = x.astype(dtype)
    else:
        x = x.astype(kernel.dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def encoder_stem(params: Params, input_features: jax.Array, dtype=None) -> jax.Array:
    """(B, n_mels, 3000) -> (B, 1500, D): conv1 + gelu, conv2(stride2) + gelu."""
    x = jnp.swapaxes(input_features, -1, -2)  # (B, T, n_mels)
    x = gelu(conv1d(params["conv1"], x, stride=1, dtype=dtype))
    x = gelu(conv1d(params["conv2"], x, stride=2, dtype=dtype))
    return x


# ---------------------------------------------------------------------------
# plain whisper encoder / decoder forwards
# ---------------------------------------------------------------------------


def encoder_forward(params: Params, cfg: DiCoWConfig, input_features: jax.Array,
                    remat: bool = False) -> jax.Array:
    """Vanilla Whisper encoder (no DiCoW conditioning) — used for tests and
    as the base of the DiCoW encoder in dicow.py."""
    dtype = cfg.compute_dtype
    x = encoder_stem(params, input_features, dtype)
    x = x + params["embed_positions"].astype(x.dtype)[None, : x.shape[-2]]
    layer_fn = partial(_enc_layer_body, num_heads=cfg.encoder_attention_heads,
                       dtype=dtype)
    x = scan_layers(layer_fn, params["layers"], x, remat=remat)
    return layer_norm(params["layer_norm"], x)


def _enc_layer_body(p, h, num_heads, dtype):
    return encoder_layer(p, h, num_heads, dtype)


def causal_mask(t: int) -> jax.Array:
    return jnp.tril(jnp.ones((t, t), dtype=bool))


def decoder_forward(params: Params, cfg: DiCoWConfig, input_ids: jax.Array,
                    encoder_hidden: jax.Array, remat: bool = False,
                    position_offset: int = 0) -> jax.Array:
    """Teacher-forced decoder: (B, T) tokens -> (B, T, D) final hidden."""
    dtype = cfg.compute_dtype
    tok = params["embed_tokens"][input_ids].astype(dtype)
    t = input_ids.shape[-1]
    pos = params["embed_positions"][position_offset : position_offset + t]
    x = tok + pos.astype(dtype)
    mask = causal_mask(t)

    def body(p, h):
        return decoder_layer(p, h, encoder_hidden.astype(dtype),
                             cfg.decoder_attention_heads, mask, dtype)

    x = scan_layers(body, params["layers"], x, remat=remat)
    return layer_norm(params["layer_norm"], x)


def lm_logits(params: Params, hidden: jax.Array) -> jax.Array:
    """proj_out tied to embed_tokens (reference: train.py:111)."""
    w = params["embed_tokens"].astype(hidden.dtype)
    return jnp.einsum("...d,vd->...v", hidden, w,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# KV-cached decode
# ---------------------------------------------------------------------------


def precompute_cross_kv(params: Params, cfg: DiCoWConfig,
                        encoder_hidden: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Cross-attention K/V for all layers at once: (L, B, H, T_enc, hd).

    Computed once per utterance; the decode loop then never touches the
    encoder states again (HBM-bandwidth win over re-projecting each step).
    """
    h = cfg.decoder_attention_heads
    dtype = cfg.compute_dtype
    enc = encoder_hidden.astype(dtype)

    def per_layer(lp):
        k = _split_heads(linear(lp["encoder_attn"]["k_proj"], enc, dtype), h)
        v = _split_heads(linear(lp["encoder_attn"]["v_proj"], enc, dtype), h)
        return k, v

    return jax.lax.map(per_layer, params["layers"])


def quantize_cross_kv(
    cross_kv: Tuple[jax.Array, jax.Array],
) -> Dict[str, jax.Array]:
    """Symmetric per-row int8 quantization of the cross-attention cache.

    The cross K/V cache is the dominant HBM read of every decode step
    (large-v3-turbo: ~1 GB/step at batch 16 in bf16); storing it int8 with a
    per-(layer, batch, head, position) float scale halves that traffic. The
    scales are folded into the attention math (scores *= k_scale row-wise,
    probs *= v_scale row-wise) so the dequantized bf16 tensor is never
    materialized in HBM. Opt-in via GenerationConfig.cross_kv_quant — lossy
    (~0.4% relative error per row), so parity paths keep the exact cache.
    """
    def quant(x):
        xf = x.astype(jnp.float32)
        scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-8)
        q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
        return q, scale

    k, v = cross_kv
    k_q, k_scale = quant(k)
    v_q, v_scale = quant(v)
    return {"k_q": k_q, "k_scale": k_scale, "v_q": v_q, "v_scale": v_scale}


def _cross_attention(q: jax.Array, cross, dtype) -> jax.Array:
    """Cross-attention core: exact (k, v) tuple or int8 dict from
    quantize_cross_kv. q is pre-scaled; shapes (B, H, T_q, hd).

    Beam sharing: when q's batch is a multiple n of the cache's batch
    (beam search — n hypotheses per audio row), the n beams fold into the
    query-position axis instead of repeating K/V per beam. Same math
    (cross-attention has no position mask), but the dominant decode-step
    HBM read — the cross K/V cache — shrinks n-fold, and the per-head
    matmul grows from (1, T) to (n, T), which the MXU prefers."""
    cache_b = (cross["k_q"] if isinstance(cross, dict) else cross[0]).shape[0]
    bq = q.shape[0]
    if bq != cache_b:
        n = bq // cache_b
        _, h, tq, hd = q.shape
        qf = q.reshape(cache_b, n, h, tq, hd)
        qf = jnp.moveaxis(qf, 1, 2).reshape(cache_b, h, n * tq, hd)
        out = _cross_attention(qf, cross, dtype)
        out = jnp.moveaxis(out.reshape(cache_b, h, n, tq, hd), 2, 1)
        return out.reshape(bq, h, tq, hd)
    if isinstance(cross, dict):
        kd = cross["k_q"].astype(dtype)
        scores = jnp.einsum("bhqd,bhtd->bhqt", q, kd,
                            preferred_element_type=jnp.float32)
        scores = scores * cross["k_scale"][..., 0][:, :, None, :]
        probs = jax.nn.softmax(scores, axis=-1)
        pv = probs * cross["v_scale"][..., 0][:, :, None, :]
        return jnp.einsum("bhqt,bhtd->bhqd", pv.astype(dtype),
                          cross["v_q"].astype(dtype))
    ck, cv = cross
    return sdpa(q, ck, cv)


# Self-attention KV cache layout. 'bhtd' (L, B, H, T, hd) is the default:
# measured on v5e beam-5 batch-8 it beats 'tbhd' (L, T, B, H, hd) 135x vs
# 118x end-to-end — the tbhd Pallas reorder block (1, T, 1, H, hd) DMAs a
# B-strided slab at 2.3x the cost of bhtd's contiguous (1, 1, H, T, hd)
# block, and the hoped-for elimination of XLA's carry layout copies did not
# materialize (the copies persist in either layout). 'tbhd' is kept as an
# A/B switch for future layout work.
_KV_LAYOUT = "bhtd"


def set_kv_cache_layout(name: str) -> None:
    global _KV_LAYOUT
    assert name in ("tbhd", "bhtd", "thbd"), name
    _KV_LAYOUT = name


def get_kv_cache_layout() -> str:
    return _KV_LAYOUT


def init_kv_cache(cfg: DiCoWConfig, batch: int, max_len: int) -> Dict[str, jax.Array]:
    head_dim = cfg.d_model // cfg.decoder_attention_heads
    heads = cfg.decoder_attention_heads
    if _KV_LAYOUT == "tbhd":
        shape = (cfg.decoder_layers, max_len, batch, heads, head_dim)
    elif _KV_LAYOUT == "thbd":
        # matches the physical layout XLA picks for the decode scan carry
        # ({4,1,2,3,0} over the bhtd logical shape), so making it the
        # logical shape lets the beam reorder run without layout copies
        shape = (cfg.decoder_layers, max_len, heads, batch, head_dim)
    else:
        shape = (cfg.decoder_layers, batch, heads, max_len, head_dim)
    dtype = cfg.compute_dtype
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def decoder_cached(
    params: Params,
    cfg: DiCoWConfig,
    input_ids: jax.Array,          # (B, T_new)
    pos_offset: jax.Array,          # scalar int — tokens already in cache
    kv_cache: Dict[str, jax.Array],
    cross_kv,  # (k, v) tuple or int8 dict from quantize_cross_kv
    beam_src: jax.Array = None,    # (B,) optional source-row permutation
    alignment_slots: jax.Array = None,  # (L, S, H) one-hot head selection
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Run T_new tokens through the decoder with a static-size KV cache.

    With ``alignment_slots`` (token-timestamp collection), an extra value is
    returned: cross-attention probabilities (B, S, T_new, T_enc) for the S
    selected (layer, head) alignment pairs — slot s of layer l is the
    one-hot row alignment_slots[l, s] (all-zero when the slot belongs to a
    different layer). Used by decoding/token_timestamps.py's DTW extraction
    (HF Whisper semantics; the reference inherits them,
    reference generation.py:427-436,473-475,526-527).

    Used both for prefill (T_new = prompt length, pos_offset = 0) and for
    single-token steps (T_new = 1). Returns (final hidden (B, T_new, D),
    updated cache). Attention sees cache positions < pos_offset + T_new via
    a position mask, so the cache can be preallocated at max_len.

    ``beam_src`` fuses beam-search cache reordering into the step: row b's
    attention history is read from cache row ``beam_src[b]`` and the
    updated cache is written at row b — the previous step's hypothesis
    permutation is applied lazily during this step's cache pass instead of
    as a separate full-cache permute kernel (see ops/reorder.py 'fused').
    This halves the cache HBM traffic of a beam step (no standalone
    read+write pass) and removes the XLA layout-conversion copies the
    standalone kernel forced around the scan carry.
    """
    dtype = cfg.compute_dtype
    b, t_new = input_ids.shape
    layout = _KV_LAYOUT
    tbhd = layout == "tbhd"
    thbd = layout == "thbd"
    t_major = tbhd or thbd
    max_len = kv_cache["k"].shape[1] if t_major else kv_cache["k"].shape[-2]
    num_heads = cfg.decoder_attention_heads

    tok = params["embed_tokens"][input_ids].astype(dtype)
    pos_ids = pos_offset + jnp.arange(t_new)
    x = tok + params["embed_positions"][pos_ids].astype(dtype)

    # mask over cache keys: key j visible to query i iff j <= pos_offset + i
    key_pos = jnp.arange(max_len)
    q_pos = pos_offset + jnp.arange(t_new)
    self_mask = key_pos[None, :] <= q_pos[:, None]   # (T_new, max_len)

    def step(h, xs):
        if alignment_slots is not None:
            lp, cross, cache_k, cache_v, sel = xs
        else:
            lp, cross, cache_k, cache_v = xs
        if beam_src is not None:
            if beam_src.ndim == 2:
                # one-hot (Bb_out, Bb_src): permute as an MXU matmul, which
                # XLA schedules in the carry's native layout (no gather op)
                eq = {"tbhd": "ob,tbhd->tohd", "thbd": "ob,thbd->thod",
                      "bhtd": "ob,bhtd->ohtd"}[layout]
                oh = beam_src.astype(cache_k.dtype)
                cache_k = jnp.einsum(eq, oh, cache_k)
                cache_v = jnp.einsum(eq, oh, cache_v)
            elif tbhd:
                cache_k = cache_k[:, beam_src]
                cache_v = cache_v[:, beam_src]
            elif thbd:
                cache_k = cache_k[:, :, beam_src]
                cache_v = cache_v[:, :, beam_src]
            else:
                cache_k = cache_k[beam_src]
                cache_v = cache_v[beam_src]
        res = h
        z = layer_norm(lp["self_attn_layer_norm"], h)
        head_dim = cfg.d_model // num_heads
        q = linear(lp["self_attn"]["q_proj"], z, dtype) * head_dim ** -0.5
        k_new = linear(lp["self_attn"]["k_proj"], z, dtype)
        v_new = linear(lp["self_attn"]["v_proj"], z, dtype)
        q, k_new, v_new = (_split_heads(t, num_heads) for t in (q, k_new, v_new))
        if t_major:
            # cache per layer: (T, B, H, hd) or (T, H, B, hd); the
            # new-token slab transposes so the update is a single linear
            # write at row `pos_offset` in the default layout
            if thbd:
                to_t = lambda x: jnp.transpose(x, (2, 1, 0, 3))  # noqa: E731
                eq_qk, eq_pv = "bhqd,thbd->bhqt", "bhqt,thbd->bhqd"
            else:
                to_t = lambda x: jnp.moveaxis(x, 2, 0)  # noqa: E731
                eq_qk, eq_pv = "bhqd,tbhd->bhqt", "bhqt,tbhd->bhqd"
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, to_t(k_new), (pos_offset, 0, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, to_t(v_new), (pos_offset, 0, 0, 0))
            scores = jnp.einsum(eq_qk, q, cache_k,
                                preferred_element_type=jnp.float32)
            scores = jnp.where(self_mask[None, None], scores,
                               jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
            attn = jnp.einsum(eq_pv, probs, cache_v)
        else:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k_new, (0, 0, pos_offset, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v_new, (0, 0, pos_offset, 0))
            attn = sdpa(q, cache_k, cache_v, self_mask[None, None])
        h = res + linear(lp["self_attn"]["out_proj"], _merge_heads(attn), dtype)

        res = h
        z = layer_norm(lp["encoder_attn_layer_norm"], h)
        q = linear(lp["encoder_attn"]["q_proj"], z, dtype) * head_dim ** -0.5
        q = _split_heads(q, num_heads)
        attn = _cross_attention(q, cross, dtype)
        h = res + linear(lp["encoder_attn"]["out_proj"], _merge_heads(attn), dtype)

        res = h
        z = layer_norm(lp["final_layer_norm"], h)
        h = res + mlp_block(lp, z, dtype)
        if alignment_slots is None:
            return h, (cache_k, cache_v)
        # token-timestamp support: emit this layer's cross-attention
        # probabilities for its alignment heads (HF Whisper DTW semantics —
        # the reference inherits _extract_token_timestamps and carries the
        # result through segment retrieval, reference generation.py:427-436).
        # sel: (S, H) rows are one-hot at the head for slots owned by this
        # layer and all-zero otherwise, so the post-softmax selection
        # contributes 0 for foreign slots and the cross-layer sum keeps
        # exactly the owner layer's probabilities.
        scores_c = jnp.einsum("bhqd,bhtd->bhqt", q, cross[0],
                              preferred_element_type=jnp.float32)
        probs_c = jax.nn.softmax(scores_c, axis=-1)
        sel_probs = jnp.einsum("sh,bhqt->bsqt", sel.astype(jnp.float32),
                               probs_c)
        return h, (cache_k, cache_v, sel_probs)

    # NOTE: keeping the scan rolled is measured FASTER than unrolling the
    # 4-layer turbo decoder (beam step 948 -> 1134 ms unrolled: the scan's
    # in-place carry buffers beat XLA's unrolled scheduling here)
    if alignment_slots is None:
        x, (new_k, new_v) = jax.lax.scan(
            step, x, (params["layers"], cross_kv,
                      kv_cache["k"], kv_cache["v"]))
        x = layer_norm(params["layer_norm"], x)
        return x, {"k": new_k, "v": new_v}
    assert not isinstance(cross_kv, dict), \
        "alignment collection needs the exact cross-KV cache"
    x, (new_k, new_v, probs) = jax.lax.scan(
        step, x, (params["layers"], cross_kv,
                  kv_cache["k"], kv_cache["v"], alignment_slots))
    x = layer_norm(params["layer_norm"], x)
    # (L, B, S, q, T_enc) -> owner-layer sum -> (B, S, q, T_enc)
    return x, {"k": new_k, "v": new_v}, probs.sum(axis=0)


def decoder_cached_ancestry(
    params: Params,
    cfg: DiCoWConfig,
    input_ids: jax.Array,          # (Bb, 1) one new token per hypothesis
    pos_offset: jax.Array,          # scalar int — tokens already in cache
    kv_cache: Dict[str, jax.Array],  # bhtd (L, Bb, H, T, hd), append-only
    cross_kv,
    hist: jax.Array,               # (Bb, T) group-local ancestor row per
    #                                cache position (int32 in [0, n))
    n: int,                        # beams per audio row
    attn_impl: str = "xla",        # 'xla' | 'pallas' (ops/beam_attention.py)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Single-token decoder step for beam search with an APPEND-ONLY cache.

    Beam search's per-step cache permutation is the classic TPU sore spot:
    a standalone permute (Pallas or one-hot) costs a full cache read+write
    AND forces XLA layout-conversion copies around the layer scan's carry
    (measured ~1.6 ms/step at large-v3-turbo beam-5 batch-8 — see
    ops/reorder.py). Here the cache is never permuted: row b writes its new
    K/V at (b, pos) forever, and ``hist[b, t]`` records which row of b's
    beam group holds the K/V of b's hypothesis at position t. Attention
    computes scores against the n rows of the group (n× MXU FLOPs — noise
    at decode shapes) and a one-hot ancestry mask selects the right row
    per position. The carry layout is unconstrained (no custom call, no
    cross-step permute), so XLA keeps one layout throughout and the copies
    disappear. The permutation cost moves into ``hist`` bookkeeping —
    (Bb, T) int32, ~20 KB — updated by the caller (decoding/beam.py).

    Exact same attention values as decoder_cached + beam_reorder (the mask
    selects precisely the ancestor's K/V); reduction order differs, so
    scores may drift by float rounding only. Scores are always computed in
    fp32 (like decoder_cached's t-major paths), independent of the
    encoder-side set_attention_impl knob. Requires the default 'bhtd'
    cache layout.

    ``attn_impl='pallas'`` fuses the masked attention read into one Pallas
    kernel per layer (ops/beam_attention.py): with it, NO XLA op in the
    step expresses a layout preference on the cache (the append is a
    layout-agnostic dynamic_update_slice), so the scan-carry
    layout-conversion copies and the full-tensor append rewrite both
    disappear from the trace. The FULL stacked caches ride the layer
    scan's carry and the kernel selects its layer through the
    scalar-prefetch index map — routing per-layer cache slices as scan
    xs/ys instead costs a ConcatBitcast + two full-cache copies per step
    (~0.5 ms at beam-5 batch-8 turbo, trace r04). Runs in interpret mode
    off-TPU.
    """
    assert get_kv_cache_layout() == "bhtd", (
        "ancestry reorder requires the 'bhtd' KV-cache layout, got "
        f"{get_kv_cache_layout()!r}")
    dtype = cfg.compute_dtype
    bb = input_ids.shape[0]
    _, _, num_heads, max_len, head_dim = kv_cache["k"].shape
    b = bb // n

    tok = params["embed_tokens"][input_ids].astype(dtype)
    x = tok + params["embed_positions"][pos_offset][None, None].astype(dtype)

    use_pallas = attn_impl == "pallas"
    if use_pallas:
        from ..ops.beam_attention import ancestry_attention

        interp = jax.default_backend() != "tpu"

        def step_pallas(carry, xs):
            h, ck_full, cv_full = carry
            lp, cross, li = xs
            res = h
            z = layer_norm(lp["self_attn_layer_norm"], h)
            q = linear(lp["self_attn"]["q_proj"], z, dtype) * head_dim ** -0.5
            k_new = linear(lp["self_attn"]["k_proj"], z, dtype)
            v_new = linear(lp["self_attn"]["v_proj"], z, dtype)
            q, k_new, v_new = (_split_heads(t, num_heads)
                               for t in (q, k_new, v_new))
            # one fused kernel over the stacked pre-update caches: masked
            # read + self splice + softmax + PV; the layer row comes from
            # the scalar-prefetch index map, so the carry never meets an
            # XLA op with a layout preference
            attn = ancestry_attention(q, k_new, v_new, ck_full, cv_full,
                                      hist, pos_offset, li, n,
                                      interpret=interp)
            h = res + linear(lp["self_attn"]["out_proj"],
                             _merge_heads(attn), dtype)
            # append last: one in-place slab write into the carried stack
            ck_full = jax.lax.dynamic_update_slice(
                ck_full, k_new[None], (li, 0, 0, pos_offset, 0))
            cv_full = jax.lax.dynamic_update_slice(
                cv_full, v_new[None], (li, 0, 0, pos_offset, 0))

            res = h
            z = layer_norm(lp["encoder_attn_layer_norm"], h)
            q2 = linear(lp["encoder_attn"]["q_proj"], z, dtype) \
                * head_dim ** -0.5
            q2 = _split_heads(q2, num_heads)
            attn = _cross_attention(q2, cross, dtype)
            h = res + linear(lp["encoder_attn"]["out_proj"],
                             _merge_heads(attn), dtype)

            res = h
            z = layer_norm(lp["final_layer_norm"], h)
            h = res + mlp_block(lp, z, dtype)
            return (h, ck_full, cv_full), None

        n_layers = kv_cache["k"].shape[0]
        (x, new_k, new_v), _ = jax.lax.scan(
            step_pallas, (x, kv_cache["k"], kv_cache["v"]),
            (params["layers"], cross_kv,
             jnp.arange(n_layers, dtype=jnp.int32)))
        x = layer_norm(params["layer_norm"], x)
        return x, {"k": new_k, "v": new_v}

    key_pos = jnp.arange(max_len)
    pos_ok = key_pos <= pos_offset               # (T,)
    # group-local ancestry one-hot (the permutation is block-diagonal —
    # a row only ever selects within its own beam group, so the c axis
    # is n, not Bb): sel[b, o, c, t] = 1 iff group row c holds
    # hypothesis (b, o)'s K/V at position t (and t is visible)
    sel = (hist.reshape(b, n, 1, max_len) ==
           jnp.arange(n)[None, None, :, None]) & pos_ok[None, None, None]
    sel_f = sel.astype(jnp.float32)
    any_sel = sel.any(axis=2).reshape(bb, max_len)   # (Bb, T)

    def step(h, xs):
        lp, cross, cache_k, cache_v = xs
        res = h
        z = layer_norm(lp["self_attn_layer_norm"], h)
        q = linear(lp["self_attn"]["q_proj"], z, dtype) * head_dim ** -0.5
        k_new = linear(lp["self_attn"]["k_proj"], z, dtype)
        v_new = linear(lp["self_attn"]["v_proj"], z, dtype)
        q, k_new, v_new = (_split_heads(t, num_heads) for t in (q, k_new, v_new))
        # attention reads the PRE-update cache; the new token's self term
        # is computed analytically from k_new/v_new and spliced in at
        # position pos_offset. The append then happens at the END of the
        # step, where the updated buffer's only consumer is the carry
        # output — a clean last write XLA can do in place (the v1 order,
        # update-then-attend, degraded the append to a full-tensor rewrite
        # worth ~1.5 ms/step at beam-5 batch-8 large-v3-turbo).
        # Einsums are group-local (leading-dim splits are free
        # row-major reshapes); the ancestry select is exact (one
        # nonzero c per (b, o, t)).
        qg = q.reshape(b, n, num_heads, head_dim)
        kg = cache_k.reshape(b, n, num_heads, max_len, head_dim)
        vg = cache_v.reshape(b, n, num_heads, max_len, head_dim)
        scores_all = jnp.einsum("bohd,bchtd->bohct", qg, kg,
                                preferred_element_type=jnp.float32)
        scores = jnp.einsum("bohct,boct->boht", scores_all, sel_f) \
            .reshape(bb, num_heads, 1, max_len)
        score_self = jnp.einsum("bhqd,bhqd->bhq", q, k_new,
                                preferred_element_type=jnp.float32)
        is_pos = (key_pos == pos_offset)[None, None, None]  # (1,1,1,T)
        scores = jnp.where(is_pos, score_self[..., None], scores)
        # any_sel is true at t == pos_offset (the caller claims the
        # slot), so it is the complete visibility mask
        scores = jnp.where(any_sel[:, None, None], scores,
                           jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1)
        p_hist = jnp.where(is_pos, 0.0, probs)
        p_self = (probs - p_hist).sum(axis=-1)            # (Bb,H,1)
        wp = jnp.einsum("boht,boct->bohct",
                        p_hist.reshape(b, n, num_heads, max_len),
                        sel_f).astype(dtype)
        attn = jnp.einsum("bohct,bchtd->bohd", wp, vg) \
            .reshape(bb, num_heads, 1, head_dim) \
            + p_self[..., None].astype(dtype) * v_new
        h = res + linear(lp["self_attn"]["out_proj"], _merge_heads(attn), dtype)
        # append last: the updated buffers' only consumer is the carry out
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k_new, (0, 0, pos_offset, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v_new, (0, 0, pos_offset, 0))

        res = h
        z = layer_norm(lp["encoder_attn_layer_norm"], h)
        q2 = linear(lp["encoder_attn"]["q_proj"], z, dtype) * head_dim ** -0.5
        q2 = _split_heads(q2, num_heads)
        attn = _cross_attention(q2, cross, dtype)
        h = res + linear(lp["encoder_attn"]["out_proj"], _merge_heads(attn),
                         dtype)

        res = h
        z = layer_norm(lp["final_layer_norm"], h)
        h = res + mlp_block(lp, z, dtype)
        return h, (cache_k, cache_v)

    x, (new_k, new_v) = jax.lax.scan(
        step, x, (params["layers"], cross_kv,
                  kv_cache["k"], kv_cache["v"]))
    x = layer_norm(params["layer_norm"], x)
    return x, {"k": new_k, "v": new_v}


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _uniform(key, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -scale, scale)


def init_linear(key, d_in: int, d_out: int, bias: bool = True,
                dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    # torch nn.Linear default init (kaiming-uniform fan_in)
    bound = 1.0 / math.sqrt(d_in)
    p = {"kernel": _uniform(k1, (d_in, d_out), bound, dtype)}
    if bias:
        p["bias"] = _uniform(k2, (d_out,), bound, dtype)
    return p


def init_layer_norm(d: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_attention(key, d: int, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "q_proj": init_linear(ks[0], d, d, True, dtype),
        "k_proj": init_linear(ks[1], d, d, False, dtype),
        "v_proj": init_linear(ks[2], d, d, True, dtype),
        "out_proj": init_linear(ks[3], d, d, True, dtype),
    }


def init_encoder_layer(key, cfg: DiCoWConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    d = cfg.d_model
    return {
        "self_attn": init_attention(ks[0], d, dtype),
        "self_attn_layer_norm": init_layer_norm(d, dtype),
        "fc1": init_linear(ks[1], d, cfg.encoder_ffn_dim, True, dtype),
        "fc2": init_linear(ks[2], cfg.encoder_ffn_dim, d, True, dtype),
        "final_layer_norm": init_layer_norm(d, dtype),
    }


def init_decoder_layer(key, cfg: DiCoWConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    d = cfg.d_model
    return {
        "self_attn": init_attention(ks[0], d, dtype),
        "self_attn_layer_norm": init_layer_norm(d, dtype),
        "encoder_attn": init_attention(ks[1], d, dtype),
        "encoder_attn_layer_norm": init_layer_norm(d, dtype),
        "fc1": init_linear(ks[2], d, cfg.decoder_ffn_dim, True, dtype),
        "fc2": init_linear(ks[3], cfg.decoder_ffn_dim, d, True, dtype),
        "final_layer_norm": init_layer_norm(d, dtype),
    }


def _stack_layers(layer_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_list)


def sinusoidal_positions(length: int, d_model: int) -> np.ndarray:
    """Whisper encoder sinusoids (HF sinusoids init)."""
    log_timescale = math.log(10000) / (d_model // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(d_model // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def init_encoder(key, cfg: DiCoWConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.encoder_layers + 2)
    d = cfg.d_model
    conv_bound1 = 1.0 / math.sqrt(cfg.num_mel_bins * 3)
    conv_bound2 = 1.0 / math.sqrt(d * 3)
    k1a, k1b = jax.random.split(ks[0])
    k2a, k2b = jax.random.split(ks[1])
    params = {
        "conv1": {"kernel": _uniform(k1a, (3, cfg.num_mel_bins, d), conv_bound1, dtype),
                  "bias": _uniform(k1b, (d,), conv_bound1, dtype)},
        "conv2": {"kernel": _uniform(k2a, (3, d, d), conv_bound2, dtype),
                  "bias": _uniform(k2b, (d,), conv_bound2, dtype)},
        "embed_positions": jnp.asarray(
            sinusoidal_positions(cfg.max_source_positions, d), dtype),
        "layers": _stack_layers(
            [init_encoder_layer(ks[i + 2], cfg, dtype)
             for i in range(cfg.encoder_layers)]),
        "layer_norm": init_layer_norm(d, dtype),
    }
    return params


def init_decoder(key, cfg: DiCoWConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.decoder_layers + 2)
    d = cfg.d_model
    return {
        "embed_tokens": jax.random.normal(ks[0], (cfg.vocab_size, d), dtype) * 0.02,
        "embed_positions": jax.random.normal(
            ks[1], (cfg.max_target_positions, d), dtype) * 0.02,
        "layers": _stack_layers(
            [init_decoder_layer(ks[i + 2], cfg, dtype)
             for i in range(cfg.decoder_layers)]),
        "layer_norm": init_layer_norm(d, dtype),
    }
