"""DiCoW / SE-DiCoW model: diarization-conditioned Whisper, TPU-native.

Re-designs /root/reference/src/models/dicow/{encoder,modeling_dicow,layers}.py
for JAX/XLA:

- the encoder layer stack runs as segmented ``lax.scan``s: FDDT conditioning
  is fused into the scanned layer body (stacked FDDT params ride the scan),
  so depth never blows up compile time;
- SE-DiCoW keeps an explicit stream axis (B, S=2, T, D) instead of the
  reference's interleaved ``[::2]`` batch trick (encoder.py:152-154,212-213) —
  the same layer code runs over both streams via leading-dim broadcasting,
  and the enrollment stream is dropped by slicing a static axis;
- the CTC head (optional extra layer / bare self-attention / 4x conv
  subsample + lm_head, encoder.py:16-43,87-106) is a separate jittable
  function so long-form decode can cache encoder logits once per utterance.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .config import DiCoWConfig
from .fddt import apply_fddt, init_fddt
from .whisper import (
    Params,
    conv1d,
    decoder_forward,
    encoder_layer,
    encoder_stem,
    gelu,
    init_attention,
    init_decoder,
    init_encoder,
    init_encoder_layer,
    init_linear,
    layer_norm,
    linear,
    lm_logits,
    multi_head_attention,
    scan_layers,
)

# ---------------------------------------------------------------------------
# SCB / CrossAttentionEnrollBlock (SE-DiCoW)
# ---------------------------------------------------------------------------


def scb_forward(p: Params, x: jax.Array, cfg: DiCoWConfig) -> jax.Array:
    """Speaker-communication block (reference layers.py:120-193).

    x: (B, 2, T, D) — stream 0 = sample (query), stream 1 = enrollment (kv).
    Only the query stream is updated, through a zero-init tanh gate.
    """
    dtype = x.dtype
    q = x[:, 0]
    kv = x[:, 1]
    attn = multi_head_attention(p["cross_attn"], q, kv,
                                cfg.encoder_attention_heads, dtype=dtype)
    q_cat = jnp.concatenate([attn, q], axis=-1)
    h = gelu(linear(p["ffn_0"], q_cat, dtype))
    h = linear(p["ffn_3"], h, dtype)
    gate = jnp.tanh(p["gate"].astype(dtype))
    q_out = q + gate * h
    return jnp.stack([q_out, kv], axis=1)


def init_scb(key, cfg: DiCoWConfig, dtype=jnp.float32) -> Params:
    d, ffn = cfg.d_model, cfg.encoder_ffn_dim
    k1, k2, k3 = jax.random.split(key, 3)

    def xavier(key, d_in, d_out, gain):
        bound = gain * math.sqrt(6.0 / (d_in + d_out))
        return jax.random.uniform(key, (d_in, d_out), dtype, -bound, bound)

    # ffn.0: identity from first half of input (the attn output) into the
    # first d outputs (layers.py:95-106), on top of small xavier noise
    w0 = xavier(k2, 2 * d, ffn, 0.1)
    w0 = w0.at[:d, :d].add(jnp.eye(d, dtype=dtype))
    # ffn.3: identity from first d hidden units to the output (layers.py:109-117)
    w3 = xavier(k3, ffn, d, 0.1)
    w3 = w3.at[:d, :].add(jnp.eye(d, dtype=dtype))
    return {
        "cross_attn": init_attention(k1, d, dtype),
        "ffn_0": {"kernel": w0, "bias": jnp.zeros((ffn,), dtype)},
        "ffn_3": {"kernel": w3, "bias": jnp.zeros((d,), dtype)},
        "gate": jnp.zeros((1,), dtype),
    }


# ---------------------------------------------------------------------------
# DiCoW encoder
# ---------------------------------------------------------------------------


def _fddt_kwargs(cfg: DiCoWConfig) -> dict:
    return dict(is_diagonal=cfg.fddt_is_diagonal, bias_only=cfg.fddt_bias_only)


def dicow_encoder_forward(
    enc_params: Params,
    cfg: DiCoWConfig,
    input_features: jax.Array,            # (B, n_mels, 3000)
    stno_mask: Optional[jax.Array] = None,  # (B, 4, 1500)
    enroll_features: Optional[jax.Array] = None,
    enroll_stno: Optional[jax.Array] = None,
    remat: bool = False,
) -> jax.Array:
    """Returns last_hidden_state (B, 1500, D).

    Mirrors encoder.py:140-228 with the interleave replaced by a stream axis.
    """
    dtype = cfg.compute_dtype
    use_streams = cfg.use_enrollments and enroll_features is not None
    if use_streams and not cfg.scb_layers:
        raise ValueError(
            "enroll_features provided with use_enrollments=True but "
            "scb_layers is 0/None — the enrollment stream would never be "
            "fused or dropped (set scb_layers>0 or omit enrollments)")
    if use_streams:
        input_features = jnp.stack([input_features, enroll_features], axis=1)
        stno_mask = jnp.stack([stno_mask, enroll_stno], axis=1)
        b, s = input_features.shape[:2]
        x = encoder_stem(enc_params,
                         input_features.reshape(b * s, *input_features.shape[2:]),
                         dtype)
        x = x.reshape(b, s, *x.shape[1:])                 # (B, S, 1500, D)
    else:
        x = encoder_stem(enc_params, input_features, dtype)  # (B, 1500, D)

    if cfg.use_fddt and cfg.use_pre_pos_fddt:
        x = apply_fddt(enc_params["initial_fddt"], x, stno_mask, **_fddt_kwargs(cfg))

    x = x + enc_params["embed_positions"].astype(x.dtype)[: x.shape[-2]]

    num_heads = cfg.encoder_attention_heads
    n_layers = cfg.encoder_layers
    nf = cfg.num_fddts
    scb_n = cfg.scb_layers if (use_streams and cfg.scb_layers) else 0

    def take(tree, s, e):
        return jax.tree.map(lambda a: a[s:e], tree)

    def layer_at(tree, i):
        return jax.tree.map(lambda a: a[i], tree)

    def fddt_layer_body(xs, h):
        lp, fp = xs
        h = apply_fddt(fp, h, stno_mask, **_fddt_kwargs(cfg))
        return encoder_layer(lp, h, num_heads, dtype)

    def plain_layer_body(lp, h):
        return encoder_layer(lp, h, num_heads, dtype)

    layers = enc_params["layers"]
    idx = 0

    # --- SCB region: unrolled (small: scb_layers <= 8 in practice) ---
    for i in range(scb_n):
        if cfg.use_fddt and i < nf:
            x = apply_fddt(layer_at(enc_params["fddts"], i), x, stno_mask,
                           **_fddt_kwargs(cfg))
        x = scb_forward(layer_at(enc_params["ca_enrolls"], i), x, cfg)
        if i == scb_n - 1:
            # enrollment stream no longer needed (encoder.py:210-213)
            x = x[:, 0]
            stno_mask = stno_mask[:, 0]
        x = encoder_layer(layer_at(layers, i), x, num_heads, dtype)
        idx = i + 1

    # --- scanned region with FDDT ---
    if cfg.use_fddt and nf > idx:
        seg = (take(layers, idx, nf), take(enc_params["fddts"], idx, nf))
        body = fddt_layer_body
        if remat:
            body = jax.checkpoint(body)

        def step(h, xs):
            return body(xs, h), None

        x, _ = jax.lax.scan(step, x, seg)
        idx = nf

    # --- scanned plain region ---
    if n_layers > idx:
        x = scan_layers(partial(plain_layer_body), take(layers, idx, n_layers),
                        x, remat=remat)

    return layer_norm(enc_params["layer_norm"], x)


def encoder_ctc_logits(enc_params: Params, cfg: DiCoWConfig,
                       hidden: jax.Array) -> jax.Array:
    """CTC head over encoder hidden states (encoder.py:87-106,233-240):
    optional extra layer OR bare self-attention (no residual), then optional
    2x conv stride-2 subsampling (no activation), then lm_head -> vocab+1."""
    dtype = cfg.compute_dtype
    h = hidden.astype(dtype)
    if cfg.additional_layer and cfg.ctc_weight > 0.0:
        h = encoder_layer(enc_params["additional_layer"], h,
                          cfg.encoder_attention_heads, dtype)
    elif cfg.additional_self_attention_layer and cfg.ctc_weight > 0.0:
        h = multi_head_attention(enc_params["additional_self_attention_layer"],
                                 h, h, cfg.encoder_attention_heads, dtype=dtype)
    if cfg.pre_ctc_sub_sample and cfg.ctc_weight > 0.0:
        h = conv1d(enc_params["subsample_conv1"], h, stride=2, dtype=dtype)
        h = conv1d(enc_params["subsample_conv2"], h, stride=2, dtype=dtype)
    return linear(enc_params["lm_head"], h, dtype).astype(jnp.float32)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def dicow_forward(
    params: Params,
    cfg: DiCoWConfig,
    input_features: jax.Array,
    stno_mask: jax.Array,
    decoder_input_ids: jax.Array,
    enroll_features: Optional[jax.Array] = None,
    enroll_stno: Optional[jax.Array] = None,
    remat: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Teacher-forced forward. Returns (decoder logits fp32 (B, T, V),
    encoder last hidden (B, 1500, D))."""
    enc = dicow_encoder_forward(params["encoder"], cfg, input_features,
                                stno_mask, enroll_features, enroll_stno,
                                remat=remat)
    dec_hidden = decoder_forward(params["decoder"], cfg, decoder_input_ids,
                                 enc, remat=remat)
    logits = lm_logits(params["decoder"], dec_hidden).astype(jnp.float32)
    return logits, enc


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_dicow(key, cfg: DiCoWConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 8)
    enc = init_encoder(keys[0], cfg, dtype)
    dec = init_decoder(keys[1], cfg, dtype)

    if cfg.use_fddt:
        nf = cfg.num_fddts
        fkeys = jax.random.split(keys[2], max(nf, 1))
        fddt_kw = dict(
            fddt_init=cfg.fddt_init, is_diagonal=cfg.fddt_is_diagonal,
            bias_only=cfg.fddt_bias_only, use_silence=cfg.fddt_use_silence,
            use_target=cfg.fddt_use_target, use_overlap=cfg.fddt_use_overlap,
            use_non_target=cfg.fddt_use_non_target, dtype=dtype)
        # per-layer FDDTs use non_target_rate=1.0 (encoder.py:51); the
        # pre-positional one uses cfg.non_target_fddt_value (encoder.py:65)
        fddts = [init_fddt(fkeys[i], cfg.d_model, non_target_rate=1.0, **fddt_kw)
                 for i in range(nf)]
        if nf:
            enc["fddts"] = jax.tree.map(lambda *xs: jnp.stack(xs), *fddts)
        if cfg.use_pre_pos_fddt:
            enc["initial_fddt"] = init_fddt(
                keys[3], cfg.d_model,
                non_target_rate=cfg.non_target_fddt_value, **fddt_kw)

    if cfg.ctc_weight > 0.0:
        if cfg.additional_layer:
            enc["additional_layer"] = init_encoder_layer(keys[4], cfg, dtype)
        if cfg.additional_self_attention_layer:
            enc["additional_self_attention_layer"] = init_attention(
                keys[4], cfg.d_model, dtype)
        if cfg.pre_ctc_sub_sample:
            k1, k2 = jax.random.split(keys[5])
            bound = 1.0 / math.sqrt(cfg.d_model * 3)
            enc["subsample_conv1"] = {
                "kernel": jax.random.uniform(
                    k1, (3, cfg.d_model, cfg.d_model), dtype, -bound, bound)}
            enc["subsample_conv2"] = {
                "kernel": jax.random.uniform(
                    k2, (3, cfg.d_model, cfg.d_model), dtype, -bound, bound)}
        enc["lm_head"] = init_linear(keys[6], cfg.d_model, cfg.ctc_vocab_size,
                                     bias=False, dtype=dtype)

    if cfg.use_enrollments and cfg.scb_layers:
        skeys = jax.random.split(keys[7], cfg.scb_layers)
        scbs = [init_scb(skeys[i], cfg, dtype) for i in range(cfg.scb_layers)]
        enc["ca_enrolls"] = jax.tree.map(lambda *xs: jnp.stack(xs), *scbs)

    return {"encoder": enc, "decoder": dec}
