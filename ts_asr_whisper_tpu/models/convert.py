"""HF checkpoint bridge: torch/safetensors Whisper & DiCoW state dicts <->
our stacked-layer param pytrees.

The reference requires HF checkpoint compatibility (BASELINE.md north star;
export: /root/reference/utils/export_dicow.py, loaders: src/train.py:102-125).
Torch layouts converted: Linear (out,in)->kernel (in,out); Conv1d
(out,in,k)->(k,in,out); LayerNorm weight->scale. Per-layer weights are
stacked on a leading axis for the scan-based forward.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Iterable, Optional

import numpy as np

from .config import DiCoWConfig
from .fddt import STNO_CLASSES

Params = Dict[str, Any]

_ATTN_KEYS = ("q_proj", "k_proj", "v_proj", "out_proj")
_LN = {"weight": "scale", "bias": "bias"}


def _lin(sd, prefix, bias=True):
    p = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv(sd, prefix):
    p = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _attn(sd, prefix):
    return {k: _lin(sd, f"{prefix}.{k}") for k in _ATTN_KEYS}


def _enc_layer(sd, prefix):
    return {
        "self_attn": _attn(sd, f"{prefix}.self_attn"),
        "self_attn_layer_norm": _ln(sd, f"{prefix}.self_attn_layer_norm"),
        "fc1": _lin(sd, f"{prefix}.fc1"),
        "fc2": _lin(sd, f"{prefix}.fc2"),
        "final_layer_norm": _ln(sd, f"{prefix}.final_layer_norm"),
    }


def _dec_layer(sd, prefix):
    p = _enc_layer(sd, prefix)
    p["encoder_attn"] = _attn(sd, f"{prefix}.encoder_attn")
    p["encoder_attn_layer_norm"] = _ln(sd, f"{prefix}.encoder_attn_layer_norm")
    return p


def _stack(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def _fddt_from_sd(sd, prefix, cfg: DiCoWConfig) -> Optional[Params]:
    out: Params = {}
    for cls in STNO_CLASSES:
        wkey = f"{prefix}.{cls}_linear.weight"
        bare = f"{prefix}.{cls}_linear"
        if cfg.fddt_bias_only:
            if bare in sd:
                out[cls] = {"bias": sd[bare]}
        elif wkey in sd:
            p = {"weight": sd[wkey]}  # diagonal (D,) or full torch (out,in)
            bkey = f"{prefix}.{cls}_linear.bias"
            if bkey in sd:
                p["bias"] = sd[bkey]
            out[cls] = p
    return out or None


def _scb_from_sd(sd, prefix):
    return {
        "cross_attn": _attn(sd, f"{prefix}.cae.cross_attn"),
        "ffn_0": _lin(sd, f"{prefix}.cae.ffn.0"),
        "ffn_3": _lin(sd, f"{prefix}.cae.ffn.3"),
        "gate": sd[f"{prefix}.cae.cross_gate.gate"],
    }


def _count_layers(sd: Dict[str, np.ndarray], prefix: str) -> int:
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    idxs = {int(m.group(1)) for k in sd for m in [pat.match(k)] if m}
    return max(idxs) + 1 if idxs else 0


def hf_to_params(state_dict: Dict[str, np.ndarray], cfg: DiCoWConfig) -> Params:
    """Convert a flat HF state dict (numpy values) into our param pytree.

    Accepts both full-model keys (``model.encoder...``) and bare
    encoder/decoder prefixes. ``proj_out.weight`` is ignored (tied to
    ``decoder.embed_tokens``, reference train.py:111).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("model.")
        if k == "proj_out.weight":
            continue
        sd[k] = np.asarray(v)

    enc: Params = {
        "conv1": _conv(sd, "encoder.conv1"),
        "conv2": _conv(sd, "encoder.conv2"),
        "embed_positions": sd["encoder.embed_positions.weight"],
        "layers": _stack([_enc_layer(sd, f"encoder.layers.{i}")
                          for i in range(cfg.encoder_layers)]),
        "layer_norm": _ln(sd, "encoder.layer_norm"),
    }

    # DiCoW extras (present depending on config / checkpoint)
    n_fddt = _count_layers(sd, "encoder.fddts")
    if n_fddt:
        enc["fddts"] = _stack(
            [_fddt_from_sd(sd, f"encoder.fddts.{i}", cfg) for i in range(n_fddt)])
    if any(k.startswith("encoder.initial_fddt.") for k in sd):
        enc["initial_fddt"] = _fddt_from_sd(sd, "encoder.initial_fddt", cfg)
    if "encoder.lm_head.weight" in sd:
        enc["lm_head"] = _lin(sd, "encoder.lm_head", bias=False)
    if any(k.startswith("encoder.additional_layer.") for k in sd):
        enc["additional_layer"] = _enc_layer(sd, "encoder.additional_layer")
    if any(k.startswith("encoder.additional_self_attention_layer.") for k in sd):
        enc["additional_self_attention_layer"] = _attn(
            sd, "encoder.additional_self_attention_layer")
    for conv in ("subsample_conv1", "subsample_conv2"):
        if f"encoder.{conv}.weight" in sd:
            enc[conv] = _conv(sd, f"encoder.{conv}")
    n_scb = _count_layers(sd, "encoder.ca_enrolls")
    if n_scb:
        enc["ca_enrolls"] = _stack(
            [_scb_from_sd(sd, f"encoder.ca_enrolls.{i}") for i in range(n_scb)])

    dec: Params = {
        "embed_tokens": sd["decoder.embed_tokens.weight"],
        "embed_positions": sd["decoder.embed_positions.weight"],
        "layers": _stack([_dec_layer(sd, f"decoder.layers.{i}")
                          for i in range(cfg.decoder_layers)]),
        "layer_norm": _ln(sd, "decoder.layer_norm"),
    }
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# export: our pytree -> HF flat state dict
# ---------------------------------------------------------------------------


def _emit_lin(out, prefix, p):
    out[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _emit_ln(out, prefix, p):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _emit_conv(out, prefix, p):
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        np.asarray(p["kernel"]).transpose(2, 1, 0))
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _emit_attn(out, prefix, p):
    for k in _ATTN_KEYS:
        _emit_lin(out, f"{prefix}.{k}", p[k])


def _emit_enc_layer(out, prefix, p):
    _emit_attn(out, f"{prefix}.self_attn", p["self_attn"])
    _emit_ln(out, f"{prefix}.self_attn_layer_norm", p["self_attn_layer_norm"])
    _emit_lin(out, f"{prefix}.fc1", p["fc1"])
    _emit_lin(out, f"{prefix}.fc2", p["fc2"])
    _emit_ln(out, f"{prefix}.final_layer_norm", p["final_layer_norm"])


def _emit_dec_layer(out, prefix, p):
    _emit_enc_layer(out, prefix, p)
    _emit_attn(out, f"{prefix}.encoder_attn", p["encoder_attn"])
    _emit_ln(out, f"{prefix}.encoder_attn_layer_norm", p["encoder_attn_layer_norm"])


def _unstack(tree):
    import jax

    n = jax.tree.leaves(tree)[0].shape[0]
    return [jax.tree.map(lambda a: np.asarray(a[i]), tree) for i in range(n)]


def params_to_hf(params: Params, cfg: DiCoWConfig,
                 prefix: str = "model.") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    enc, dec = params["encoder"], params["decoder"]
    e = f"{prefix}encoder"
    d = f"{prefix}decoder"

    _emit_conv(out, f"{e}.conv1", enc["conv1"])
    _emit_conv(out, f"{e}.conv2", enc["conv2"])
    out[f"{e}.embed_positions.weight"] = np.asarray(enc["embed_positions"])
    for i, lp in enumerate(_unstack(enc["layers"])):
        _emit_enc_layer(out, f"{e}.layers.{i}", lp)
    _emit_ln(out, f"{e}.layer_norm", enc["layer_norm"])

    if "fddts" in enc:
        for i, fp in enumerate(_unstack(enc["fddts"])):
            _emit_fddt(out, f"{e}.fddts.{i}", fp, cfg)
    if "initial_fddt" in enc:
        _emit_fddt(out, f"{e}.initial_fddt", enc["initial_fddt"], cfg)
    if "lm_head" in enc:
        _emit_lin(out, f"{e}.lm_head", enc["lm_head"])
    if "additional_layer" in enc:
        _emit_enc_layer(out, f"{e}.additional_layer", enc["additional_layer"])
    if "additional_self_attention_layer" in enc:
        _emit_attn(out, f"{e}.additional_self_attention_layer",
                   enc["additional_self_attention_layer"])
    for conv in ("subsample_conv1", "subsample_conv2"):
        if conv in enc:
            _emit_conv(out, f"{e}.{conv}", enc[conv])
    if "ca_enrolls" in enc:
        for i, sp in enumerate(_unstack(enc["ca_enrolls"])):
            _emit_attn(out, f"{e}.ca_enrolls.{i}.cae.cross_attn", sp["cross_attn"])
            _emit_lin(out, f"{e}.ca_enrolls.{i}.cae.ffn.0", sp["ffn_0"])
            _emit_lin(out, f"{e}.ca_enrolls.{i}.cae.ffn.3", sp["ffn_3"])
            out[f"{e}.ca_enrolls.{i}.cae.cross_gate.gate"] = np.asarray(sp["gate"])

    out[f"{d}.embed_tokens.weight"] = np.asarray(dec["embed_tokens"])
    out[f"{d}.embed_positions.weight"] = np.asarray(dec["embed_positions"])
    for i, lp in enumerate(_unstack(dec["layers"])):
        _emit_dec_layer(out, f"{d}.layers.{i}", lp)
    _emit_ln(out, f"{d}.layer_norm", dec["layer_norm"])
    out["proj_out.weight"] = np.asarray(dec["embed_tokens"])
    return out


def _emit_fddt(out, prefix, fp, cfg: DiCoWConfig):
    for cls, p in fp.items():
        if cfg.fddt_bias_only:
            out[f"{prefix}.{cls}_linear"] = np.asarray(p["bias"])
        else:
            out[f"{prefix}.{cls}_linear.weight"] = np.asarray(p["weight"])
            if "bias" in p:
                out[f"{prefix}.{cls}_linear.bias"] = np.asarray(p["bias"])


# ---------------------------------------------------------------------------
# IO helpers
# ---------------------------------------------------------------------------


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load one .safetensors file or merge a directory of shards
    (reference: src/train.py:115-125)."""
    from safetensors.numpy import load_file

    p = Path(path)
    files: Iterable[Path]
    if p.is_dir():
        files = sorted(p.glob("*.safetensors"))
    else:
        files = [p]
    sd: Dict[str, np.ndarray] = {}
    for f in files:
        sd.update(load_file(str(f)))
    return sd


def save_safetensors(state_dict: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()}, path)


def cast_params(params: Params, dtype) -> Params:
    """Cast floating-point leaves (e.g. fp32 -> bf16 for serving: halves the
    weight-streaming HBM traffic that dominates small-batch decode steps)."""
    import jax
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)


def params_from_torch_model(model, cfg: DiCoWConfig) -> Params:
    """Convert a live torch nn.Module (e.g. transformers Whisper/DiCoW)."""
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return hf_to_params(sd, cfg)
