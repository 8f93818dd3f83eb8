"""Model container: build model config + params + tokenizer from CLI config.

Equivalent of /root/reference/src/models/containers.py:19-114 for the JAX
stack: resolves the whisper architecture, applies the 19 DiCoW config
overrides, loads HF safetensors when a local checkpoint directory is given
(zero-egress: no hub downloads), otherwise random-initializes; wires the
tokenizer and the case-invariant token map.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
import jax

from ..config import Cfg
from ..data.tokenizer import create_lower_uppercase_mapping, load_tokenizer
from ..utils.logging_def import get_logger
from .config import DiCoWConfig, make_config
from .convert import hf_to_params, load_safetensors_dir
from .dicow import init_dicow

logger = get_logger(__name__)


class WhisperContainer:
    def __init__(self, cfg: Cfg, seed: int = 0):
        self.cfg = cfg
        m = cfg.model
        model_id = m.whisper_model

        # attention backend: set once, before the first trace. 'auto' picks
        # the Pallas flash kernel on TPU (+26% encoder throughput, scores
        # never touch HBM) and XLA elsewhere.
        import jax

        from ..ops.attention import set_attention_impl

        impl = m.attention_impl
        if impl == "auto":
            # pallas flash attention wins for inference (+26% encoder) but
            # loses under remat'd training (forward runs twice and the
            # backward is XLA-recompute either way) — so 'auto' enables it
            # only for decode-only jobs
            try:
                impl = ("pallas" if jax.default_backend() == "tpu"
                        and cfg.training.use_flash_attention
                        and cfg.training.decode_only else "xla")
            except Exception:
                impl = "xla"
        set_attention_impl(impl)

        overrides = dict(
            ctc_weight=m.ctc_weight,
            additional_layer=m.additional_layer,
            additional_self_attention_layer=m.additional_self_attention_layer,
            pre_ctc_sub_sample=m.pre_ctc_sub_sample,
            use_fddt=m.use_fddt and cfg.training.use_fddt,
            fddt_is_diagonal=m.fddt_is_diagonal,
            fddt_bias_only=m.fddt_bias_only,
            fddt_use_silence=m.fddt_use_silence,
            fddt_use_target=m.fddt_use_target,
            fddt_use_overlap=m.fddt_use_overlap,
            fddt_use_non_target=m.fddt_use_non_target,
            apply_fddt_to_n_layers=m.apply_fddt_to_n_layers,
            fddt_init=m.fddt_init,
            non_target_fddt_value=m.non_target_fddt_value,
            use_pre_pos_fddt=m.use_pre_pos_fddt,
            remove_timestamps_from_ctc=cfg.training.remove_timestamps_from_ctc,
            use_enrollments=m.use_enrollments or cfg.data.use_enrollments,
            scb_layers=m.scb_layers,
            dtype=m.dtype,
            param_dtype=m.param_dtype,
            attention_impl=m.attention_impl,
        )

        local_dir = Path(model_id) if Path(model_id).exists() else None
        if local_dir and (local_dir / "config.json").exists():
            with open(local_dir / "config.json") as f:
                hf_cfg = json.load(f)
            base = {k: hf_cfg[k] for k in (
                "vocab_size", "num_mel_bins", "d_model", "encoder_layers",
                "decoder_layers", "encoder_attention_heads",
                "decoder_attention_heads", "encoder_ffn_dim",
                "decoder_ffn_dim", "max_source_positions",
                "max_target_positions", "decoder_start_token_id",
                "eos_token_id", "pad_token_id", "bos_token_id")
                if k in hf_cfg}
            self.model_config = DiCoWConfig(**base, **overrides)
        else:
            self.model_config = make_config(model_id, **overrides)

        tok_path = str(local_dir) if local_dir else None
        self.tokenizer = load_tokenizer(tok_path,
                                        vocab_size=self.model_config.vocab_size)
        if not hasattr(self.tokenizer, "upper_cased_tokens"):
            self.tokenizer.upper_cased_tokens = create_lower_uppercase_mapping(
                self.tokenizer)
        # the byte-level fallback tokenizer derives its own special-token ids
        # from vocab_size; keep the model config consistent with it
        from ..data.tokenizer import ByteLevelTokenizer

        if isinstance(self.tokenizer, ByteLevelTokenizer):
            tok = self.tokenizer
            self.model_config = self.model_config.replace(
                decoder_start_token_id=tok.decoder_start_token_id,
                eos_token_id=tok.eos_token_id,
                pad_token_id=tok.pad_token_id,
                bos_token_id=tok.bos_token_id)

        self.params = init_dicow(jax.random.PRNGKey(seed), self.model_config)
        if local_dir:
            st_files = list(local_dir.glob("*.safetensors"))
            if st_files:
                logger.info("Loading weights from %s", local_dir)
                sd = load_safetensors_dir(str(local_dir))
                loaded = hf_to_params(sd, self.model_config)
                self.params = _merge_params(self.params, loaded)

    # -- reference loaders (train.py:102-125) -----------------------------
    def reinit_encoder_from(self, path: str) -> None:
        """Encoder-only safetensors, FDDT keys filtered (train.py:104-107)."""
        sd = load_safetensors_dir(path)
        sd = {k: v for k, v in sd.items() if "fddt" not in k.lower()}
        # encoder-only dicts may lack decoder keys; merge leaf-wise
        partial = {}
        for k, v in sd.items():
            partial[k] = v
        loaded = _partial_hf_to_params(partial, self.model_config)
        self.params = _merge_params(self.params, loaded)

    def reinit_from(self, path: str) -> None:
        sd = load_safetensors_dir(path)
        loaded = hf_to_params(sd, self.model_config)
        self.params = _merge_params(self.params, loaded)


def _merge_params(base, loaded):
    """Overlay loaded leaves onto the random-init tree, keeping extras
    (e.g. freshly initialized FDDTs absent from the checkpoint)."""

    def merge(b, l):
        if isinstance(b, dict) and isinstance(l, dict):
            out = dict(b)
            for k, v in l.items():
                out[k] = merge(b[k], v) if k in b else v
            return out
        return l

    return merge(base, loaded)


def _partial_hf_to_params(sd, cfg):
    """Best-effort conversion of a partial (e.g. encoder-only) state dict."""
    from .convert import hf_to_params

    has_decoder = any(k.startswith(("decoder.", "model.decoder.")) for k in sd)
    if has_decoder:
        return hf_to_params(sd, cfg)
    # wrap encoder-only: synthesize via full converter on encoder keys only
    import numpy as np

    from .convert import (
        _attn, _conv, _count_layers, _enc_layer, _fddt_from_sd, _lin, _ln,
        _scb_from_sd, _stack,
    )

    clean = {}
    for k, v in sd.items():
        k = k.removeprefix("model.")
        if not k.startswith("encoder."):
            k = "encoder." + k
        clean[k] = np.asarray(v)
    enc = {}
    if "encoder.conv1.weight" in clean:
        enc["conv1"] = _conv(clean, "encoder.conv1")
        enc["conv2"] = _conv(clean, "encoder.conv2")
        enc["embed_positions"] = clean["encoder.embed_positions.weight"]
        enc["layers"] = _stack([_enc_layer(clean, f"encoder.layers.{i}")
                                for i in range(cfg.encoder_layers)])
        enc["layer_norm"] = _ln(clean, "encoder.layer_norm")
    if "encoder.lm_head.weight" in clean:
        enc["lm_head"] = _lin(clean, "encoder.lm_head", bias=False)
    if any(k.startswith("encoder.additional_self_attention_layer.")
           for k in clean):
        enc["additional_self_attention_layer"] = _attn(
            clean, "encoder.additional_self_attention_layer")
    if any(k.startswith("encoder.additional_layer.") for k in clean):
        enc["additional_layer"] = _enc_layer(clean, "encoder.additional_layer")
    for conv in ("subsample_conv1", "subsample_conv2"):
        if f"encoder.{conv}.weight" in clean:
            enc[conv] = _conv(clean, f"encoder.{conv}")
    n = _count_layers(clean, "encoder.fddts")
    if n:
        enc["fddts"] = _stack([_fddt_from_sd(clean, f"encoder.fddts.{i}", cfg)
                               for i in range(n)])
    if any(k.startswith("encoder.initial_fddt.") for k in clean):
        enc["initial_fddt"] = _fddt_from_sd(clean, "encoder.initial_fddt", cfg)
    n = _count_layers(clean, "encoder.ca_enrolls")
    if n:
        enc["ca_enrolls"] = _stack(
            [_scb_from_sd(clean, f"encoder.ca_enrolls.{i}") for i in range(n)])
    return {"encoder": enc}
