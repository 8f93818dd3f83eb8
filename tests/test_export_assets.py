"""The reference's REAL export assets drive this framework's loaders.

Round-2 review: accuracy parity vs the published tcpWER tables is blocked
on real weights, but two things ARE locally provable and close the loader
side of that gap:

1. the reference's shipped generation_config.json
   (/root/reference/export_sources/generation_config.json — the exact
   asset BUT-FIT/DiCoW_v3* checkpoints carry) parses through
   GenerationConfig.from_json with every decode-relevant field intact;
2. a full DiCoW-v3-turbo-SHAPED HF checkpoint — the reference torch
   model's real state-dict key space (32 encoder / 4 decoder layers,
   real 51866 vocab, FDDT + CTC-head extras) at tiny hidden dims —
   round-trips through models/convert.py and decodes end-to-end through
   scripts/smoke_decode.py unmodified, with the real
   generation_config.json in the checkpoint dir.
"""

import gzip
import importlib.util
import json
import shutil
from pathlib import Path

import numpy as np
import pytest

REF_GEN_JSON = Path("/root/reference/export_sources/generation_config.json")

needs_reference = pytest.mark.skipif(
    not REF_GEN_JSON.exists(), reason="reference export assets unavailable")


@needs_reference
def test_reference_generation_config_parses():
    from ts_asr_whisper_tpu.decoding.generation_config import GenerationConfig

    with open(REF_GEN_JSON) as f:
        raw = json.load(f)
    gc = GenerationConfig.from_json(str(REF_GEN_JSON))

    # suppress list verbatim (the token ids Whisper never emits)
    assert gc.suppress_tokens == tuple(raw["suppress_tokens"])
    assert len(gc.suppress_tokens) > 80
    # the full 100-language map -> sorted lang ids for detection
    assert gc.lang_ids == tuple(sorted(raw["lang_to_id"].values()))
    assert len(gc.lang_ids) == len(raw["lang_to_id"]) == 100
    assert gc.task_to_id == (("transcribe", 50360), ("translate", 50359))
    # decode-critical ids and flags
    assert gc.decoder_start_token_id == 50258
    assert gc.eos_token_id == gc.pad_token_id == gc.bos_token_id == 50257
    assert gc.no_timestamps_token_id == 50364
    assert gc.timestamp_begin == 50365
    assert gc.prev_sot_token_id == 50362
    assert gc.max_length == 448
    assert gc.return_timestamps is True
    assert gc.is_multilingual is True
    # the exported checkpoints ship with CTC rescoring off by default
    assert gc.ctc_weight == 0 and gc.ctc_margin == 0
    # nulls fall back to dataclass defaults instead of crashing
    assert gc.begin_suppress_tokens == ()
    assert gc.max_initial_timestamp_index is None


def _reference_tiny_turbo_state_dict():
    """The reference torch DiCoW's REAL key space at tiny dims: whisper
    large-v3-turbo layer structure (32 enc / 4 dec, 128 mel, 51866 vocab)
    with d_model 64, plus the dicow_v3 training extras
    (/root/reference/configs/base.yaml: diagonal FDDT all layers,
    pre-positional FDDT, CTC head with extra self-attn layer + 4x conv
    subsample)."""
    from oracles import load_reference_dicow

    RefConfig, RefModel = load_reference_dicow()
    cfg = RefConfig(
        vocab_size=51866, num_mel_bins=128, d_model=64,
        encoder_layers=32, decoder_layers=4,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=448,
        decoder_start_token_id=50258, eos_token_id=50257,
        pad_token_id=50257, bos_token_id=50257,
        ctc_weight=0.3, use_fddt=True, use_initial_fddt=True,
        fddt_is_diagonal=True, non_target_fddt_value=0.5,
        additional_self_attention_layer=True, pre_ctc_sub_sample=True,
    )
    import torch

    torch.manual_seed(0)
    model = RefModel(cfg)
    sd = {k: v.detach().cpu().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return cfg, sd


@needs_reference
def test_dicow_v3_turbo_key_space_roundtrip():
    """Every key the reference model exports is consumed by hf_to_params
    and re-emitted by params_to_hf (no silent drops either way)."""
    pytest.importorskip("torch")
    from ts_asr_whisper_tpu.models.config import DiCoWConfig
    from ts_asr_whisper_tpu.models.convert import hf_to_params, params_to_hf

    ref_cfg, sd = _reference_tiny_turbo_state_dict()
    cfg = DiCoWConfig(
        vocab_size=51866, num_mel_bins=128, d_model=64,
        encoder_layers=32, decoder_layers=4,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=448,
        decoder_start_token_id=50258, eos_token_id=50257,
        pad_token_id=50257, bos_token_id=50257,
        ctc_weight=0.3, use_fddt=True, use_pre_pos_fddt=True,
        fddt_is_diagonal=True, non_target_fddt_value=0.5,
        additional_self_attention_layer=True, pre_ctc_sub_sample=True,
        dtype="float32")
    params = hf_to_params(sd, cfg)
    back = params_to_hf(params, cfg)
    missing = sorted(set(sd) - set(back))
    extra = sorted(set(back) - set(sd))
    assert not missing, f"keys dropped by the roundtrip: {missing[:10]}"
    assert not extra, f"keys invented by the roundtrip: {extra[:10]}"
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


@needs_reference
def test_smoke_decode_on_dicow_v3_shaped_checkpoint(tmp_path, capsys):
    """scripts/smoke_decode.py runs UNMODIFIED on a checkpoint dir holding
    the reference-shaped safetensors + the reference's real
    generation_config.json — the exact flow for the BASELINE.md accuracy
    column once real weights exist."""
    pytest.importorskip("torch")
    from ts_asr_whisper_tpu.data.audio import save_wav
    from ts_asr_whisper_tpu.models.convert import save_safetensors

    _, sd = _reference_tiny_turbo_state_dict()
    model_dir = tmp_path / "DiCoW_v3_shaped"
    model_dir.mkdir()
    save_safetensors(sd, str(model_dir / "model.safetensors"))
    with open(model_dir / "config.json", "w") as f:
        json.dump({
            "vocab_size": 51866, "num_mel_bins": 128, "d_model": 64,
            "encoder_layers": 32, "decoder_layers": 4,
            "encoder_attention_heads": 4, "decoder_attention_heads": 4,
            "encoder_ffn_dim": 128, "decoder_ffn_dim": 128,
            "max_source_positions": 1500, "max_target_positions": 448,
            "decoder_start_token_id": 50258, "eos_token_id": 50257,
            "pad_token_id": 50257, "bos_token_id": 50257,
            "ctc_weight": 0.3, "use_fddt": True, "use_pre_pos_fddt": True,
            "fddt_is_diagonal": True, "non_target_fddt_value": 0.5,
            "additional_self_attention_layer": True,
            "pre_ctc_sub_sample": True,
        }, f)
    shutil.copy(REF_GEN_JSON, model_dir / "generation_config.json")

    # one tiny 2-speaker recording
    sr = 16000
    rng = np.random.default_rng(0)
    n = sr * 6
    t = np.arange(n) / sr
    wav = (0.1 * np.sin(2 * np.pi * 220 * t)
           + 0.02 * rng.standard_normal(n)).astype(np.float32)
    save_wav(str(tmp_path / "rec.wav"), wav, sr)
    rec = {"id": "rec", "sources": [{"type": "file", "channels": [0],
                                     "source": str(tmp_path / "rec.wav")}],
           "sampling_rate": sr, "num_samples": n, "duration": 6.0}
    sups = [{"id": "rec-A", "recording_id": "rec", "start": 0.5,
             "duration": 2.0, "channel": 0, "text": "hello world",
             "speaker": "A", "language": "en"},
            {"id": "rec-B", "recording_id": "rec", "start": 3.0,
             "duration": 2.0, "channel": 0, "text": "thank you",
             "speaker": "B", "language": "en"}]
    cutset = tmp_path / "cuts.jsonl.gz"
    with gzip.open(cutset, "wt") as f:
        f.write(json.dumps({"id": "rec_cut", "start": 0.0, "duration": 6.0,
                            "channel": 0, "supervisions": sups,
                            "recording": rec, "type": "MonoCut"}) + "\n")

    spec = importlib.util.spec_from_file_location(
        "smoke_decode",
        Path(__file__).parent.parent / "scripts" / "smoke_decode.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.main([
        "--model-dir", str(model_dir),
        "--cutset", str(cutset),
        "--output-dir", str(tmp_path / "out"),
        "--batch", "2",
        "--max-length", "32",
        "--dtype", "float32",
        "--text-norm", "null",
    ])
    assert any(k.endswith("tcp_wer") for k in res), res
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert any(k.endswith("tcp_wer") for k in json.loads(line))
