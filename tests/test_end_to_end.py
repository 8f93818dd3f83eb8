"""Full-pipeline integration test: synthesize wav + manifests, then run
train (few steps) and decode+score through the real CLI path."""

import gzip
import json
import os
from pathlib import Path

import numpy as np
import pytest

from ts_asr_whisper_tpu.config import load_config
from ts_asr_whisper_tpu.data.audio import save_wav

SR = 16000


def _make_recording(tmp: Path, rec_id: str, duration: float, rng):
    n = int(SR * duration)
    t = np.arange(n) / SR
    wav = (0.1 * np.sin(2 * np.pi * 220 * t)
           + 0.02 * rng.standard_normal(n)).astype(np.float32)
    path = tmp / f"{rec_id}.wav"
    save_wav(str(path), wav, SR)
    return {
        "id": rec_id,
        "sources": [{"type": "file", "channels": [0], "source": str(path)}],
        "sampling_rate": SR,
        "num_samples": n,
        "duration": duration,
    }


def _cut(rec, cut_id, sups):
    return {
        "id": cut_id,
        "start": 0.0,
        "duration": rec["duration"],
        "channel": 0,
        "supervisions": sups,
        "recording": rec,
        "type": "MonoCut",
    }


def _sup(rec_id, start, dur, text, speaker):
    return {"id": f"{rec_id}-{speaker}-{start}", "recording_id": rec_id,
            "start": start, "duration": dur, "channel": 0, "text": text,
            "speaker": speaker, "language": "en"}


def _write_manifest(path: Path, cuts):
    with gzip.open(path, "wt") as f:
        for c in cuts:
            f.write(json.dumps(c) + "\n")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)

    # train: two short 2-speaker recordings
    train_cuts = []
    for i in range(2):
        rec = _make_recording(tmp, f"train{i}", 8.0, rng)
        sups = [_sup(rec["id"], 0.5, 3.0, "hello world how are you", "spkA"),
                _sup(rec["id"], 4.0, 3.0, "fine thank you very much", "spkB")]
        train_cuts.append(_cut(rec, f"train{i}_cut", sups))
    train_manifest = tmp / "train_cutset_30s.jsonl.gz"
    _write_manifest(train_manifest, train_cuts)

    # eval: one longer recording (forces >1 seek window at tiny context)
    rec = _make_recording(tmp, "eval0", 10.0, rng)
    sups = [_sup(rec["id"], 0.5, 4.0, "good morning to everyone here", "spkA"),
            _sup(rec["id"], 5.0, 4.0, "thanks for coming today folks", "spkB")]
    eval_manifest = tmp / "eval_cutset.jsonl.gz"
    _write_manifest(eval_manifest, [_cut(rec, "eval0_cut", sups)])

    # tiny model dir (config.json only -> random init + byte tokenizer)
    model_dir = tmp / "model"
    model_dir.mkdir()
    with open(model_dir / "config.json", "w") as f:
        json.dump({
            "vocab_size": 2000, "num_mel_bins": 80, "d_model": 32,
            "encoder_layers": 2, "decoder_layers": 2,
            "encoder_attention_heads": 2, "decoder_attention_heads": 2,
            "encoder_ffn_dim": 64, "decoder_ffn_dim": 64,
            "max_source_positions": 1500, "max_target_positions": 64,
        }, f)
    return {"tmp": tmp, "train": train_manifest, "eval": eval_manifest,
            "model": model_dir}


def _base_overrides(corpus, out_dir):
    return [
        f"model.whisper_model={corpus['model']}",
        f"data.train_cutsets=[{corpus['train']}]",
        f"data.dev_cutsets=[{corpus['eval']}]",
        f"data.eval_cutsets=[{corpus['eval']}]",
        "data.use_timestamps=true",
        "data.train_text_norm=null",
        "data.eval_text_norm=null",
        "model.ctc_weight=0.3",
        "model.pre_ctc_sub_sample=true",
        "model.additional_self_attention_layer=true",
        "model.dtype=float32",
        "training.overall_batch_size=2",
        "training.gradient_accumulation_steps=1",
        "training.per_device_eval_batch_size=2",
        "training.generation_max_length=40",
        "training.logging_steps=1",
        "training.eval_strategy=no",
        "training.save_strategy=no",
        "training.use_fddt_only_n_steps=1",
        "training.dataloader_num_workers=1",
        "aug.spec_aug_prob=0.0",
        "aug.stno_segment_augment_prob=0.0",
        f"training.output_dir={out_dir}",
    ]


def test_train_few_steps_and_decode(corpus, tmp_path):
    from ts_asr_whisper_tpu.train import ModelTrainer

    out_dir = tmp_path / "exp"
    cfg = load_config(_base_overrides(corpus, out_dir)
                      + ["training.max_steps=3", "training.store_src=true"],
                      n_devices=1)
    cfg.training.mesh_shape = [1]
    trainer = ModelTrainer(cfg)
    metrics = trainer.train()
    # training ran + final test eval produced tcpWER metrics
    key = [k for k in metrics if k.endswith("tcp_wer")]
    assert key, metrics
    assert (out_dir / "hf_export" / "model.safetensors").exists()
    # store_src artifacts (reference wandb config+src upload equivalent)
    assert (out_dir / "config.yaml").exists()
    assert (out_dir / "src.tar.gz").exists()
    # per-session outputs written
    wer_csvs = list(out_dir.rglob("all_session_wer.csv"))
    assert wer_csvs


def test_decode_only(corpus, tmp_path):
    from ts_asr_whisper_tpu.train import ModelTrainer

    out_dir = tmp_path / "dec"
    cfg = load_config(_base_overrides(corpus, out_dir)
                      + ["training.decode_only=true"], n_devices=1)
    cfg.training.mesh_shape = [1]
    trainer = ModelTrainer(cfg)
    metrics = trainer.train()
    assert any(k.endswith("tcp_wer") for k in metrics)
    # prediction-table artifact (reference wandb tables, evaluation.py:37-51)
    tables = list(out_dir.rglob("eval_predictions.jsonl"))
    assert tables
    row = json.loads(tables[0].read_text().splitlines()[0])
    assert {"session_id", "speaker", "label_str", "hyp_str"} <= set(row)


def test_pretrain_encoder_few_steps(corpus, tmp_path):
    from ts_asr_whisper_tpu.pretrain_encoder import main as pretrain_main

    out_dir = tmp_path / "pre"
    cfg = load_config([
        f"model.whisper_model={corpus['model']}",
        f"data.train_cutsets=[{corpus['train']}]",
        f"data.dev_cutsets=[{corpus['eval']}]",
        "data.use_timestamps=false",
        "data.train_text_norm=null",
        "model.ctc_weight=0.3",
        "model.pre_ctc_sub_sample=true",
        "model.additional_self_attention_layer=true",
        "model.dtype=float32",
        "training.pretrain_encoder=true",
        "training.max_steps=2",
        "training.overall_batch_size=2",
        "training.per_device_train_batch_size=2",
        "training.per_device_eval_batch_size=2",
        "training.logging_steps=1",
        "training.save_strategy=no",
        "training.dataloader_num_workers=1",
        f"training.output_dir={out_dir}",
    ], n_devices=1)
    metrics = pretrain_main(cfg)
    assert any(k.endswith("_wer") for k in metrics), metrics
    assert (out_dir / "hf_export" / "model.safetensors").exists()
    # short-form prediction table (reference write_wandb_pred)
    assert list(out_dir.glob("eval_predictions_*.jsonl"))


@pytest.fixture(scope="module")
def enroll_corpus(tmp_path_factory):
    """Corpus with external-enrollment cutsets for SE-DiCoW."""
    tmp = tmp_path_factory.mktemp("enroll_corpus")
    rng = np.random.default_rng(1)

    train_cuts = []
    for i in range(2):
        rec = _make_recording(tmp, f"tr{i}", 8.0, rng)
        sups = [_sup(rec["id"], 0.5, 3.0, "hello world again", "spkA"),
                _sup(rec["id"], 4.0, 3.0, "yes indeed quite so", "spkB")]
        train_cuts.append(_cut(rec, f"tr{i}_cut", sups))
    train_manifest = tmp / "tr_cutset_30s.jsonl.gz"
    _write_manifest(train_manifest, train_cuts)

    # enrollment cuts: per-speaker clean recordings with DIFFERENT rec ids
    enroll_cuts = []
    for spk in ("spkA", "spkB"):
        for j in range(2):
            rec = _make_recording(tmp, f"enr_{spk}_{j}", 5.0, rng)
            enroll_cuts.append(_cut(
                rec, f"enr_{spk}_{j}_cut",
                [_sup(rec["id"], 0.2, 4.5, "enrollment speech", spk)]))
    enroll_manifest = tmp / "enroll_cutset.jsonl.gz"
    _write_manifest(enroll_manifest, enroll_cuts)

    model_dir = tmp / "model"
    model_dir.mkdir()
    with open(model_dir / "config.json", "w") as f:
        json.dump({
            "vocab_size": 2000, "num_mel_bins": 80, "d_model": 32,
            "encoder_layers": 2, "decoder_layers": 2,
            "encoder_attention_heads": 2, "decoder_attention_heads": 2,
            "encoder_ffn_dim": 64, "decoder_ffn_dim": 64,
            "max_source_positions": 1500, "max_target_positions": 64,
        }, f)
    return {"tmp": tmp, "train": train_manifest, "enroll": enroll_manifest,
            "model": model_dir}


def test_se_dicow_train_and_decode(enroll_corpus, tmp_path):
    from ts_asr_whisper_tpu.train import ModelTrainer

    out_dir = tmp_path / "se"
    # '_external_enrollment' in the path marks mixture synthesis
    ext_path = str(enroll_corpus["train"]).replace(
        "_30s.jsonl.gz", "_30s_external_enrollment.jsonl.gz")
    cfg = load_config([
        f"model.whisper_model={enroll_corpus['model']}",
        f"data.train_cutsets=[{ext_path}]",
        f"data.dev_cutsets=[]",
        f"data.eval_cutsets=[{ext_path}]",
        f"data.enrollment_cutsets=[{enroll_corpus['enroll']}]",
        "data.use_enrollments=true",
        "data.number_of_mixed_speakers=1",
        "data.use_timestamps=true",
        "data.train_text_norm=null",
        "data.eval_text_norm=null",
        "model.use_enrollments=true",
        "model.scb_layers=1",
        "model.ctc_weight=0.0",
        "model.dtype=float32",
        "training.overall_batch_size=2",
        "training.max_steps=2",
        "training.per_device_eval_batch_size=2",
        "training.generation_max_length=40",
        "training.logging_steps=1",
        "training.eval_strategy=no",
        "training.save_strategy=no",
        "training.use_fddt_only_n_steps=0",
        "training.dataloader_num_workers=1",
        "aug.spec_aug_prob=0.0",
        "aug.stno_segment_augment_prob=0.0",
        f"training.output_dir={out_dir}",
    ], n_devices=1)
    cfg.training.mesh_shape = [1]
    trainer = ModelTrainer(cfg)
    metrics = trainer.train()
    assert any(k.endswith("tcp_wer") for k in metrics), metrics


def test_cli_main_decode_only(corpus, tmp_path, monkeypatch):
    """The CLI wrapper (main.py) end to end with +decode-style overrides."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "cli_main", Path(__file__).parent.parent / "main.py")
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    out_dir = tmp_path / "cli"
    metrics = cli.main(_base_overrides(corpus, out_dir)
                       + ["training.decode_only=true"])
    assert any(k.endswith("tcp_wer") for k in metrics)


def test_auto_find_batch_size_halves_on_oom(corpus, tmp_path, monkeypatch):
    """First Trainer.train raises a simulated OOM: the retry must halve the
    per-device batch, double grad accumulation (global batch preserved,
    reference trainers.py:141-168) and complete training."""
    from ts_asr_whisper_tpu import train as train_mod
    from ts_asr_whisper_tpu.train import ModelTrainer

    calls = {"n": 0}
    orig = train_mod.Trainer.train

    def flaky(self, it):
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory while trying to allocate")
        return orig(self, it)

    monkeypatch.setattr(train_mod.Trainer, "train", flaky)
    out_dir = tmp_path / "oom"
    cfg = load_config(_base_overrides(corpus, out_dir) + [
        "training.max_steps=1",
        "training.auto_find_batch_size=true",
    ], n_devices=1)
    cfg.training.mesh_shape = [1]
    assert cfg.training.per_device_train_batch_size == 2
    trainer = ModelTrainer(cfg)
    metrics = trainer.train()
    assert calls["n"] == 1
    assert cfg.training.per_device_train_batch_size == 1
    assert cfg.training.gradient_accumulation_steps == 2
    assert any(k.endswith("tcp_wer") for k in metrics)


def test_smoke_decode_script(corpus, tmp_path, capsys):
    """scripts/smoke_decode.py: HF checkpoint dir + manifest -> tcpWER, the
    exact flow for reproducing BASELINE.md numbers with real weights."""
    import importlib.util
    import json as _json

    import jax

    from ts_asr_whisper_tpu.models.config import DiCoWConfig
    from ts_asr_whisper_tpu.models.dicow import init_dicow
    from ts_asr_whisper_tpu.training.checkpoints import export_hf_checkpoint

    # export a tiny random model in the HF layout (config + safetensors)
    with open(corpus["model"] / "config.json") as f:
        cfg_json = _json.load(f)
    cfg = DiCoWConfig(**cfg_json, dtype="float32")
    params = init_dicow(jax.random.PRNGKey(0), cfg)
    model_dir = tmp_path / "hf_ckpt"
    export_hf_checkpoint(params, cfg, str(model_dir))

    spec = importlib.util.spec_from_file_location(
        "smoke_decode",
        Path(__file__).parent.parent / "scripts" / "smoke_decode.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out_dir = tmp_path / "smoke"
    res = mod.main([
        "--model-dir", str(model_dir),
        "--cutset", str(corpus["eval"]),
        "--output-dir", str(out_dir),
        "--batch", "2",
        "--max-length", "40",
        "--dtype", "float32",
        "--text-norm", "null",
    ])
    assert any(k.endswith("tcp_wer") for k in res), res
    assert list(out_dir.rglob("all_session_wer.csv"))
    # stdout carries the one-line JSON summary
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert any(k.endswith("tcp_wer") for k in _json.loads(line))


def test_train_by_epochs_when_max_steps_unset(corpus, tmp_path):
    """max_steps<=0 = HF's train-by-epochs convention: the step budget is
    derived from num_train_epochs x steps_per_epoch (previously the loop
    exited immediately at step 0)."""
    from ts_asr_whisper_tpu.train import ModelTrainer

    out_dir = tmp_path / "epochs"
    cfg = load_config(_base_overrides(corpus, out_dir) + [
        "training.max_steps=0",
        "training.num_train_epochs=2",
    ], n_devices=1)
    cfg.training.mesh_shape = [1]
    trainer = ModelTrainer(cfg)
    metrics = trainer.train()
    # 2 train cuts x 2 speakers = 4 samples, global batch 2 -> 2 steps/epoch
    assert cfg.training.max_steps == 4
    assert any(k.endswith("tcp_wer") for k in metrics)
