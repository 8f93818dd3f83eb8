"""Ops pipeline (SURVEY §3.5): diarize -> RTTM -> hypothesis cutset ->
speaker alignment/DER -> use_diar decode -> offline re-score."""

import gzip
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ts_asr_whisper_tpu.config import load_config
from ts_asr_whisper_tpu.data.audio import save_wav

SR = 16000
REPO = Path(__file__).parent.parent


def _corpus(tmp: Path):
    rng = np.random.default_rng(3)
    n = int(SR * 9.0)
    wav = (0.1 * np.sin(2 * np.pi * 330 * np.arange(n) / SR)
           + 0.02 * rng.standard_normal(n)).astype(np.float32)
    save_wav(str(tmp / "meet.wav"), wav, SR)
    rec = {"id": "meet", "sources": [{"type": "file", "channels": [0],
                                      "source": str(tmp / "meet.wav")}],
           "sampling_rate": SR, "num_samples": n, "duration": 9.0}
    sups = [
        {"id": "s1", "recording_id": "meet", "start": 0.5, "duration": 3.0,
         "channel": 0, "text": "alpha beta gamma", "speaker": "spkA",
         "language": "en"},
        {"id": "s2", "recording_id": "meet", "start": 4.0, "duration": 3.0,
         "channel": 0, "text": "delta epsilon", "speaker": "spkB",
         "language": "en"},
    ]
    cut = {"id": "meet_cut", "start": 0.0, "duration": 9.0, "channel": 0,
           "supervisions": sups, "recording": rec, "type": "MonoCut"}
    gt_path = tmp / "gt_cutset.jsonl.gz"
    with gzip.open(gt_path, "wt") as f:
        f.write(json.dumps(cut) + "\n")
    model_dir = tmp / "model"
    model_dir.mkdir()
    with open(model_dir / "config.json", "w") as f:
        json.dump({"vocab_size": 2000, "num_mel_bins": 80, "d_model": 32,
                   "encoder_layers": 2, "decoder_layers": 2,
                   "encoder_attention_heads": 2, "decoder_attention_heads": 2,
                   "encoder_ffn_dim": 64, "decoder_ffn_dim": 64,
                   "max_source_positions": 1500,
                   "max_target_positions": 64}, f)
    return gt_path, model_dir


def _run(script, *args):
    out = subprocess.run([sys.executable, str(REPO / "scripts" / script),
                          *map(str, args)], capture_output=True, text=True,
                         timeout=300)
    assert out.returncode == 0, f"{script} failed:\n{out.stderr[-1500:]}"
    return out.stdout


def test_diarize_rttm_align_decode_rescore(tmp_path):
    gt_path, model_dir = _corpus(tmp_path)

    # 1. oracle diarization -> RTTM
    rttm_dir = tmp_path / "rttm"
    _run("diarize.py", gt_path, rttm_dir, "--backend", "oracle")
    rttm = (rttm_dir / "meet.rttm").read_text()
    assert "SPEAKER meet" in rttm and "spkA" in rttm

    # 2. RTTM -> hypothesis cutset (speakers renamed '<rec>_<spk>')
    diar_cutset = tmp_path / "diar_cutset.jsonl.gz"
    _run("prepare_diar_cutset_from_rttm_dir.py", rttm_dir, gt_path, diar_cutset)

    # 3. DER + optimal speaker alignment back to reference names
    aligned = tmp_path / "diar_aligned.jsonl.gz"
    out = _run("compute_der_between_cutsets.py", gt_path, diar_cutset,
               "--align-output", aligned)
    stats = json.loads(out)
    assert stats["overall_der"] < 0.05  # oracle diarization ~ perfect
    from ts_asr_whisper_tpu.data.manifests import load_manifest

    aligned_cs = load_manifest(aligned)
    assert set(aligned_cs[0].speakers) == {"spkA", "spkB"}

    # 4. decode with use_diar: diar cutset drives STNO, GT is the reference
    out_dir = tmp_path / "dec"
    cfg = load_config([
        f"model.whisper_model={model_dir}",
        "data.train_cutsets=[]", "data.dev_cutsets=[]",
        f"data.eval_cutsets=[{gt_path}]",
        "data.use_diar=true",
        f"data.eval_diar_cutsets=[{aligned}]",
        "data.use_timestamps=true",
        "data.train_text_norm=null", "data.eval_text_norm=null",
        "model.ctc_weight=0.0", "model.dtype=float32",
        "training.decode_only=true",
        "training.per_device_eval_batch_size=2",
        "training.generation_max_length=40",
        f"training.output_dir={out_dir}",
    ], n_devices=1)
    cfg.training.mesh_shape = [1]
    from ts_asr_whisper_tpu.train import ModelTrainer

    metrics = ModelTrainer(cfg).train()
    assert any(k.endswith("tcp_wer") for k in metrics), metrics

    # 5. offline re-score of the decode outputs
    pred_dirs = list(out_dir.rglob("all_session_wer.csv"))
    assert pred_dirs
    rescore_out = _run("score.py", pred_dirs[0].parent,
                       "--metrics", "tcp_wer", "--workers", "1")
    res = json.loads(rescore_out)
    assert "tcp_wer" in res


def test_emma_submission_and_overall_stats(tmp_path):
    """scripts: merge hyp JSONs into a submission; merge CSVs into stats."""
    wer_dir = tmp_path / "pred" / "wer" / "sess1"
    wer_dir.mkdir(parents=True)
    hyp = [{"session_id": "sess1", "start_time": 0.0, "end_time": 1.0,
            "words": "hello", "speaker": "A"}]
    with open(wer_dir / "tcp_wer_hyp.json", "w") as f:
        json.dump(hyp, f)
    out = tmp_path / "submission.json"
    _run("generate_emma_submission.py", tmp_path / "pred", "--output", out)
    assert json.load(open(out)) == hyp

    csv_path = tmp_path / "all_session_wer.csv"
    csv_path.write_text(
        "session_id,tcp_errors,tcp_length,language\n"
        "s1,2,10,en\ns2,3,10,de\n")
    stats = json.loads(_run("compute_overall_statistics.py", csv_path))
    assert abs(stats["overall"]["wer"] - 0.25) < 1e-9
    assert abs(stats["en"]["wer"] - 0.2) < 1e-9
