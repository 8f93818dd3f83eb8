"""REAL multi-process distributed execution tests.

The reference's operational mode is 8 coordinated processes under torchrun
(/root/reference/scripts/submit_slurm.sh:34) with cross-rank metric
broadcast (src/utils/evaluation.py:290). These tests spawn 2+ actual
OS processes that join a jax.distributed coordination service (CPU
backend, Gloo collectives) and verify:

- parallel/dist.py initialize / barrier / broadcast_from_main /
  gather_from_processes against live cross-process traffic;
- a 2-process DP train step over the GLOBAL mesh is bit-equal to the
  single-process run on the same global batch;
- a 2-process long-form eval shards batches across ranks, gathers
  predictions, scores on rank 0 only, and broadcasts identical metrics
  to every rank;
- scripts/submit_tpu.sh --local-procs spawns correctly-enumerated
  coordinated processes.

Workers run tests/mp_worker.py; each gets its own virtual CPU device
count via xla_force_host_platform_device_count, so 2 procs x 2 devices
exercise a 4-device global mesh split across process boundaries.
"""

import gzip
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
WORKER = REPO / "tests" / "mp_worker.py"


class Boom(Exception):
    """Module-level so a forked dataloader worker can pickle it back."""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(mode: str, outdir: Path, nproc: int, ndev: int,
           args: dict | None = None, timeout: int = 600) -> list:
    """Run ``nproc`` workers; returns [rank0.json, rank1.json, ...]."""
    outdir.mkdir(parents=True, exist_ok=True)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pin their own device count
    procs = []
    for pid in range(nproc):
        cmd = [sys.executable, str(WORKER), mode, str(outdir), str(port),
               str(pid), str(nproc), str(ndev)]
        if args is not None:
            cmd.append(json.dumps(args))
        procs.append(subprocess.Popen(
            cmd, cwd=str(REPO), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker failed (rc={p.returncode}):\n{out.decode()[-4000:]}")
    results = []
    for pid in range(nproc):
        with open(outdir / f"rank{pid}.json") as f:
            results.append(json.load(f))
    return results


def test_two_process_primitives(tmp_path):
    """initialize + barrier + broadcast + gather across 2 live processes."""
    r0, r1 = _spawn("primitives", tmp_path, nproc=2, ndev=2)
    for r in (r0, r1):
        assert r["world"] == 2
        assert r["n_local_devices"] == 2
        assert r["n_global_devices"] == 4
        # rank 0's object (strings, nesting and all) won everywhere
        assert r["broadcast"] == {"metric": 41.5, "name": "tcp_wer",
                                  "sessions": ["a", "b"],
                                  "nested": {"x": 2}}
        # gather is rank-indexed and complete on EVERY rank
        assert r["gathered"] == [{"rank": 0, "tag": "p0"},
                                 {"rank": 1, "tag": "p1"}]
        # uneven ~100k/200k payloads survive the pad-to-max gather intact
        assert r["big_ok"] == [True, True]
    # round-robin shards partition [0, 10)
    assert sorted(r0["shard"] + r1["shard"]) == list(range(10))
    assert not set(r0["shard"]) & set(r1["shard"])


def test_two_process_dp_train_step_matches_single_process(tmp_path):
    """3 DP train steps, 2 procs x 2 devices vs 1 proc x 4 devices: the
    same global batch must produce bit-equal loss + grad-norm."""
    multi = _spawn("train", tmp_path / "mp", nproc=2, ndev=2)
    single = _spawn("train", tmp_path / "sp", nproc=1, ndev=4)

    assert multi[0]["n_global_devices"] == 4
    assert single[0]["n_global_devices"] == 4
    # both ranks of the multi-process run observe identical replicated
    # metrics (the gradient psum crossed the process boundary)
    assert multi[0]["losses"] == multi[1]["losses"]
    assert multi[0]["grad_norms"] == multi[1]["grad_norms"]
    # and they equal the single-process reference bit-for-bit; losses at
    # steps 2-3 depend on steps 1-2's applied updates, so bit-equality
    # across all 3 steps proves the cross-process gradient psum produced
    # bit-identical parameter updates
    assert multi[0]["losses"] == single[0]["losses"], (
        multi[0]["losses"], single[0]["losses"])
    # the grad-NORM metric reduces sum-of-squares over a different XLA
    # collective schedule across process boundaries: equal to 1e-6 rel,
    # not bitwise (the updates themselves are, per the loss check above)
    np.testing.assert_allclose(multi[0]["grad_norms"],
                               single[0]["grad_norms"], rtol=1e-6)
    # training actually progressed (loss changed across steps)
    assert len(set(multi[0]["losses"])) > 1


def test_two_process_zero_sharded_train_step(tmp_path):
    """ZeRO-style param sharding across the PROCESS boundary (each host
    owns only its shard of the layer-stacked leaves): loss must match the
    unsharded 2-process run to fp32 reduction tolerance."""
    plain = _spawn("train", tmp_path / "plain", nproc=2, ndev=2)
    zero = _spawn("train", tmp_path / "zero", nproc=2, ndev=2,
                  args={"zero": True})
    assert zero[0]["losses"] == zero[1]["losses"]
    np.testing.assert_allclose(zero[0]["losses"], plain[0]["losses"],
                               rtol=1e-5)
    np.testing.assert_allclose(zero[0]["grad_norms"], plain[0]["grad_norms"],
                               rtol=1e-5)


# -- 2-process long-form eval (decode_only) ---------------------------------

SR = 16000


def _make_eval_corpus(tmp: Path) -> dict:
    """3 eval recordings -> 3 eval batches at bs=1, so BOTH ranks decode."""
    from ts_asr_whisper_tpu.data.audio import save_wav

    rng = np.random.default_rng(0)
    cuts = []
    for i in range(3):
        rec_id = f"ev{i}"
        n = int(SR * 6.0)
        t = np.arange(n) / SR
        wav = (0.1 * np.sin(2 * np.pi * (200 + 30 * i) * t)
               + 0.02 * rng.standard_normal(n)).astype(np.float32)
        save_wav(str(tmp / f"{rec_id}.wav"), wav, SR)
        rec = {"id": rec_id,
               "sources": [{"type": "file", "channels": [0],
                            "source": str(tmp / f"{rec_id}.wav")}],
               "sampling_rate": SR, "num_samples": n, "duration": 6.0}
        sups = [{"id": f"{rec_id}-A", "recording_id": rec_id, "start": 0.5,
                 "duration": 2.0, "channel": 0,
                 "text": "hello world how are you", "speaker": "spkA",
                 "language": "en"},
                {"id": f"{rec_id}-B", "recording_id": rec_id, "start": 3.0,
                 "duration": 2.0, "channel": 0,
                 "text": "fine thank you very much", "speaker": "spkB",
                 "language": "en"}]
        cuts.append({"id": f"{rec_id}_cut", "start": 0.0, "duration": 6.0,
                     "channel": 0, "supervisions": sups, "recording": rec,
                     "type": "MonoCut"})
    manifest = tmp / "eval_cutset.jsonl.gz"
    with gzip.open(manifest, "wt") as f:
        for c in cuts:
            f.write(json.dumps(c) + "\n")

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
    return {"manifest": manifest, "model": model_dir}


def _eval_overrides(corpus: dict, out_dir: Path) -> list:
    return [
        f"model.whisper_model={corpus['model']}",
        f"data.eval_cutsets=[{corpus['manifest']}]",
        "data.use_timestamps=true",
        "data.eval_text_norm=null",
        "model.dtype=float32",
        "training.decode_only=true",
        "training.per_device_eval_batch_size=1",
        "training.generation_max_length=40",
        "training.dataloader_num_workers=1",
        f"training.output_dir={out_dir}",
    ]


def test_two_process_eval_rank0_scores_and_broadcasts(tmp_path):
    corpus = _make_eval_corpus(tmp_path)
    out_mp = tmp_path / "exp_mp"
    multi = _spawn("eval", tmp_path / "mp", nproc=2, ndev=1,
                   args={"overrides": _eval_overrides(corpus, out_mp)})
    out_sp = tmp_path / "exp_sp"
    single = _spawn("eval", tmp_path / "sp", nproc=1, ndev=1,
                    args={"overrides": _eval_overrides(corpus, out_sp)})

    # batches were sharded round-robin and BOTH processes decoded
    # (3 recordings x 2 speakers = 6 (cut, spk) eval items at bs=1)
    assert multi[0]["decoded_batches"] == [0, 2, 4]
    assert multi[1]["decoded_batches"] == [1, 3, 5]
    assert single[0]["decoded_batches"] == [0, 1, 2, 3, 4, 5]
    # rank 0 scored, and the broadcast metrics are identical on every rank
    assert multi[0]["metrics"] == multi[1]["metrics"]
    assert any(k.endswith("tcp_wer") for k in multi[0]["metrics"])
    # sharded decode + gather reproduces the single-process metrics
    assert multi[0]["metrics"] == single[0]["metrics"]
    # only rank 0 wrote session outputs (hyp jsons, CSVs)
    assert list(out_mp.rglob("all_session_wer.csv"))


def test_submit_tpu_sh_local_procs(tmp_path):
    """The launcher spawns N coordinated local processes with correct
    JAX_* enumeration (and `bash -n` parses)."""
    script = REPO / "scripts" / "submit_tpu.sh"
    subprocess.run(["bash", "-n", str(script)], check=True)

    stub = tmp_path / "stub.py"
    stub.write_text(
        "import json, os, sys\n"
        "pid = os.environ['JAX_PROCESS_ID']\n"
        "out = {k: os.environ.get(k) for k in\n"
        "       ('JAX_COORDINATOR_ADDRESS', 'JAX_NUM_PROCESSES',\n"
        "        'JAX_PROCESS_ID')}\n"
        "out['argv'] = sys.argv[1:]\n"
        f"json.dump(out, open(r'{tmp_path}' + f'/env{{pid}}.json', 'w'))\n")
    # PYTHON=<stub runner> makes main.py a no-op env recorder: the test
    # exercises the launcher's process spawning, not a full training run
    runner = tmp_path / "python_stub.sh"
    runner.write_text(f"#!/bin/sh\nshift\nexec {sys.executable} {stub} \"$@\"\n")
    runner.chmod(0o755)

    env = dict(os.environ, PYTHON=str(runner),
               JAX_COORDINATOR_PORT=str(_free_port()))
    subprocess.run(
        ["bash", str(script), "--local-procs", "2", "--",
         "+decode=dicow_v3_greedy", "training.output_dir=/tmp/x"],
        cwd=str(REPO), env=env, check=True, timeout=60)
    envs = []
    for pid in range(2):
        with open(tmp_path / f"env{pid}.json") as f:
            envs.append(json.load(f))
    assert envs[0]["JAX_PROCESS_ID"] == "0"
    assert envs[1]["JAX_PROCESS_ID"] == "1"
    for e in envs:
        assert e["JAX_NUM_PROCESSES"] == "2"
        assert e["JAX_COORDINATOR_ADDRESS"].startswith("localhost:")
        assert e["argv"] == ["+decode=dicow_v3_greedy",
                             "training.output_dir=/tmp/x"]


def test_dataloader_process_slices_partition_global_batch():
    """Per-process DataLoader slices reassemble the single-process batch
    stream exactly (in-process check, no spawning)."""
    from ts_asr_whisper_tpu.training.dataloader import DataLoader

    data = [{"x": np.full((2,), i, np.float32)} for i in range(16)]

    def collate(samples):
        return {"x": np.stack([s["x"] for s in samples])}

    def batches(loader, n):
        it = iter(loader)
        return [next(it) for _ in range(n)]

    kw = dict(collate_fn=collate, batch_size=8, seed=3, num_workers=1,
              num_epochs=1)
    full = batches(DataLoader(data, **kw), 2)
    p0 = batches(DataLoader(data, process_index=0, process_count=2, **kw), 2)
    p1 = batches(DataLoader(data, process_index=1, process_count=2, **kw), 2)
    for b_full, b0, b1 in zip(full, p0, p1):
        np.testing.assert_array_equal(
            b_full["x"], np.concatenate([b0["x"], b1["x"]]))

    with pytest.raises(ValueError, match="divide evenly"):
        DataLoader(data, process_index=0, process_count=3, **kw)
    with pytest.raises(ValueError, match="drop_last"):
        DataLoader(data, process_index=0, process_count=2,
                   drop_last=False, **kw)


def test_process_workers_match_thread_workers():
    """Forked-process loading (the torch dataloader_num_workers equivalent
    for multi-core featurization) yields the identical ordered batch
    stream, and worker exceptions propagate to the consumer."""
    from ts_asr_whisper_tpu.training.dataloader import DataLoader

    data = [{"x": np.full((3,), i, np.float32)} for i in range(24)]

    def collate(samples):
        return {"x": np.stack([s["x"] for s in samples])}

    kw = dict(collate_fn=collate, batch_size=4, seed=11, num_epochs=2)
    threads = list(DataLoader(data, num_workers=2, **kw))
    procs = list(DataLoader(data, num_workers=3, worker_type="process", **kw))
    assert len(threads) == len(procs) == 12
    for bt, bp in zip(threads, procs):
        np.testing.assert_array_equal(bt["x"], bp["x"])

    def exploding_collate(samples):
        if float(samples[0]["x"][0]) >= 12:
            raise Boom("bad sample")
        return collate(samples)

    loader = DataLoader(data, collate_fn=exploding_collate, batch_size=4,
                        shuffle=False, num_workers=2, num_epochs=1,
                        worker_type="process")
    with pytest.raises(Boom, match="bad sample"):
        list(loader)

    with pytest.raises(ValueError, match="worker_type"):
        DataLoader(data, collate_fn=collate, batch_size=4,
                   worker_type="greenlet")
