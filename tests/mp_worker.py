"""Multi-process worker for tests/test_multiprocess.py.

Run as a standalone script (NOT collected by pytest):

    python tests/mp_worker.py MODE OUTDIR PORT PID NPROC NDEV [ARGS_JSON]

Each worker pins NDEV virtual CPU devices, joins the jax.distributed
coordination service at localhost:PORT (unless NPROC == 1), runs MODE and
writes ``rank<PID>.json`` into OUTDIR. Modes:

- ``primitives``: barrier + broadcast_from_main (arbitrary object) +
  gather_from_processes + shard_indices_by_process;
- ``train``: 3 deterministic DP train steps on a tiny DiCoW over the
  GLOBAL mesh, each process feeding its local batch rows — the
  single-process (NPROC=1) run of the same mode is the bit-equality
  reference;
- ``eval``: full ModelTrainer decode_only on a parent-built corpus
  (ARGS_JSON = {"overrides": [...]}) — exercises process-sharded eval
  batches, prediction gather, rank-0 scoring, metric broadcast.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode, outdir, port, pid, nproc, ndev = sys.argv[1:7]
    pid, nproc, ndev = int(pid), int(nproc), int(ndev)
    args = json.loads(sys.argv[7]) if len(sys.argv) > 7 else {}

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}").strip()
    os.environ["TSAW_XLA_CACHE"] = "0"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from ts_asr_whisper_tpu.parallel import dist

    if nproc > 1:
        dist.initialize(f"localhost:{port}", nproc, pid)
    assert dist.world_size() == nproc, (dist.world_size(), nproc)
    assert dist.get_rank() == pid

    result = {"rank": pid, "world": dist.world_size(),
              "n_local_devices": jax.local_device_count(),
              "n_global_devices": jax.device_count()}
    result.update(MODES[mode](pid, nproc, args))

    with open(os.path.join(outdir, f"rank{pid}.json"), "w") as f:
        json.dump(result, f, default=float)


def run_primitives(pid, nproc, args):
    from ts_asr_whisper_tpu.parallel import dist

    dist.barrier("start")
    payload = ({"metric": 41.5, "name": "tcp_wer",
                "sessions": ["a", "b"], "nested": {"x": 2}}
               if pid == 0 else None)
    got = dist.broadcast_from_main(payload)
    gathered = dist.gather_from_processes({"rank": pid, "tag": f"p{pid}"})
    # uneven large payloads: rank r ships ~(r+1)*100k chars, so the
    # fixed-width gather must pad rank 0's pickle and trim it back
    big = dist.gather_from_processes("x" * ((pid + 1) * 100_000))
    big_ok = [len(s) == (r + 1) * 100_000 and set(s) == {"x"}
              for r, s in enumerate(big)]
    shard = dist.shard_indices_by_process(10)
    dist.barrier("end")
    return {"broadcast": got, "gathered": gathered, "shard": shard,
            "big_ok": big_ok}


def _tiny_cfg():
    from ts_asr_whisper_tpu.models.config import DiCoWConfig

    return DiCoWConfig(
        vocab_size=1700, num_mel_bins=24, d_model=64,
        encoder_layers=8, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=48, max_target_positions=32,
        decoder_start_token_id=31, eos_token_id=30,
        pad_token_id=30, bos_token_id=30, dtype="float32",
        ctc_weight=0.3, use_fddt=True, use_pre_pos_fddt=True)


def _global_batch(step, b=8):
    import numpy as np

    rng = np.random.default_rng(100 + step)
    labels = np.concatenate(
        [rng.integers(0, 150, (b, 10)).astype(np.int32),
         np.full((b, 2), -100, np.int32)], axis=1)
    return {
        "input_features": rng.standard_normal((b, 24, 96)).astype(np.float32),
        "stno_mask": np.full((b, 4, 48), 0.25, np.float32),
        "labels": labels,
        "upp_labels": labels.copy(),
    }


def run_train(pid, nproc, args):
    import jax

    from ts_asr_whisper_tpu.config import Cfg
    from ts_asr_whisper_tpu.models.dicow import init_dicow
    from ts_asr_whisper_tpu.parallel import dist
    from ts_asr_whisper_tpu.parallel.mesh import (
        make_mesh, param_shardings, shard_batch)
    from ts_asr_whisper_tpu.training.optim import build_optimizer
    from ts_asr_whisper_tpu.training.trainer import make_train_step

    mcfg = _tiny_cfg()
    mesh = make_mesh()  # every device across every process
    params = init_dicow(jax.random.PRNGKey(0), mcfg)
    # ZeRO-style sharding splits layer-stacked leaves ACROSS the process
    # boundary (each host owns only its shard of every such leaf)
    shardings = param_shardings(params, mesh,
                                shard_params=bool(args.get("zero")))
    params = jax.tree.map(
        lambda p, s: jax.make_array_from_callback(
            p.shape, s, lambda idx: p[idx]), params, shardings)

    cfg = Cfg()
    cfg.training.use_custom_optimizer = True
    cfg.training.warmup_steps = 0
    tx, opt_state = build_optimizer(params, cfg.training,
                                    prefixes_to_preheat=["encoder/fddts"],
                                    frozen_keywords=[])
    step_fn, _ = make_train_step(mcfg, tx, num_prefix_tokens=2)

    losses, gnorms = [], []
    local = 8 // nproc
    for step in range(3):
        full = _global_batch(step)
        mine = {k: v[pid * local:(pid + 1) * local] for k, v in full.items()}
        batch = shard_batch(mine, mesh)
        params, opt_state, parts = step_fn(params, opt_state, batch)
        losses.append(float(parts["loss"]))
        gnorms.append(float(parts["grad_norm"]))
    dist.barrier("train-done")
    return {"losses": losses, "grad_norms": gnorms}


def run_eval(pid, nproc, args):
    from ts_asr_whisper_tpu.config import load_config

    # count which eval batches THIS process collates (proof a second
    # process participates in the sharded decode)
    decoded = []
    import ts_asr_whisper_tpu.train as train_mod
    from ts_asr_whisper_tpu.training.dataloader import (
        eval_batches as real_eval_batches)

    def counting_eval_batches(*a, **kw):
        for bi, batch in real_eval_batches(*a, **kw):
            decoded.append(bi)
            yield bi, batch

    train_mod.eval_batches = counting_eval_batches

    cfg = load_config(list(args["overrides"]), n_devices=1)
    metrics = train_mod.ModelTrainer(cfg).train()
    return {"metrics": {k: float(v) for k, v in metrics.items()},
            "decoded_batches": decoded}


MODES = {"primitives": run_primitives, "train": run_train, "eval": run_eval}


if __name__ == "__main__":
    main()
