"""Single-chip train-step batch-ceiling probe (docs/PERFORMANCE.md #5).

Attempts to compile+run the large-v3-turbo fine-tune train step (the
exact program `bench.py::_bench_train_step` times: decoder frozen, bf16
Adam mu, donated buffers) at increasing per-chip batch sizes and reports,
per batch, samples/s if it runs or the compile failure otherwise. (The
7.38 GB args / 10.41 GB temps breakdown quoted in docs/PERFORMANCE.md #5
came from `step_fn.lower(...).compile().memory_analysis()` on the same
program at batch 8.)

r04 result on the 16 GB v5e (fused flash attention, `attn` remat):
batch 8 = 7.22 samples/s (args 7.38 GB resident + 10.41 GB peak
temporaries), batch 10 = 7.00 samples/s (fits, but absolute throughput
DROPS — batch 8 is the single-chip optimum), batch 12 fails at compile.
With XLA attention, batch 10 also fails to compile and batch 8 runs
~4.5 samples/s. Larger global batch belongs to the data mesh axis +
ZeRO (`training.shard_params=true`), which needs >=2 devices.
Reference envelope being matched: 96 global / 8 devices
(/root/reference/configs/train/dicow_v3.yaml:56-67).

    python scripts/probe_train_batch.py [--batches 8 10 12]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 10, 12])
    args = ap.parse_args()

    import jax

    import bench
    from ts_asr_whisper_tpu.ops.attention import set_attention_impl

    if jax.default_backend() == "tpu":
        # same configuration bench.main() times: fused flash fwd+bwd
        set_attention_impl("pallas")

    for b in args.batches:
        try:
            rates, _dev_ms = bench._bench_train_step(batch=b)
            print(json.dumps({
                "batch": b, "ok": True,
                "samples_per_s": round(statistics.median(rates), 2),
                "spread": round(max(rates) - min(rates), 2)}))
        except Exception as e:  # compile-time HBM exhaustion lands here
            print(json.dumps({
                "batch": b, "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:160]}"}))


if __name__ == "__main__":
    main()
