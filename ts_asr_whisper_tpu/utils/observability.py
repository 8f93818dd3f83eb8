"""Observability: metrics logging + TPU profiling.

The reference reports to wandb (src/utils/general.py:113-135, trainers.py
GradLogger). wandb isn't a dependency here; the equivalents are:
- MetricsLogger: JSONL metrics stream + optional wandb passthrough when the
  package happens to be installed;
- profile_steps: jax.profiler trace context around training steps (the TPU
  answer to the reference's `debug: tpu_metrics_debug` passthrough,
  SURVEY.md §5);
- grad/param norm watching equivalent to GradLogger (trainers.py:19-28).
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Dict, Optional

import jax


class MetricsLogger:
    def __init__(self, output_dir: str, run_name: str = "run",
                 use_wandb: bool = False, project: str = "dicow"):
        self.path = Path(output_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._file = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, name=run_name, id=run_name,
                           resume="allow")
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, float], step: int) -> None:
        rec = {"step": step, "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_predictions(self, hyps, refs, step: int,
                        rows_to_log: int = 10, tag: str = "") -> Path:
        """Eval prediction table (reference write_wandb_pred,
        evaluation.py:37-51): first N (label, hypothesis) string pairs as
        a JSONL artifact next to the metrics stream, mirrored to a wandb
        Table when wandb is live. Returns the artifact path."""
        suffix = f"_{tag}" if tag else ""
        path = self.path.parent / f"eval_predictions{suffix}_step{step}.jsonl"
        rows = [[i, ref, hyp] for i, (hyp, ref) in
                enumerate(zip(hyps, refs)) if i < rows_to_log]
        with open(path, "w") as f:
            for i, ref, hyp in rows:
                f.write(json.dumps({"id": i, "label_str": ref,
                                    "hyp_str": hyp}) + "\n")
        if self._wandb is not None:
            self._wandb.log(
                {f"eval_predictions{suffix}/step_{step}": self._wandb.Table(
                    columns=["id", "label_str", "hyp_str"], data=rows)},
                step=step)
        return path

    def close(self):
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()


@contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir:
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield


def grad_param_norms(grads, params) -> Dict[str, float]:
    """GradLogger equivalent: global + per-top-level-module norms."""
    import optax

    out = {"grad_norm/global": float(optax.global_norm(grads)),
           "param_norm/global": float(optax.global_norm(params))}
    for top, sub in grads.items():
        if isinstance(sub, dict):
            for name, tree in sub.items():
                out[f"grad_norm/{top}.{name}"] = float(optax.global_norm(tree))
    return out
