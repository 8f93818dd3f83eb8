#!/usr/bin/env python
"""Merge per-session tcp_wer_hyp.json files into one leaderboard SegLST
(reference utils/generate_emma_submission.py)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pred_dirs", nargs="+", type=Path)
    ap.add_argument("--output", type=Path, default=Path("submission.json"))
    args = ap.parse_args()

    segments = []
    for pred_dir in args.pred_dirs:
        for hyp in sorted(pred_dir.rglob("tcp_wer_hyp.json")):
            with open(hyp) as f:
                segments.extend(json.load(f))
    with open(args.output, "w") as f:
        json.dump(segments, f, indent=2)
    print(f"Wrote {len(segments)} segments to {args.output}")


if __name__ == "__main__":
    main()
