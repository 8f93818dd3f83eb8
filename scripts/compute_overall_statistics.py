#!/usr/bin/env python
"""Merge per-split all_session_wer.csv files into per-language + overall
tcpWER (reference utils/compute_overall_statisctics.py)."""

from __future__ import annotations

import argparse
import csv
import json
from collections import defaultdict
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+", type=Path,
                    help="all_session_wer.csv files (one per split)")
    ap.add_argument("--metric", default="tcp")
    args = ap.parse_args()

    totals = defaultdict(lambda: {"errors": 0.0, "length": 0.0})
    for path in args.csvs:
        with open(path) as f:
            for row in csv.DictReader(f):
                lang = row.get("language", "all")
                for key in (lang, "overall"):
                    totals[key]["errors"] += float(
                        row.get(f"{args.metric}_errors", 0) or 0)
                    totals[key]["length"] += float(
                        row.get(f"{args.metric}_length", 0) or 0)

    out = {k: {"wer": v["errors"] / v["length"] if v["length"] else 0.0, **v}
           for k, v in totals.items()}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
