#!/usr/bin/env python
"""RTTM dir -> hypothesis cutset: attach diarization-hypothesis supervisions
onto an original cutset (reference utils/prepare_diar_cutset_from_rttm_dir.py).

RTTM lines: SPEAKER <rec_id> <chan> <start> <dur> <NA> <NA> <spk> <NA> <NA>.
Speaker fields are rewritten to '<rec_id>_<spk>' so speakers stay unique
across recordings (reference main:10-55).
"""

from __future__ import annotations

import argparse
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def read_rttm(path: Path):
    segs = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] != "SPEAKER":
                continue
            segs.append({"recording_id": parts[1], "start": float(parts[3]),
                         "duration": float(parts[4]), "speaker": parts[7]})
    return segs


def main():
    from ts_asr_whisper_tpu.data.manifests import (
        CutSet,
        SupervisionSegment,
        load_manifest,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("rttm_dir", type=Path)
    ap.add_argument("cutset", type=Path)
    ap.add_argument("output", type=Path)
    args = ap.parse_args()

    rttm_by_rec = {}
    for rttm in sorted(args.rttm_dir.glob("*.rttm")):
        for seg in read_rttm(rttm):
            rttm_by_rec.setdefault(seg["recording_id"], []).append(seg)

    cutset = load_manifest(args.cutset)
    out_cuts = []
    for cut in cutset:
        rec_id = cut.recording_id
        segs = rttm_by_rec.get(rec_id, [])
        sups = [SupervisionSegment(
            id=f"{rec_id}-diar-{i}", recording_id=rec_id,
            start=s["start"], duration=s["duration"],
            speaker=f"{rec_id}_{s['speaker']}", text="")
            for i, s in enumerate(segs)]
        cut.supervisions = sups
        out_cuts.append(cut)
    CutSet(out_cuts).to_file(args.output)
    print(f"Wrote {len(out_cuts)} cuts to {args.output}")


if __name__ == "__main__":
    main()
