#!/usr/bin/env python
"""Diarization adapter: run an external diarization pipeline over a cutset
and emit RTTMs (reference utils/diarizen_diar.py + scripts/diarize.sh).

The reference calls the external DiariZen model; this adapter keeps the same
contract — cutset in, per-recording RTTM out, skip-if-exists idempotency —
with a pluggable backend:
  --backend diarizen   import the external DiariZen pipeline (if installed)
  --backend oracle     derive RTTM from the cutset's own supervisions
                       (ground-truth diarization; useful for oracle decoding)
Mixed cuts are rendered to temporary wavs for the external backend
(reference diarizen_diar.py:22-72).
"""

from __future__ import annotations

import argparse
import tempfile
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def write_rttm(path: Path, rec_id: str, segments):
    with open(path, "w") as f:
        for seg in segments:
            f.write(f"SPEAKER {rec_id} 1 {seg['start']:.3f} "
                    f"{seg['duration']:.3f} <NA> <NA> {seg['speaker']} "
                    f"<NA> <NA>\n")


def main():
    from ts_asr_whisper_tpu.data.manifests import load_manifest

    ap = argparse.ArgumentParser()
    ap.add_argument("cutset", type=Path)
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--backend", choices=["oracle", "diarizen"],
                    default="oracle")
    args = ap.parse_args()
    args.out_dir.mkdir(parents=True, exist_ok=True)

    cutset = load_manifest(args.cutset)
    for cut in cutset:
        rec_id = cut.recording_id
        out = args.out_dir / f"{rec_id}.rttm"
        if out.exists():  # idempotent skip (diarizen_diar.py:36-38)
            continue
        if args.backend == "oracle":
            segs = [{"start": s.start, "duration": s.duration,
                     "speaker": s.speaker} for s in cut.supervisions]
            write_rttm(out, rec_id, segs)
        else:
            try:
                from diarizen.pipelines.inference import (  # type: ignore
                    DiariZenPipeline,
                )
            except ImportError as e:
                raise SystemExit(
                    "DiariZen is not installed; use --backend oracle or "
                    "install the external pipeline") from e
            from ts_asr_whisper_tpu.data.audio import save_wav

            pipeline = DiariZenPipeline.from_pretrained(
                "BUT-FIT/diarizen-wavlm-large-s80-md")
            with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
                audio = cut.load_audio()
                save_wav(tmp.name, audio, cut.sampling_rate)
                diar = pipeline(tmp.name)
            segs = [{"start": turn.start, "duration": turn.end - turn.start,
                     "speaker": label}
                    for turn, _, label in diar.itertracks(yield_label=True)]
            write_rttm(out, rec_id, segs)
    print(f"RTTMs in {args.out_dir}")


if __name__ == "__main__":
    main()
