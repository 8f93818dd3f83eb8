#!/usr/bin/env bash
# EMMA submission pipeline (reference scripts/create_emma_submission_dicow.sh):
# diarize -> RTTM -> hypothesis cutsets -> align speakers -> decode with
# use_diar -> merge per-session hypothesis JSONs into one leaderboard SegLST.
#
# Usage: scripts/create_emma_submission.sh <gt_cutset.jsonl.gz> <model_dir> <out_dir> [extra overrides...]
set -euo pipefail

GT=$1; MODEL=$2; OUT=$3; shift 3

mkdir -p "$OUT"
python scripts/diarize.py "$GT" "$OUT/rttm" --backend "${DIAR_BACKEND:-diarizen}"
python scripts/prepare_diar_cutset_from_rttm_dir.py "$OUT/rttm" "$GT" "$OUT/diar_cutset.jsonl.gz"
python scripts/compute_der_between_cutsets.py "$GT" "$OUT/diar_cutset.jsonl.gz" \
  --align-output "$OUT/diar_aligned.jsonl.gz" | tee "$OUT/der.json"

python main.py \
  model.whisper_model="$MODEL" \
  "data.train_cutsets=[]" "data.dev_cutsets=[]" \
  "data.eval_cutsets=[$GT]" \
  data.use_diar=true "data.eval_diar_cutsets=[$OUT/diar_aligned.jsonl.gz]" \
  training.decode_only=true training.output_dir="$OUT/decode" "$@"

python scripts/generate_emma_submission.py "$OUT/decode" --output "$OUT/submission.json"
echo "submission: $OUT/submission.json"
