#!/usr/bin/env bash
# Task-cycle ablation: train the full SP->AT->LF pipeline on the K-blob
# task-cycle corpus (data/synthetic.py num_blobs>1) and measure how much
# the attention-transition LSTM adds over bottom-up saliency — the
# offline stand-in for the paper's central claim (ECCV'18 Table:
# SP-only vs full model; SURVEY.md §6). On this corpus the per-frame
# cue is weak/unreliable by construction, so a bottom-up-only model
# CANNOT resolve which blob is fixated on uncued segments; the task
# structure (fixed color cycle) is only learnable by the AT LSTM.
#
#   bash tools/run_taskcycle_ablation.sh [save_dir] [K] [V]
#
# Writes per-stage logs + a final JSON-lines summary to $SD/ablation/.
set -euo pipefail
SD="${1:-save_tc3}"
K="${2:-3}"
V="${3:-8}"
COMMON=(--synthetic --synthetic_blobs "$K" --synthetic_videos "$V"
        --batch_size 32 --save_dir "$SD")
mkdir -p "$SD/ablation"

echo "== stage 1: SP (bottom-up saliency on the cued-blob evidence)"
python -m gaze_tpu.cli "${COMMON[@]}" --train_sp \
  --epochs 3 --steps_per_epoch 200 --eval_every 100 \
  2>&1 | tee "$SD/ablation/sp.log"

echo "== stage 2: AT LSTM (learns the color-cycle transition)"
python -m gaze_tpu.cli "${COMMON[@]}" --train_lstm \
  --epochs 30 --seq_len 8 \
  2>&1 | tee "$SD/ablation/at.log"

echo "== stage 3: LF head on gated rollout maps"
python -m gaze_tpu.cli "${COMMON[@]}" --train_late --lf_rollout 8 \
  --epochs 3 --steps_per_epoch 100 \
  2>&1 | tee "$SD/ablation/lf.log"

echo "== eval: sequential rollout on held-out seeds, per-head maps"
for MAP in heatmap saliency attention; do
  python -m gaze_tpu.cli "${COMMON[@]}" --eval --eval_map "$MAP" \
    2>&1 | tee "$SD/ablation/eval_${MAP}.log"
done

echo "== eval: self-tracking AT pooling (at_pool=prediction)"
python -m gaze_tpu.cli "${COMMON[@]}" --eval --at_pool prediction \
  2>&1 | tee "$SD/ablation/eval_atpool_prediction.log"

echo "== summary"
for f in "$SD"/ablation/eval_*.log; do
  echo "--- $f"; tail -1 "$f"
done
