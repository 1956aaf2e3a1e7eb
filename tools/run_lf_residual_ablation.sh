#!/usr/bin/env bash
# Residual-LF ablation on the task-cycle corpus: does LFConfig.residual
# (logit-space correction to the saliency channel, zero-init out_conv —
# models/lf.py) close the converged-LF vs saliency-head argmax gap the
# round-3 ablation measured (plain LF 14.03 deg AAE vs saliency 13.59,
# docs/STATUS_r3.md)? Trains SP+AT ONCE, then trains a plain and a
# residual LF head from the same frozen modules with the SAME budget,
# and rollout-evals every head on held-out seeds.
#
#   bash tools/run_lf_residual_ablation.sh [save_dir] [K] [V] [LF_EPOCHS]
set -euo pipefail
SD="${1:-save_lfres}"
K="${2:-3}"
V="${3:-8}"
LFE="${4:-3}"
COMMON=(--synthetic --synthetic_blobs "$K" --synthetic_videos "$V"
        --batch_size 32 --save_dir "$SD")
LFCOMMON=("${COMMON[@]}" --train_late --lf_rollout 8 --lf_padding edge
          --epochs "$LFE" --steps_per_epoch 100)
mkdir -p "$SD/ablation"

echo "== stage 1: SP (shared)"
python -m gaze_tpu.cli "${COMMON[@]}" --train_sp \
  --epochs 3 --steps_per_epoch 200 --eval_every 100 \
  2>&1 | tee "$SD/ablation/sp.log"

echo "== stage 2: AT LSTM (shared)"
python -m gaze_tpu.cli "${COMMON[@]}" --train_lstm \
  --epochs 30 --seq_len 8 \
  2>&1 | tee "$SD/ablation/at.log"

echo "== stage 3a: plain LF head (edge pad), $LFE epochs"
python -m gaze_tpu.cli "${LFCOMMON[@]}" --lf_ckpt "$SD/lf_plain" \
  2>&1 | tee "$SD/ablation/lf_plain.log"

echo "== stage 3b: residual LF head (edge pad), same budget"
python -m gaze_tpu.cli "${LFCOMMON[@]}" --lf_residual \
  --lf_ckpt "$SD/lf_resid" 2>&1 | tee "$SD/ablation/lf_resid.log"

echo "== eval: single heads"
for MAP in saliency attention; do
  python -m gaze_tpu.cli "${COMMON[@]}" --eval --eval_map "$MAP" \
    2>&1 | tee "$SD/ablation/eval_${MAP}.log"
done

echo "== eval: plain vs residual LF heatmap"
python -m gaze_tpu.cli "${COMMON[@]}" --eval --eval_map heatmap \
  --lf_padding edge --lf_ckpt "$SD/lf_plain" \
  2>&1 | tee "$SD/ablation/eval_lf_plain.log"
python -m gaze_tpu.cli "${COMMON[@]}" --eval --eval_map heatmap \
  --lf_padding edge --lf_residual --lf_ckpt "$SD/lf_resid" \
  2>&1 | tee "$SD/ablation/eval_lf_resid.log"

echo "== eval: residual LF at INIT (must match the saliency row)"
python -m gaze_tpu.cli "${COMMON[@]}" --eval --eval_map heatmap \
  --lf_padding edge --lf_residual --lf_ckpt "$SD/lf_fresh_unused" \
  2>&1 | tee "$SD/ablation/eval_lf_resid_init.log"

echo "== summary"
for f in "$SD"/ablation/eval_*.log; do
  echo "--- $f"; tail -1 "$f"
done
