#!/bin/bash
# Round-5 fixture-overfit evidence campaign (VERDICT r4 item 2).
#
# The round-4 diagnosis, applied: BPTT through the AR scan explodes
# (DESIGN.md "AR-scan BPTT stability") -> scan_grad_clip=1.0 ON;
# huge-but-finite spikes -> reject_grad_norm_above=1e6 ON (NOT lower:
# the HEALTHY from-init global grad norm is ~1.5e4 at loss ~300 — a 1e4
# threshold rejected every step of the first smoke; 1e6 still fires well
# before the 1e34 overflow the round-4 explosion reached); persistent
# stalls -> --rewind_on_stall (with the round-5 never-give-up skip
# wrapper underneath). tf schedule designed for the INVERTED reference
# semantics (decoder.py:355): teacher-frame fraction peaks at
# tf_ratio=0.5, eval is free-running at tf=1.0 — so train starts at 0.5
# (max teacher) and anneals +0.025/1000 steps to 1.0 (free-running) at
# step 20000, then free-runs to the horizon.
#
# Usage: tools/run_overfit_r5.sh [name] [max_iters] [lr]
set -u
cd "$(dirname "$0")/.."
FIXTURE=/root/reference/Datasets/SAMPLE_LRW
NAME="${1:-overfit_r5a}"
ITERS="${2:-40000}"
LR="${3:-2e-4}"
export PYTHONPATH=/root/repo:/root/.axon_site
python -m lip2speech_tpu.cli.train \
  --dataset LRW --root "$FIXTURE" --train_split test \
  --batch_size 10 --no_augment --reuse_first_batch \
  --max_iters "$ITERS" --eval_interval 500 --log_interval 100 \
  --run_dir "runs/$NAME" --ckpt_dir "checkpoints/$NAME" \
  --rewind_on_stall 30 --rewind_lr_decay 0.7 --max_rewinds 25 \
  --override "train.learning_rate=$LR" \
  --override "model.scan_grad_clip=1.0" \
  --override "train.reject_grad_norm_above=1e6" \
  --override "train.tf_ratio_start=0.5" \
  --override "train.tf_ratio_step=0.025" \
  --override "train.tf_ratio_epochs=1000" \
  2>&1 | grep -v "^WARNING\|^I0000"
