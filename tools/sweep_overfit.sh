#!/bin/bash
# Fixture-overfit recipe sweep (VERDICT r3 item 2).
#
# Two findings shape this sweep:
#  * tools/diagnose_nan.py localized the round-4 overfit NaNs: BPTT through
#    the AR scan explodes (max|grad| 5.6 -> 3e34 within ~6 steps) then
#    overflows — in f32 too, so it is the recurrence, not bf16.
#  * The reference's tf_ratio semantics are INVERTED (decoder.py:355:
#    teacher frame only when rand > tf_ratio AND consumed < tf_ratio*T):
#    tf_ratio=1.0 is fully FREE-RUNNING — the hardest regime, and the one
#    the first sweep wrongly trained in. Teacher-frame fraction peaks at
#    tf_ratio=0.5 (~50% of steps), which is the fast-learning regime; eval
#    (evaluate.py:38, tf=1) is free-running.
#
# Probes precision x lr at fixed tf_ratio=0.5/0.3, 3000 staged-batch steps,
# eval every 500, to pick the long-run recipe.
set -u
cd "$(dirname "$0")/.."
FIXTURE=/root/reference/Datasets/SAMPLE_LRW
run () { # name lr bf16 tf
  echo "=== sweep_$1 lr=$2 bf16=$3 tf=$4 ==="
  timeout 2400 python -m lip2speech_tpu.cli.train \
    --dataset LRW --root "$FIXTURE" --train_split test \
    --batch_size 10 --no_augment --reuse_first_batch \
    --max_iters 3000 --eval_interval 500 --log_interval 200 \
    --run_dir "runs/sweep_$1" --ckpt_dir "checkpoints/sweep_$1" \
    --override "train.learning_rate=$2" \
    --override "train.bf16=$3" \
    --override "train.tf_ratio_start=$4" \
    --override "train.tf_ratio_step=0.0" 2>&1 | grep -v "^WARNING\|^I0000"
}
run a2 2e-4 false 0.5
run b2 5e-4 false 0.5
run c2 2e-4 true  0.5
run d2 2e-4 false 0.3
echo "=== sweep done ==="
