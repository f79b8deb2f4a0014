"""Overfit the bundled LRW fixture with masked vs parity (unmasked) loss
and compare the eval-ESTOI trajectories (VERDICT r1 item 7 'Done'
criterion). Runs on the real TPU; results documented in README.md.

Run: python tools/compare_masked_loss.py [--iters 300] [--eval 50]
Prints one JSON line per mode with the ESTOI trajectory.
"""

from __future__ import annotations

import argparse
import json
import tempfile

ROOT = "/root/reference/Datasets/SAMPLE_LRW"


def run_mode(masked: bool, iters: int, eval_interval: int) -> dict:
    from lip2speech_tpu.cli import train as train_cli

    tmp = tempfile.mkdtemp(prefix=f"masked_{masked}_")
    args = train_cli.parse_args(
        [
            "--root", ROOT,
            "--train_split", "test",  # overfit the 10-clip fixture
            "--batch_size", "8",
            "--max_iters", str(iters),
            "--eval_interval", str(eval_interval),
            "--log_interval", str(eval_interval),
            "--run_dir", f"{tmp}/run",
            "--ckpt_dir", f"{tmp}/ckpt",
            "--eval_batches", "1",
            "--override", f"train.masked_loss={masked}",
        ]
    )
    result = train_cli.train(args)
    # pull the eval trajectory back out of the JSONL
    traj = []
    with open(f"{tmp}/run/metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "eval/estoi" in rec:
                traj.append((rec["step"], round(rec["eval/estoi"], 4)))
    return {"masked": masked, "trajectory": traj, "best": result["best_score"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--eval", type=int, default=50)
    args = ap.parse_args()
    for masked in (False, True):
        print(json.dumps(run_mode(masked, args.iters, args.eval)), flush=True)


if __name__ == "__main__":
    main()
