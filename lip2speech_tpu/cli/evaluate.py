"""Evaluation CLI: mean ESTOI over a test split.

Rebuild of ``/root/reference/evaluate.py:54-81``.
Usage: python -m lip2speech_tpu.cli.evaluate --dataset LRW --root ... \
         [--model_path ckpt_dir_or.pth]
Prints one JSON line with the score.
"""

from __future__ import annotations

import argparse
import json

from lip2speech_tpu.cli.common import add_common_args, common_config, load_model
from lip2speech_tpu.config import Config
from lip2speech_tpu.data import get_dataset
from lip2speech_tpu.eval.evaluate import evaluate_net


def parse_args(argv=None):
    p = argparse.ArgumentParser("lip2speech_tpu evaluate")
    add_common_args(p)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--gl_iters", type=int, default=32,
                   help="Griffin-Lim iterations; 32 saturates GT round-trip "
                        "ESTOI on LRW speech (0.885 @ 32/64/128 iters)")
    p.add_argument("--device_estoi", action="store_true",
                   help="batched on-device metric (same algorithm, static-"
                        "shape excision; measured <= 2.7e-4 off the host "
                        "metric on fixture speech)")
    p.add_argument("--metric", choices=("estoi", "stoi", "pesq"), default="estoi",
                   help="quality metric: the reference's ESTOI (Report.pdf "
                        "0.42), STOI (0.66), or PESQ (1.38; requires the "
                        "`pesq` wheel — see eval/metrics.py registry)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = common_config(args)
    ds = get_dataset(args.dataset, args.root, mode="test", cfg=cfg.data)
    bs = min(args.batch_size, max(len(ds), 1))
    model, variables, _ = load_model(cfg, args.model_path, bs)
    score = evaluate_net(
        model, variables, ds, cfg,
        batch_size=bs, n_gl_iters=args.gl_iters, max_batches=args.max_batches,
        device_estoi=args.device_estoi, metric=args.metric,
    )
    print(json.dumps({"dataset": args.dataset, "n_clips": len(ds), args.metric: score}))
    return score


if __name__ == "__main__":
    main()
