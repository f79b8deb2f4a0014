"""GL operating point on *trained-model predictions* (VERDICT r4 item 5).

`tools/sweep_gl_quality.py` justified n_iter=32 on ground-truth
round-trips (ESTOI saturates 0.859@8 / 0.874@16 / 0.885@32/64). This
re-runs the decision on the campaign model's own free-running predicted
mels (`/root/reference/evaluate.py:22-51` semantics via `evaluate_net`),
where the mel is imperfect and the phase-retrieval problem is different.

Run: python tools/sweep_gl_on_predictions.py [ckpt_dir]
"""

from __future__ import annotations

import json
import sys

from lip2speech_tpu.cli.common import common_config, load_model
from lip2speech_tpu.config import config_with_overrides
from lip2speech_tpu.data import get_dataset
from lip2speech_tpu.eval.evaluate import evaluate_net
from lip2speech_tpu.utils.compile_cache import enable_compilation_cache

FIXTURE = "/root/reference/Datasets/SAMPLE_LRW"


def main():
    enable_compilation_cache()
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "checkpoints/overfit_r5d"
    # the artifact model's training overrides (model knobs only matter
    # for graph structure; the clips are identity in forward)
    cfg = config_with_overrides(
        "model.scan_grad_clip=1.0", "model.content_grad_clip=1.0"
    )
    ds = get_dataset("LRW", FIXTURE, mode="test", cfg=cfg.data)
    model, variables, _ = load_model(cfg, ckpt, min(10, len(ds)))

    out = {}
    for n_iter in (8, 16, 32, 64):
        score = evaluate_net(
            model, variables, ds, cfg, batch_size=10, n_gl_iters=n_iter
        )
        out[n_iter] = float(score)
        print(f"n_iter={n_iter}: predicted-audio ESTOI {score:.4f}", flush=True)
    print(json.dumps({"ckpt": ckpt, "estoi_by_gl_iters": out}))


if __name__ == "__main__":
    main()
