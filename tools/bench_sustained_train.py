"""Sustained train throughput WITH the real input pipeline.

bench.py's ``train_clips_per_sec`` feeds the jitted step from pre-staged
device tensors; this tool runs the actual production path — threaded
Loader (bz2+JPEG decode or the decoded-clip cache) -> host collate ->
device placement -> prepare_batch -> jitted train step — in steady state
and reports clips/s end to end, so the headline step rate is backed by a
number a real run can reach (VERDICT r3 item 3; reference loop:
/root/reference/train.py:92-100).

The loader path is exactly cli/train.py's; the only difference is timing
instrumentation around the step loop and a fixed small step count.

Run: python tools/bench_sustained_train.py [--batch 64] [--steps 40]
     [--cache_gb 4] [--workers N]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/reference/Datasets/SAMPLE_LRW")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--cache_gb", type=float, default=4.0)
    ap.add_argument("--workers", type=int, default=0,
                    help="loader threads (0 = cli/train.py's default)")
    args = ap.parse_args()

    from lip2speech_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from lip2speech_tpu.cli.common import load_model
    from lip2speech_tpu.config import Config
    from lip2speech_tpu.data import LRW, Loader, prepare_batch
    from lip2speech_tpu.parallel import auto_mesh, distribute_batch
    from lip2speech_tpu.train import create_train_state, make_optimizer, make_train_step

    cfg = Config()
    ds = LRW(args.root, mode="test", cfg=cfg.data,
             cache_bytes=int(args.cache_gb * 2**30))
    workers = args.workers or min(args.batch, os.cpu_count() or 8)
    loader = Loader(
        ds, args.batch, cfg.data, shuffle=True, infinite=True,
        num_workers=workers, seed=0,
    )
    mesh = auto_mesh(args.batch, 1)
    model, variables, _ = load_model(cfg, None, args.batch)
    tx = make_optimizer(cfg, variables["params"])
    state = create_train_state(cfg, variables)
    step_fn = make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(0)
    tf = jnp.float32(0.5)

    it = iter(loader)

    def one_step(state):
        raw = next(it)
        batch = prepare_batch(distribute_batch(raw, mesh), cfg.audio, cfg.data)
        batch.pop("audio"), batch.pop("audio_lengths")
        return step_fn(state, batch, tf, rng)

    # warmup: compile + fill the decoded cache (epoch 1) + thread pool
    for _ in range(args.warmup):
        state, metrics = one_step(state)
    float(metrics["total"])

    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = one_step(state)
    float(metrics["total"])  # force completion of the chain
    dt = (time.time() - t0) / args.steps

    # step-only rate at the same batch for the ratio (pre-staged batch,
    # same protocol as bench.py)
    raw = next(it)
    batch = prepare_batch(distribute_batch(raw, mesh), cfg.audio, cfg.data)
    batch.pop("audio"), batch.pop("audio_lengths")
    state2, m2 = step_fn(state, batch, tf, rng)
    float(m2["total"])
    t0 = time.time()
    for _ in range(args.steps):
        state2, m2 = step_fn(state2, batch, tf, rng)
    float(m2["total"])
    dt_step = (time.time() - t0) / args.steps

    print(json.dumps({
        "sustained_clips_per_sec": round(args.batch / dt, 1),
        "step_only_clips_per_sec": round(args.batch / dt_step, 1),
        "sustained_over_step_only": round(dt_step / dt, 3),
        "batch": args.batch,
        "workers": workers,
        "cache_gb": args.cache_gb,
        "host_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
