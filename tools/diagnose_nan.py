"""Localize the NaN-gradient divergence of the fixture-overfit runs.

Round-4 overfit attempts at lr 5e-4 (runs/overfit_r4b, r4c) hit NaN
*gradients* with a still-finite loss around step ~800; apply_if_finite then
rejected every further update. This tool reproduces that configuration on
the bundled 10-clip SAMPLE_LRW fixture (`/root/reference/arg_parser.py:12-13`)
and, each step, computes per-leaf gradient statistics through the exact
`loss_and_grad` the train step uses:

  * nonfinite element count per param leaf,
  * max |grad| per leaf (to watch where the explosion builds first).

On the first nonfinite step it prints every offending leaf plus the
top-20 largest-|grad| leaves of the *previous* step and exits 1.

Usage (serialize with other TPU processes):
  python tools/diagnose_nan.py --lr 5e-4 --steps 1500 [--bf16/--no-bf16]
"""

from __future__ import annotations

import argparse
import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from lip2speech_tpu.cli.common import load_model  # noqa: E402
from lip2speech_tpu.config import config_with_overrides  # noqa: E402
from lip2speech_tpu.data import Loader, get_dataset, prepare_batch  # noqa: E402
from lip2speech_tpu.parallel import create_mesh, distribute_batch  # noqa: E402
from lip2speech_tpu.train import create_train_state, make_optimizer  # noqa: E402
from lip2speech_tpu.train.train_step import (  # noqa: E402
    loss_and_grad,
    make_train_step,
)

FIXTURE = "/root/reference/Datasets/SAMPLE_LRW"


def leaf_name(path):
    return "/".join(str(getattr(p, "key", p)) for p in path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--grad_clip", type=float, default=5.0)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--check_every", type=int, default=1)
    ap.add_argument("--root", default=FIXTURE)
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument("--tf_ratio", type=float, default=0.1)
    args = ap.parse_args()

    cfg = config_with_overrides(
        f"train.learning_rate={args.lr}",
        f"train.grad_clip={args.grad_clip}",
        f"train.bf16={args.bf16}",
    )
    ds = get_dataset("LRW", args.root, mode="test", cfg=cfg.data)
    model, variables, _ = load_model(cfg, None, len(ds))
    mesh = create_mesh(1, 1)
    tx = make_optimizer(cfg, variables["params"])
    state = create_train_state(cfg, variables)

    loader = Loader(ds, len(ds), cfg.data, shuffle=True, infinite=True,
                    num_workers=2, seed=cfg.train.seed)
    raw = next(iter(loader))
    batch = prepare_batch(distribute_batch(raw, mesh), cfg.audio, cfg.data)
    batch.pop("audio"), batch.pop("audio_lengths")

    step_fn = make_train_step(cfg, model, tx)

    @jax.jit
    def grad_stats(state, batch, tf_ratio, rng):
        losses, new_stats, grads = loss_and_grad(
            state, batch, tf_ratio, rng, cfg, model
        )
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        bad = jnp.stack([jnp.sum(~jnp.isfinite(g)) for _, g in flat])
        mx = jnp.stack([jnp.max(jnp.abs(g)) for _, g in flat])
        # batch_stats are written back UNCONDITIONALLY by train_step —
        # apply_if_finite guards params only, so a nonfinite running stat
        # is the poisoning path (observed: runs/overfit_r4c went fully NaN)
        stats_bad = jnp.stack(
            [
                jnp.sum(~jnp.isfinite(s))
                for _, s in jax.tree_util.tree_flatten_with_path(new_stats)[0]
            ]
        )
        return losses["total"], bad, mx, stats_bad

    names = [
        leaf_name(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(state.params)[0]
    ]
    stat_names = [
        leaf_name(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(state.batch_stats)[0]
    ]
    rng = jax.random.PRNGKey(cfg.train.seed)
    tf_ratio = jnp.float32(args.tf_ratio)
    prev_top = []
    print("setup done; compiling grad_stats...", flush=True)
    for it in range(args.steps):
        if it % args.check_every == 0:
            total, bad, mx, stats_bad = jax.device_get(
                grad_stats(state, batch, tf_ratio, rng)
            )
            top = sorted(zip(names, mx), key=lambda t: -t[1])[:20]
            if bad.sum() > 0 or stats_bad.sum() > 0:
                print(f"\n=== step {it}: NONFINITE (loss={total:.3f}) ===")
                for n, b, m in zip(names, bad, mx):
                    if b:
                        print(f"  grad {n}: {int(b)} nonfinite, max|g|={m:.3e}")
                for n, b in zip(stat_names, stats_bad):
                    if b:
                        print(f"  batch_stat {n}: {int(b)} nonfinite")
                print("\ntop-20 |grad| leaves of previous finite step:")
                for n, m in prev_top:
                    print(f"  {n}: {m:.3e}")
                sys.exit(1)
            prev_top = top
            if it % 50 == 0:
                print(f"[{it}] loss={total:.3f} max|g|={top[0][1]:.3e} @ {top[0][0]}")
        state, _ = step_fn(state, batch, tf_ratio, rng)
    print(f"no nonfinite gradients in {args.steps} steps")


if __name__ == "__main__":
    main()
