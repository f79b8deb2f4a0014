"""Speaker-encoder pretraining CLI.

Rebuild of ``/root/reference/speaker_encoder/train.py`` around the jitted
combined step (see speaker/train_loop.py). Checkpoints carry the face-net
params, temperature + its optimizer, and the face decoder — the same
logical content as the reference's save dict (train.py:192-199).

Usage: python -m lip2speech_tpu.cli.speaker_train --root <AVSpeech root>
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import Config
from lip2speech_tpu.parallel import auto_mesh, batch_sharding, replicated
from lip2speech_tpu.speaker import (
    AVSpeechFace,
    SpeakerTrainState,
    collate_speaker,
    init_speaker_training,
    make_speaker_optimizer,
    make_speaker_train_step,
)
from lip2speech_tpu.train import checkpoint as ckpt
from lip2speech_tpu.train.logging_utils import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser("speaker encoder pretraining")
    p.add_argument("--root", required=True)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_iters", type=int, default=720_000)
    p.add_argument("--save_interval", type=int, default=1000)
    p.add_argument("--log_interval", type=int, default=50)
    p.add_argument("--run_dir", default="runs/speaker")
    p.add_argument("--ckpt_dir", default="checkpoints/speaker")
    return p.parse_args(argv)


def train(args, cfg: Config | None = None):
    cfg = cfg or Config()
    ds = AVSpeechFace(args.root, mode="train", cfg=cfg.data)
    if len(ds) == 0:
        raise RuntimeError(f"no AVSpeechFace clips under {args.root}")

    models, params, stats, spk_vars = init_speaker_training(
        cfg, jax.random.PRNGKey(cfg.train.seed), args.batch_size
    )
    steps_per_epoch = max(len(ds) // args.batch_size, 1)
    tx = make_speaker_optimizer(steps_per_epoch)
    state = SpeakerTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=stats,
        frozen=spk_vars,
        opt_state=tx.init(params),
    )
    # data parallelism: replicate the three param groups, shard the batch
    # over the mesh's data axis; XLA inserts the gradient all-reduce (the
    # reference speaker trainer is single-GPU, speaker_encoder/train.py:53)
    mesh = auto_mesh(args.batch_size)
    print(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} devices")
    state = jax.device_put(state, replicated(mesh))
    bshard = batch_sharding(mesh)

    step_fn = make_speaker_train_step(models, tx)
    logger = MetricLogger(args.run_dir)
    rng = jax.random.PRNGKey(cfg.train.seed)

    rng_np = np.random.default_rng(cfg.train.seed)
    order = np.arange(len(ds))
    it = 0
    while it < args.max_iters:
        rng_np.shuffle(order)
        for b in range(len(ds) // args.batch_size or 1):
            idxs = order[b * args.batch_size : (b + 1) * args.batch_size]
            if len(idxs) < args.batch_size:
                # small corpus: repeat indices cyclically so the batch keeps
                # its static size — a short batch cannot be device_put with
                # the data sharding built for batch_size on a multi-device
                # mesh
                reps = -(-args.batch_size // max(len(order), 1))
                idxs = np.tile(order, reps)[: args.batch_size]
            samples = [ds[int(i)] for i in idxs]
            batch = collate_speaker(samples)
            state, metrics = step_fn(
                state,
                jax.device_put({k: jnp.asarray(v) for k, v in batch.items()}, bshard),
                rng,
            )
            it += 1
            if it % args.log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logger.scalars(it, m)
                logger.console(it, m, total_steps=args.max_iters)
            if it % args.save_interval == 0:
                ckpt.save_checkpoint(args.ckpt_dir, it, state, {"t": float(state.params["t"])})
            if it >= args.max_iters:
                break
    ckpt.save_checkpoint(args.ckpt_dir, it, state, {"t": float(state.params["t"])})
    return state


def main(argv=None):
    train(parse_args(argv))


if __name__ == "__main__":
    main()
