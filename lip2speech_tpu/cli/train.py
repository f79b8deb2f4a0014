"""Training CLI.

Rebuild of ``/root/reference/train.py:61-253`` as a thin loop around the
jitted sharded train step: dataset select, AdamW(amsgrad), checkpoint
resume, tf-ratio schedule (+0.1 every 10 epochs, train.py:159-160),
periodic eval + checkpoint, JSONL/console/PNG logging. bf16 on TPU replaces
apex AMP; the overflow-skip logic (train.py:188-196) is unnecessary.

Divergence (documented): the reference's eval gating saves only when
``eval_score < max_eval_score`` with max initialized to 0 — inverted for a
higher-is-better ESTOI, so it effectively never checkpoints mid-run
(train.py:199-217). We save when the score improves.

Usage: python -m lip2speech_tpu.cli.train --dataset LRW --root ...
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from lip2speech_tpu.cli.common import add_common_args, load_model
from lip2speech_tpu.config import Config
from lip2speech_tpu.data import FaceAugmentation, Loader, get_dataset, prepare_batch
from lip2speech_tpu.eval.evaluate import evaluate_net
from lip2speech_tpu.parallel import (
    auto_mesh,
    create_mesh,
    distribute_batch,
    partition_params,
    replicated,
    shard_like,
    shard_train_state,
)
from lip2speech_tpu.train import checkpoint as ckpt
from lip2speech_tpu.train import create_train_state, make_optimizer, make_train_step
from lip2speech_tpu.train.logging_utils import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser("lip2speech_tpu train")
    add_common_args(p)
    p.add_argument("--finetune_model_path", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_iters", type=int, default=None)
    p.add_argument("--eval_interval", type=int, default=None)
    p.add_argument("--log_interval", type=int, default=None)
    p.add_argument("--run_dir", default="runs/default")
    p.add_argument("--ckpt_dir", default="checkpoints/default")
    p.add_argument("--data_parallel", type=int, default=-1)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--eval_batches", type=int, default=2)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                        "slices (TPU pods); single-host runs skip this")
    # --override comes from add_common_args (shared with demo/evaluate)
    p.add_argument("--train_split", default="train",
                   help="corpus split used for training (e.g. 'test' to overfit the bundled fixture)")
    p.add_argument("--no_augment", action="store_true",
                   help="disable the p=0.5 horizontal-flip FaceAugmentation "
                        "(reference train.py:66-76 always augments; overfit "
                        "runs memorize faster without it)")
    p.add_argument("--reuse_first_batch", action="store_true",
                   help="stage the first batch once and feed it to every "
                        "step. Only sound when the whole training set fits "
                        "in one batch with augmentation off (fixture "
                        "overfits): the staged tensors are then identical "
                        "every epoch, and per-step randomness (dropout/"
                        "gumbel/teacher) still varies because the train "
                        "step folds state.step into its rng. Removes the "
                        "per-step decode+collate+transfer host work, which "
                        "otherwise dominates small-batch runs on 1 core")
    p.add_argument("--rewind_on_stall", type=int, default=0,
                   help="divergence rewind: when this many CONSECUTIVE "
                        "optimizer steps have been rejected (nonfinite or "
                        "train.reject_grad_norm_above), restore the newest "
                        "rolling safety checkpoint, reseed the step RNG "
                        "stream, and continue. Observed failure mode this "
                        "answers (runs/overfit_r4f): once params enter a "
                        "high-curvature region every gradient is huge, so "
                        "skip-based guards freeze the run forever — only "
                        "rewinding to a pre-divergence state with a "
                        "different noise stream escapes. 0 = off")
    p.add_argument("--rewind_lr_decay", type=float, default=1.0,
                   help="multiply the learning rate by this on every "
                        "rewind (1.0 = keep; <1 costs a re-jit)")
    p.add_argument("--max_rewinds", type=int, default=25)
    p.add_argument("--cache_decoded_gb", type=float, default=0.0,
                   help="in-memory decoded-clip cache budget (LRW only): "
                        "skips bz2+JPEG decode for clips that fit, so "
                        "repeated working sets feed the step at step rate")
    return p.parse_args(argv)


def train(args, cfg: Config | None = None) -> dict:
    if getattr(args, "multihost", False):
        # multi-host data parallelism over DCN: each host sees its local
        # devices; the global mesh spans the slice (SURVEY.md §2.10 —
        # replaces the reference's absent process-group init)
        jax.distributed.initialize()
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}")
    if cfg is None:
        from lip2speech_tpu.config import config_with_overrides

        cfg = config_with_overrides(*getattr(args, "override", []))
    tc = cfg.train
    batch_size = args.batch_size or tc.batch_size
    max_iters = args.max_iters or tc.max_iters
    eval_interval = args.eval_interval or tc.eval_interval
    log_interval = args.log_interval or tc.log_interval

    ds_kw = {
        "augmentation": None if getattr(args, "no_augment", False)
        else FaceAugmentation()
    }
    if getattr(args, "cache_decoded_gb", 0.0) and args.dataset.upper() == "LRW":
        ds_kw["cache_bytes"] = int(args.cache_decoded_gb * 2**30)
    ds = get_dataset(
        args.dataset, args.root, mode=args.train_split, cfg=cfg.data, **ds_kw
    )
    if len(ds) == 0:
        raise RuntimeError(f"empty dataset at {args.root}")
    eval_ds = get_dataset(args.dataset, args.root, mode="test", cfg=cfg.data)
    steps_per_epoch = max(len(ds) // batch_size, 1)

    model, variables, _ = load_model(
        cfg, args.finetune_model_path or args.model_path, batch_size
    )

    if args.data_parallel == -1:
        mesh = auto_mesh(batch_size, args.model_parallel)
    else:
        mesh = create_mesh(args.data_parallel, args.model_parallel)
    print(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} devices")
    tx = make_optimizer(cfg, variables["params"])
    state = create_train_state(cfg, variables, init_opt=False)
    # tensor parallelism (VERDICT r2 item 3): with --model_parallel > 1 the
    # decoder/encoder matmul weights shard over the mesh's model axis
    # (TP_RULES); optimizer moments inherit the shardings via GSPMD
    tp_specs = partition_params(state.params, mesh, args.model_parallel > 1)
    state = shard_train_state(state, mesh, tp_specs, tx)

    def adopt(payload):
        # restore INTO the live shardings (TP specs included)
        return state._replace(
            step=jax.device_put(jnp.asarray(payload["step"]), replicated(mesh)),
            params=shard_like(payload["params"], state.params),
            batch_stats=shard_like(payload["batch_stats"], state.batch_stats),
            opt_state=shard_like(payload["opt_state"], state.opt_state),
        )

    start_it, best_score = 0, -1.0
    restored = ckpt.restore_checkpoint(args.ckpt_dir, template=state)
    if restored is not None:
        payload, extra = restored
        state = adopt(payload)
        start_it = int(payload["step"])
        best_score = float(extra.get("best_score", -1.0))
        print(f"resumed at step {start_it} (best ESTOI {best_score:.4f})")

    if args.rewind_on_stall and cfg.train.adversarial:
        # the safety checkpoint holds only the generator TrainState; a
        # rewind would roll the generator back against the
        # post-divergence critic (round-4 advisor finding)
        raise RuntimeError(
            "--rewind_on_stall is unsupported with train.adversarial=true: "
            "the rolling safety checkpoint does not include the critic "
            "params/optimizer. Disable one of the two."
        )
    critic = None
    if cfg.train.adversarial:
        # WGAN critic (reference losses.py:83-136, unwired there): one
        # combined jitted step updates generator (with adversarial terms)
        # and critic each iteration. The critic re-initializes on resume —
        # it is cheap to rewarm and the reference checkpoints no critic.
        from lip2speech_tpu.train.adversarial import (
            init_critic,
            make_adversarial_train_step,
        )

        disc, critic_tx, critic = init_critic(
            cfg, jax.random.PRNGKey(tc.seed + 17), batch_size
        )
        critic = jax.device_put(critic, replicated(mesh))
        step_fn = make_adversarial_train_step(cfg, model, tx, disc, critic_tx)
    else:
        step_fn = make_train_step(cfg, model, tx)
    logger = MetricLogger(args.run_dir)
    # per-process dataset sharding: each host reads only its slice of every
    # global batch; distribute_batch assembles the global sharded array
    loader = Loader(
        ds, batch_size, cfg.data, shuffle=True, infinite=True,
        num_workers=min(batch_size, os.cpu_count() or 8), seed=tc.seed,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
    )
    rng = jax.random.PRNGKey(tc.seed)

    it = start_it
    last_saved_step = -1
    staged_batch = None
    data_iter = iter(loader)
    t_step = time.time()

    # divergence-rewind machinery (--rewind_on_stall): rolling safety
    # checkpoints + restore-and-reseed when every step is being rejected
    safety_dir = os.path.join(args.ckpt_dir, "safety")
    rewinds, rewind_depth, last_rewind_it, last_consec = 0, 0, -1, 0.0
    pending_nfc = None  # previous step's on-device notfinite counter
    if args.rewind_on_stall:
        if not ckpt.available_steps(safety_dir):
            ckpt.save_checkpoint(safety_dir, max(start_it, 0), state,
                                 {"best_score": best_score})

    def do_rewind():
        nonlocal state, rng, rewinds, rewind_depth, step_fn, tx, cfg
        nonlocal last_rewind_it
        steps = ckpt.available_steps(safety_dir)
        if not steps:
            raise RuntimeError("rewind requested but no safety checkpoint")
        # repeated stalls walk back to progressively older safety saves
        target = steps[max(len(steps) - 1 - rewind_depth, 0)]
        try:
            payload, _ = ckpt.restore_checkpoint(safety_dir, template=state,
                                                 step=target)
        except FileNotFoundError as e:
            # target pruned/corrupted between listing and restore: fall
            # back to the newest safety step that still exists
            fallback = ckpt.available_steps(safety_dir)
            if not fallback:
                raise RuntimeError(
                    "rewind: no safety checkpoint survives"
                ) from e
            target = fallback[-1]
            print(f"rewind: requested step missing ({e}); "
                  f"falling back to newest safety step {target}")
            payload, _ = ckpt.restore_checkpoint(safety_dir, template=state,
                                                 step=target)
        state = adopt(payload)
        rewinds += 1
        rewind_depth += 1
        last_rewind_it = it
        # a different noise stream (dropout/gumbel/teacher draws) is the
        # escape: with the same stream the replay is deterministic and
        # walks straight back into the stall
        rng2 = jax.random.fold_in(jax.random.PRNGKey(tc.seed), 7919 + rewinds)
        if args.rewind_lr_decay != 1.0:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, train=_dc.replace(
                cfg.train,
                learning_rate=cfg.train.learning_rate * args.rewind_lr_decay,
            ))
            tx = make_optimizer(cfg, state.params)
            if critic is not None:
                from lip2speech_tpu.train.adversarial import (
                    make_adversarial_train_step,
                )

                step_fn = make_adversarial_train_step(
                    cfg, model, tx, disc, critic_tx
                )
            else:
                step_fn = make_train_step(cfg, model, tx)  # re-jit (rare)
        print(f"[{it + 1}] REWIND #{rewinds}: {last_consec:.0f} consecutive "
              f"rejected steps; restored safety step {target}, lr "
              f"{cfg.train.learning_rate:.2e}, new rng stream")
        logger.scalars(it + 1, {"rewind": float(rewinds),
                                "rewind_target": float(target)})
        return rng2
    for it in range(start_it, max_iters):
        epoch = it // steps_per_epoch
        tf_ratio = min(
            tc.tf_ratio_start + tc.tf_ratio_step * (epoch // tc.tf_ratio_epochs),
            1.0,
        )
        if staged_batch is None:
            raw = next(data_iter)
            batch = prepare_batch(
                distribute_batch(raw, mesh),
                cfg.audio,
                cfg.data,
            )
            batch.pop("audio"), batch.pop("audio_lengths")
            if getattr(args, "reuse_first_batch", False):
                if len(ds) > batch_size:
                    raise RuntimeError(
                        "--reuse_first_batch requires the whole training set "
                        f"to fit in one batch (len(ds)={len(ds)} > "
                        f"batch_size={batch_size})"
                    )
                staged_batch = batch
        else:
            batch = staged_batch
        if critic is not None:
            state, critic, metrics = step_fn(
                state, critic, batch, jnp.float32(tf_ratio), rng
            )
        else:
            state, metrics = step_fn(state, batch, jnp.float32(tf_ratio), rng)
        if jax.default_backend() == "cpu" and len(mesh.devices.flat) > 1:
            # The in-process CPU collective backend (virtual multi-device
            # test meshes) can deadlock its rendezvous when two programs
            # with collectives are in flight concurrently (async-dispatched
            # steps + the next batch's cross-device placement). Serialize.
            # Real TPUs order programs per device in hardware — async
            # dispatch stays on for them.
            jax.block_until_ready(metrics["total"])

        if args.rewind_on_stall:
            # stall detection samples the counter EVERY step (round-4
            # advisor: at log ticks only, a stall could run log_interval+N
            # steps before do_rewind fired). The read is delayed by one
            # step: the previous step's counter is already materialized
            # while this step runs, so the host read costs one tunnel RTT
            # but no pipeline bubble.
            if pending_nfc is not None:
                last_consec = float(pending_nfc)
            pending_nfc = metrics.get("notfinite_count")
            if (
                last_consec >= args.rewind_on_stall
                and rewinds < args.max_rewinds
            ):
                rng = do_rewind()
                last_consec = 0.0
                pending_nfc = None

        if (it + 1) % log_interval == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["tf_ratio"] = tf_ratio
            metrics["epoch"] = epoch
            logger.scalars(it + 1, metrics)
            logger.console(it + 1, metrics, total_steps=max_iters)

        if (it + 1) % eval_interval == 0:
            eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
            score = evaluate_net(
                model, eval_vars, eval_ds, cfg,
                batch_size=min(32, batch_size), max_batches=args.eval_batches,
                mesh=mesh,
            )
            logger.scalars(it + 1, {"estoi": score}, prefix="eval/")
            # per-layer weight histograms at eval ticks, matching the
            # reference's validation logging (tensorboard_logger.py:20-24)
            logger.histograms(it + 1, state.params)
            print(f"[{it + 1}] eval ESTOI {score:.4f} (best {best_score:.4f})")
            if score > best_score:
                best_score = score
                ckpt.save_checkpoint(
                    args.ckpt_dir, it + 1, state, {"best_score": best_score}
                )
                last_saved_step = it + 1
            if args.rewind_on_stall and pending_nfc is not None:
                # re-read the CURRENT step's counter right before the
                # safety-save decision (round-4 advisor: an eval tick
                # landing before the first sample saw a stale 0.0)
                last_consec = float(pending_nfc)
                pending_nfc = None
            if args.rewind_on_stall and last_consec == 0.0:
                # rolling safety save for divergence rewind — only from a
                # healthy step (the last logged one was not rejected)
                ckpt.save_checkpoint(safety_dir, it + 1, state,
                                     {"best_score": best_score})
                ckpt.prune_checkpoints(safety_dir, keep=5)
                if it - last_rewind_it >= eval_interval:
                    rewind_depth = 0  # survived a full window: reset walkback

    # final unconditional save (train.py:249-251) — skip if the eval gate
    # already saved this exact step
    if last_saved_step != max_iters:
        ckpt.save_checkpoint(args.ckpt_dir, max_iters, state, {"best_score": best_score})
    return {"final_step": it + 1, "best_score": best_score}


def main(argv=None):
    train(parse_args(argv))


if __name__ == "__main__":
    main()
