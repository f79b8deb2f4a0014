"""Evaluation: batched forward -> Griffin-Lim inversion -> ESTOI mean.

Rebuild of ``/root/reference/evaluate.py:22-51``. Semantics preserved:
the forward runs with the GT mels supplied and ``tf_ratio=1`` (which, per
the reference's teacher-forcing rule, means the decoder free-runs on its
own predictions while matching the GT mel length), the *postnet* output is
inverted, and ESTOI is computed per clip against the GT waveform.

The heavy path (mel inversion + Griffin-Lim) runs on-device as one jitted
program per batch; ESTOI uses the exact numpy implementation on host (153
clips in the reference benchmark — negligible), with the batched JAX
variant available for large-scale eval.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import Config
from lip2speech_tpu.data import Loader, prepare_batch
from lip2speech_tpu.ops import estoi as estoi_ops
from lip2speech_tpu.ops import griffin_lim as gl_ops


@functools.lru_cache(maxsize=8)
def _build_eval_fns(model, cfg: Config, n_gl_iters: int, metric: str,
                    row_sharding, seed: int):
    """Jitted forward+invert and device-metric programs, memoized so the
    periodic eval from the training loop reuses the traced computation
    instead of re-tracing/lowering the full model every tick (fresh
    closures defeat jit's identity-keyed cache). All key components are
    hashable: flax Modules and Config are frozen dataclasses, NamedSharding
    hashes by mesh+spec."""
    batch_fn = (
        estoi_ops.estoi_batch_jax if metric == "estoi" else estoi_ops.stoi_batch_jax
    )
    bf16 = cfg.train.bf16
    rngs = {
        "gumbel": jax.random.PRNGKey(seed),
        "teacher": jax.random.PRNGKey(seed + 1),
        "dropout": jax.random.PRNGKey(seed + 2),
    }

    @jax.jit
    def forward_invert(vars_, batch, key):
        if bf16:
            from lip2speech_tpu.train.train_step import cast_floats

            vars_ = cast_floats(vars_, jnp.bfloat16)
            batch = cast_floats(batch, jnp.bfloat16)
        out = model.apply(
            vars_,
            batch["video"],
            batch["faces"],
            batch["mel"],
            1.0,
            None,
            rngs,
            train=False,
        )
        mel_pred = out["mel_postnet"].astype(jnp.float32)  # (B, 80, M)
        wav = gl_ops.mel_to_audio(mel_pred, key, cfg.audio, n_iter=n_gl_iters)
        if row_sharding is not None:
            wav = jax.lax.with_sharding_constraint(wav, row_sharding)
        return wav

    @jax.jit
    def score_batch(gt_dev, wav, lens):
        s = batch_fn(gt_dev, wav, lengths=lens, fs=cfg.audio.sample_rate)
        if row_sharding is not None:
            s = jax.lax.with_sharding_constraint(s, row_sharding)
        return s

    return forward_invert, score_batch


def evaluate_net(
    model,
    variables: dict[str, Any],
    dataset,
    cfg: Config,
    batch_size: int = 32,
    n_gl_iters: int = 32,  # saturates round-trip ESTOI (sweep_gl_quality)
    max_batches: int | None = None,
    seed: int = 0,
    device_estoi: bool = False,
    metric: str = "estoi",
    mesh=None,
) -> float:
    """Mean ESTOI (or STOI, ``metric='stoi'``) over the dataset
    (evaluate.py:22-51; the reference computes only ESTOI, but its
    Report.pdf Table 2 baseline includes STOI 0.66 — BASELINE.md).

    With ``mesh``, batches are placed onto it (data-sharded when the batch
    divides the data axis, else replicated) so evaluation composes with
    TP/DP-sharded ``variables``; multi-process runs shard the loader per
    process and average scores across processes.
    """
    assert metric in ("estoi", "stoi", "pesq"), metric
    # host metric via the registry: estoi/stoi are native; pesq resolves to
    # the real ITU wrapper when its wheel is installed and raises
    # MetricUnavailable with install instructions otherwise (eval/metrics.py)
    from lip2speech_tpu.eval.metrics import get_waveform_metric

    if metric == "pesq" and device_estoi:
        raise ValueError("pesq has no on-device variant; drop --device_estoi")
    host_fn = get_waveform_metric(metric)
    n_proc = jax.process_count()
    # The loader-sharding and mesh-sharding decisions MUST agree: per-
    # process loader slices are only valid when the global array is
    # data-sharded; under a replicated sharding every process has to
    # supply identical full batches (make_array_from_process_local_data
    # would otherwise stitch different rows into one "replicated" array).
    can_shard_loader = batch_size % n_proc == 0
    if mesh is not None:
        from lip2speech_tpu.parallel import batch_sharding, replicated

        n_data = mesh.shape.get("data", 1)
        data_sharded = batch_size % n_data == 0 and (
            n_proc == 1 or can_shard_loader
        )
        mesh_sharding = batch_sharding(mesh) if data_sharded else replicated(mesh)
        shard_loader = can_shard_loader and (n_proc == 1 or data_sharded)
        # jit output shardings are otherwise unconstrained: GSPMD may
        # legally replicate small outputs, which would break the
        # shard-index-based row recovery in _local_rows on multi-host
        # runs. Pin every per-row output to the batch's own row sharding.
        row_sharding = mesh_sharding
    else:
        shard_loader = can_shard_loader
        row_sharding = None
    local_batch = batch_size // n_proc if shard_loader else batch_size
    loader = Loader(
        dataset, batch_size, cfg.data, shuffle=False, drop_last=False,
        num_workers=8,
        shard_index=jax.process_index() if shard_loader else 0,
        shard_count=n_proc if shard_loader else 1,
    )
    forward_invert, score_batch = _build_eval_fns(
        model, cfg, n_gl_iters, metric, row_sharding, seed
    )

    scores = []
    key = jax.random.PRNGKey(seed)
    for bi, raw in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        # static-shape batches only: pad the ragged tail by repeating row 0
        n_valid = raw["mouth_u8"].shape[0]
        if n_valid < local_batch:
            reps = local_batch - n_valid
            raw = {
                k: np.concatenate([v, np.repeat(v[:1], reps, 0)]) for k, v in raw.items()
            }
        if mesh is not None and n_proc > 1:
            device_raw = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    mesh_sharding, np.asarray(x)
                ),
                raw,
            )
        elif mesh is not None:
            device_raw = jax.device_put(
                {k: jnp.asarray(v) for k, v in raw.items()}, mesh_sharding
            )
        else:
            device_raw = {k: jnp.asarray(v) for k, v in raw.items()}
        batch = prepare_batch(device_raw, cfg.audio, cfg.data)
        key, sub = jax.random.split(key)
        wav_pred = forward_invert(variables, batch, sub)
        gt = np.asarray(raw["audio"])  # this process' rows
        if device_estoi:
            # batched on-device metric — same algorithm with static-shape
            # silent-frame excision; measured < 1e-7 off the host metric
            # on fixture speech (tests/test_estoi_oracle.py)
            gt_dev = batch["audio"] if mesh is not None else jnp.asarray(gt)
            lens = (
                batch["audio_lengths"] if mesh is not None
                else jnp.asarray(raw["audio_lengths"])
            )
            batch_scores = score_batch(gt_dev, wav_pred, lens)
            local_scores = _local_rows(batch_scores) if n_proc > 1 else np.asarray(
                batch_scores
            )
            scores.extend(local_scores[:n_valid].tolist())
        else:
            wav_np = _local_rows(wav_pred) if n_proc > 1 else np.asarray(wav_pred)
            for i in range(n_valid):
                n = int(raw["audio_lengths"][i])
                scores.append(
                    host_fn(gt[i, :n], wav_np[i, :n], cfg.audio.sample_rate)
                )
    if n_proc > 1:
        from jax.experimental import multihost_utils

        totals = multihost_utils.process_allgather(
            np.asarray([float(np.sum(scores)), float(len(scores))])
        )
        totals = np.asarray(totals).reshape(-1, 2)
        return float(totals[:, 0].sum() / max(totals[:, 1].sum(), 1.0))
    return float(np.mean(scores)) if scores else 0.0


def _local_rows(arr) -> np.ndarray:
    """Process-local rows of a batch-sharded global array, in row order
    (multi-host: every process scores only the rows its loader produced).
    Deduplicates by row range — devices along the model axis hold
    identical replicas of each data shard."""
    seen: dict[int, np.ndarray] = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)], axis=0)
