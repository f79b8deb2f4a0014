"""The jitted train step + optimizer (optax) over a device mesh.

Rebuild of the reference loop body (``/root/reference/train.py:151-197``)
as one pure function: forward -> loss dict -> grad -> clip -> AdamW(amsgrad)
update, compiled once with pjit. Data parallelism comes from sharding the
batch over the mesh's ``data`` axis; the gradient all-reduce is inserted by
XLA (the TPU-native equivalent of the reference's absent DDP/NCCL).

Only encoder + decoder parameters are optimized — vgg_face (and any
speaker-encoder weights) stay frozen, matching ``train.py:102-104``.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from lip2speech_tpu.config import Config
from lip2speech_tpu.models import Lip2Speech
from lip2speech_tpu.train.losses import lip2speech_loss

TRAINABLE_TOP = ("encoder", "decoder")


def cast_floats(tree: Any, dtype) -> Any:
    """Cast float32 leaves (params/stats/inputs) to the compute dtype.

    bf16 policy: master params stay f32 in the optimizer; the forward runs
    on a bf16 copy so every matmul/conv hits the MXU at full rate. This is
    the TPU-native replacement for apex AMP O2 (reference train.py:106-107)
    — no loss scaling needed in bf16.
    """
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        tree,
    )


def uncast_floats(tree: Any) -> Any:
    """Cast bf16 leaves back to float32 (the inverse of ``cast_floats``);
    keeps running batch statistics in f32 across steps — casting with
    ``cast_floats(..., float32)`` was a silent no-op on bf16 leaves, so
    stats degraded to bf16 after the first step."""
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
        else x,
        tree,
    )


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def trainable_mask(params: Any) -> Any:
    """True for params under encoder/ or decoder/ (train.py:102-104)."""

    def mask(path, _):
        return str(getattr(path[0], "key", path[0])) in TRAINABLE_TOP

    return jax.tree_util.tree_map_with_path(mask, params)


def reject_above_norm(threshold: float) -> optax.GradientTransformation:
    """NaN-ify the whole update when its global norm exceeds ``threshold``.

    Chained in front of ``skip_if_not_finite`` this turns a
    huge-but-finite gradient spike into a *skipped* step (params, optimizer
    moments and — via ``guard_batch_stats``'s matching predicate — BN
    running stats all stay at last-good) instead of a norm-``grad_clip``
    step in a garbage direction. See ``TrainConfig.reject_grad_norm_above``
    for the observed failure mode this prevents."""

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        ok = norm <= threshold  # False for NaN/Inf norms too
        updates = jax.tree.map(
            lambda g: jnp.where(ok, g, jnp.asarray(jnp.nan, g.dtype)), updates
        )
        return updates, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


class SkipIfNotFiniteState(NamedTuple):
    """State of ``skip_if_not_finite``. Field names mirror
    ``optax.ApplyIfFiniteState`` so existing probes/metrics keep working."""

    notfinite_count: jnp.ndarray  # CONSECUTIVE skipped steps (resets on good)
    total_notfinite: jnp.ndarray
    inner_state: Any


def skip_if_not_finite(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Skip (zero) any update with non-finite leaves — and NEVER give up.

    Replaces ``optax.apply_if_finite``, whose contract *applies* the update
    anyway after ``max_consecutive_errors`` consecutive non-finite steps: an
    accepted all-NaN update permanently NaNs params and Adam moments, the
    exact catastrophe the wrapper exists to prevent (round-4 advisor
    finding). Here a non-finite update is always skipped: the emitted update
    is zero and the inner optimizer state (Adam moments, AMSGrad max) keeps
    its last-good value. Escaping a persistent stall is the job of the
    training loop's divergence rewind (``--rewind_on_stall``), which watches
    the consecutive ``notfinite_count`` this state exposes — not of the
    optimizer silently poisoning itself."""

    def init_fn(params):
        return SkipIfNotFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params),
        )

    def update_fn(updates, state, params=None):
        ok = all_finite(updates)
        new_updates, new_inner = inner.update(updates, state.inner_state, params)
        # non-finite grads produce non-finite inner results; select, never mix
        safe_updates = jax.tree.map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), new_updates
        )
        safe_inner = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_inner, state.inner_state
        )
        return safe_updates, SkipIfNotFiniteState(
            notfinite_count=jnp.where(ok, 0, state.notfinite_count + 1).astype(
                jnp.int32
            ),
            total_notfinite=state.total_notfinite + (1 - ok.astype(jnp.int32)),
            inner_state=safe_inner,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: Config, params: Any) -> optax.GradientTransformation:
    """AdamW(amsgrad) + global-norm clip, frozen branches zeroed
    (train.py:88,102-104: AdamW(lr 1e-4, wd 1e-6, amsgrad) + clip 1.0)."""
    mask = trainable_mask(params)
    adamw_amsgrad = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.scale_by_amsgrad(),
        optax.add_decayed_weights(cfg.train.weight_decay, mask=mask),
        optax.scale(-cfg.train.learning_rate),
    )
    tx = optax.multi_transform(
        {"train": adamw_amsgrad, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", mask),
    )
    reject = cfg.train.reject_grad_norm_above
    if cfg.train.skip_nonfinite_updates or reject > 0.0:
        # apex-overflow-skip equivalent: a NaN/Inf gradient would poison
        # clip_by_global_norm and corrupt params permanently; skip the
        # update instead (reference train.py:188-196). reject_above_norm
        # relies on this wrapper to convert its NaNs into a skip (and to
        # keep them out of the Adam moments), so it forces the wrapper on.
        # skip_if_not_finite never accepts a non-finite update, unlike
        # optax.apply_if_finite (see its docstring).
        tx = skip_if_not_finite(tx)
    if reject > 0.0:
        # order matters: the rejector must run BEFORE the skip wrapper so
        # the NaN-ified spike is skipped instead of fed to the inner chain
        tx = optax.chain(reject_above_norm(reject), tx)
    return tx


def create_train_state(
    cfg: Config, variables: Any, init_opt: bool = True
) -> TrainState:
    """``init_opt=False`` skips the (3x-param-memory AMSGrad) ``tx.init``
    when the caller will immediately re-initialize the optimizer state with
    explicit shardings (``shard_train_state``) — materializing it twice
    doubles startup time and transiently holds a second full optimizer
    state on the default device."""
    params = variables["params"]
    tx = make_optimizer(cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(params) if init_opt else None,
    )


def loss_and_grad(
    state: TrainState,
    batch: dict[str, jnp.ndarray],
    tf_ratio: jnp.ndarray,
    rng: jax.Array,
    cfg: Config,
    model: Lip2Speech,
):
    """Forward + loss dict + gradients, exactly as the train step computes
    them (factored out so diagnostics — e.g. ``tools/diagnose_nan.py``'s
    per-leaf nonfinite localization — probe the *same* computation the
    optimizer sees)."""
    step_rng = jax.random.fold_in(rng, state.step)
    names = ["gumbel", "teacher", "dropout", "postnet_dropout", "encoder_dropout"]
    keys = dict(zip(names, jax.random.split(step_rng, len(names))))

    bf16 = cfg.train.bf16
    fwd_batch = cast_floats(batch, jnp.bfloat16) if bf16 else batch
    is_trainable = trainable_mask(state.params)

    def loss_fn(params):
        # stop gradients at the frozen branches (vgg_face & co): their
        # updates are zeroed by the optimizer anyway, and stopping here
        # lets XLA drop the whole InceptionResnetV1 backward pass instead
        # of computing gradients that multi_transform discards
        params = jax.tree.map(
            lambda p, t: p if t else jax.lax.stop_gradient(p),
            params,
            is_trainable,
        )
        fwd_params = cast_floats(params, jnp.bfloat16) if bf16 else params
        fwd_stats = (
            cast_floats(state.batch_stats, jnp.bfloat16) if bf16 else state.batch_stats
        )
        outputs, updates = model.apply(
            {"params": fwd_params, "batch_stats": fwd_stats},
            fwd_batch["video"],
            fwd_batch.get("faces"),
            fwd_batch["mel"],
            tf_ratio,
            fwd_batch.get("speaker_embedding"),  # bypasses the face net if given
            keys,
            train=True,
            mutable=["batch_stats"],
        )
        outputs = uncast_floats(outputs) if bf16 else outputs
        new_stats = (
            uncast_floats(updates["batch_stats"]) if bf16 else updates["batch_stats"]
        )
        losses = lip2speech_loss(
            outputs,
            batch["mel"],
            batch["gate"],
            postnet_weight=cfg.train.postnet_loss_weight,
            mel_mask=batch.get("mel_mask") if cfg.train.masked_loss else None,
            kld_weight=cfg.train.kld_weight,
        )
        return losses["total"], (losses, new_stats)

    (loss, (losses, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    return losses, new_stats, grads


def all_finite(tree: Any) -> jnp.ndarray:
    """Scalar bool: every floating leaf of ``tree`` is finite."""
    checks = [
        jnp.all(jnp.isfinite(x))
        for x in jax.tree.leaves(tree)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
    ]
    return functools.reduce(jnp.logical_and, checks, jnp.asarray(True))


def guard_batch_stats(
    cfg: Config, grads: Any, new_stats: Any, old_stats: Any
) -> Any:
    """Reject the running-BN-stats update when the step is rejected.

    ``optax.apply_if_finite`` guards only the *parameter* update; the
    batch_stats come out of the forward pass and were written back
    unconditionally, so a single nonfinite batch poisoned the running
    stats permanently even while every param update was being rejected
    (observed on hardware: runs/overfit_r4c went irrecoverably NaN while
    notfinite_count climbed). Keep the old stats under the same predicate
    the optimizer uses, plus finiteness of the stats themselves."""
    reject = cfg.train.reject_grad_norm_above
    if not (cfg.train.skip_nonfinite_updates or reject > 0.0):
        return new_stats
    ok = jnp.logical_and(all_finite(grads), all_finite(new_stats))
    if reject > 0.0:
        # mirror reject_above_norm: a rejected step must not advance the
        # BN running stats either
        ok = jnp.logical_and(ok, optax.global_norm(grads) <= reject)
    return jax.tree.map(
        lambda n, o: jnp.where(ok, n, o), new_stats, old_stats
    )


def _find_notfinite_count(opt_state):
    """Locate the ApplyIfFiniteState counter anywhere in the (possibly
    chain-nested, when reject_grad_norm_above wraps it) optimizer state."""
    if hasattr(opt_state, "notfinite_count"):
        return opt_state.notfinite_count
    if isinstance(opt_state, (tuple, list)):
        for s in opt_state:
            found = _find_notfinite_count(s)
            if found is not None:
                return found
    return None


def train_step(
    state: TrainState,
    batch: dict[str, jnp.ndarray],
    tf_ratio: jnp.ndarray,
    rng: jax.Array,
    cfg: Config,
    model: Lip2Speech,
    tx: optax.GradientTransformation,
):
    """One optimization step. ``batch`` keys: video (B,T,H,W,3),
    faces (B,2,160,160,3), mel (B,80,M), gate (B,M), mel_mask (B,M)."""
    losses, new_stats, grads = loss_and_grad(state, batch, tf_ratio, rng, cfg, model)
    new_stats = guard_batch_stats(cfg, grads, new_stats, state.batch_stats)

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    metrics = dict(losses)
    metrics["grad_norm"] = optax.global_norm(grads)
    nfc = _find_notfinite_count(new_opt_state)
    if nfc is not None:
        metrics["notfinite_count"] = nfc

    return (
        TrainState(state.step + 1, new_params, new_stats, new_opt_state),
        metrics,
    )


def make_train_step(cfg: Config, model: Lip2Speech, tx):
    """jit-compiled train step (donates state for in-place buffers)."""
    return jax.jit(
        functools.partial(train_step, cfg=cfg, model=model, tx=tx),
        donate_argnums=(0,),
    )
