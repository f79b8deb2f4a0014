"""Optional WGAN adversarial training mode.

The reference implements an adversarial pair (WGAN critic over random mel
patches + feature-matching generator loss,
``/root/reference/train_utils/losses.py:83-136``) but never wires it into
its default loop. Here it is a first-class opt-in
(``--override train.adversarial=True``): :func:`adversarial_train_step`
is ONE jitted program per iteration that (1) adds the generator terms
(-D(fake) + 10x L1 feature matching) to the model loss/gradients and
(2) updates the critic with rmsprop + weight clamping on the fresh fake
mels, mirroring the reference's ``AdversarialLoss.forward`` +
``discriminator_forward`` semantics. The train CLI switches to this step
when the knob is on (cli/train.py).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from lip2speech_tpu.config import Config
from lip2speech_tpu.models import Discriminator, sample_patch
from lip2speech_tpu.train.losses import (
    clamp_discriminator_params,
    discriminator_loss,
    generator_loss,
)


class CriticState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def init_critic(cfg: Config, rng: jax.Array, batch_size: int = 2):
    disc = Discriminator(cfg.model)
    mel = jnp.zeros((batch_size, cfg.model.n_mels, cfg.data.max_mel_frames))
    spk = jnp.zeros((batch_size, cfg.model.face_embedding_dim))
    patch = sample_patch(rng, mel.shape[-1], cfg.model.discriminator_patch)
    # jitted init: eager flax init dispatches per-op through the device
    # tunnel (see cli/common.init_variables)
    import functools

    variables = jax.jit(functools.partial(disc.init, train=False))(
        rng, mel, spk, patch
    )
    tx = optax.rmsprop(cfg.train.adversarial_critic_lr)  # standard WGAN critic
    return (
        disc,
        tx,
        CriticState(
            variables["params"],
            variables.get("batch_stats", {}),
            tx.init(variables["params"]),
        ),
    )


def critic_step(
    critic: CriticState,
    real_mel: jnp.ndarray,
    fake_mel: jnp.ndarray,
    speaker: jnp.ndarray,
    rng: jax.Array,
    disc: Discriminator,
    tx,
):
    """WGAN critic update + weight clamp (losses.py:114-136)."""
    patch = sample_patch(rng, real_mel.shape[-1], disc.cfg.discriminator_patch)
    fake_mel = jax.lax.stop_gradient(fake_mel)
    speaker = jax.lax.stop_gradient(speaker)

    def loss_fn(params):
        vars_ = {"params": params, "batch_stats": critic.batch_stats}
        real_pred, upd = disc.apply(
            vars_, real_mel, speaker, patch, train=True, mutable=["batch_stats"]
        )
        fake_pred, _ = disc.apply(
            vars_, fake_mel, speaker, patch, train=True, mutable=["batch_stats"]
        )
        return discriminator_loss(real_pred, fake_pred), upd["batch_stats"]

    (d_loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        critic.params
    )
    updates, new_opt = tx.update(grads, critic.opt_state, critic.params)
    new_params = optax.apply_updates(critic.params, updates)
    new_params = clamp_discriminator_params(new_params)  # ±0.01 clip
    # Non-finite protection, mirroring the generator's apply_if_finite: a
    # single NaN/Inf generator forward (e.g. transient bf16 overflow)
    # must not poison the critic permanently — clamp(NaN) stays NaN, so
    # without this every later generator step would see NaN adversarial
    # terms and the run would stall unrecoverably.
    ok = jnp.isfinite(d_loss) & jnp.isfinite(optax.global_norm(grads))

    def keep_if_ok(new, old):
        return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)

    return (
        CriticState(
            keep_if_ok(new_params, critic.params),
            keep_if_ok(new_stats, critic.batch_stats),
            keep_if_ok(new_opt, critic.opt_state),
        ),
        d_loss,
    )


def generator_terms(
    critic: CriticState,
    real_mel: jnp.ndarray,
    fake_mel: jnp.ndarray,
    speaker: jnp.ndarray,
    rng: jax.Array,
    disc: Discriminator,
):
    """Generator-side adversarial losses (same patch for real/fake — the
    reference's same_rand contract, losses.py:101-102)."""
    patch = sample_patch(rng, real_mel.shape[-1], disc.cfg.discriminator_patch)
    vars_ = {"params": critic.params, "batch_stats": critic.batch_stats}
    real_pred, real_feats = disc.apply(
        vars_, jax.lax.stop_gradient(real_mel), speaker, patch,
        train=False, return_features=True,
    )
    fake_pred, fake_feats = disc.apply(
        vars_, fake_mel, speaker, patch, train=False, return_features=True
    )
    return generator_loss(fake_pred, fake_feats, real_feats)


def make_critic_step(disc: Discriminator, tx):
    return jax.jit(functools.partial(critic_step, disc=disc, tx=tx), donate_argnums=(0,))


def adversarial_train_step(
    state,
    critic: CriticState,
    batch: dict[str, jnp.ndarray],
    tf_ratio: jnp.ndarray,
    rng: jax.Array,
    cfg: Config,
    model,
    tx,
    disc: Discriminator,
    critic_tx,
):
    """One combined generator+critic optimization step.

    The generator half mirrors train_step.train_step (same losses, bf16
    policy, freeze semantics) with the adversarial terms added to the
    total (reference AdversarialLoss.forward, losses.py:90-112); the
    critic half then takes its WGAN step + weight clamp on the same fresh
    fake mels (discriminator_forward, losses.py:114-136).
    """
    import optax as _optax

    from lip2speech_tpu.train.losses import lip2speech_loss
    from lip2speech_tpu.train.train_step import (
        TrainState,
        cast_floats,
        trainable_mask,
        uncast_floats,
    )

    step_rng = jax.random.fold_in(rng, state.step)
    names = [
        "gumbel", "teacher", "dropout", "postnet_dropout", "encoder_dropout",
        "patch_g", "patch_d",
    ]
    keys = dict(zip(names, jax.random.split(step_rng, len(names))))

    bf16 = cfg.train.bf16
    fwd_batch = cast_floats(batch, jnp.bfloat16) if bf16 else batch
    is_trainable = trainable_mask(state.params)

    def loss_fn(params):
        # see train_step.loss_fn: stop gradients at the frozen branches so
        # XLA drops their backward passes (their updates are zeroed anyway)
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
            fwd_batch.get("speaker_embedding"),
            {k: keys[k] for k in names[:5]},
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
        adv = generator_terms(
            critic, batch["mel"], outputs["mel_postnet"],
            outputs["speaker_embedding"], keys["patch_g"], disc,
        )
        losses = dict(losses)
        losses.update(adv)
        losses["total"] = losses["total"] + adv["g_loss"] + adv["g_d_fm_loss"]
        aux = (losses, new_stats, jax.lax.stop_gradient(outputs["mel_postnet"]),
               jax.lax.stop_gradient(outputs["speaker_embedding"]))
        return losses["total"], aux

    (loss, (losses, new_stats, fake_mel, spk)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    from lip2speech_tpu.train.train_step import guard_batch_stats

    new_stats = guard_batch_stats(cfg, grads, new_stats, state.batch_stats)

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = _optax.apply_updates(state.params, updates)

    new_critic, d_loss = critic_step(
        critic, batch["mel"], fake_mel, spk, keys["patch_d"], disc, critic_tx
    )

    metrics = dict(losses)
    metrics["d_loss"] = d_loss
    metrics["grad_norm"] = _optax.global_norm(grads)
    from lip2speech_tpu.train.train_step import _find_notfinite_count

    nfc = _find_notfinite_count(new_opt_state)
    if nfc is not None:
        metrics["notfinite_count"] = nfc

    return (
        TrainState(state.step + 1, new_params, new_stats, new_opt_state),
        new_critic,
        metrics,
    )


def make_adversarial_train_step(cfg: Config, model, tx, disc: Discriminator, critic_tx):
    """jit-compiled combined step (donates model + critic state)."""
    return jax.jit(
        functools.partial(
            adversarial_train_step,
            cfg=cfg, model=model, tx=tx, disc=disc, critic_tx=critic_tx,
        ),
        donate_argnums=(0, 1),
    )
