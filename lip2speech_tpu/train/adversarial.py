"""Optional WGAN adversarial training mode.

The reference implements an adversarial pair (WGAN critic over random mel
patches + feature-matching generator loss,
``/root/reference/train_utils/losses.py:83-136``) but never wires it into
its default loop. Here it is a first-class opt-in: one extra jitted step
that (1) updates the critic with weight clamping and (2) adds the
generator terms to the main model's gradients, mirroring the reference's
``discriminator_forward`` + ``AdversarialLoss`` semantics.
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
    variables = disc.init(rng, mel, spk, patch, train=False)
    tx = optax.rmsprop(5e-5)  # standard WGAN critic optimizer
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
    return CriticState(new_params, new_stats, new_opt), d_loss


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
