"""Adversarial (WGAN) training-mode tests."""

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import Config, ModelConfig
from lip2speech_tpu.train.adversarial import (
    generator_terms,
    init_critic,
    make_critic_step,
)

CFG = Config(model=ModelConfig(discriminator_patch=32))


def test_critic_step_clamps_and_learns():
    rng = jax.random.PRNGKey(0)
    disc, tx, critic = init_critic(CFG, rng, batch_size=4)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 80, 80)) - 5.0
    fake = jax.random.normal(jax.random.PRNGKey(2), (4, 80, 80)) + 5.0
    spk = jax.random.normal(jax.random.PRNGKey(3), (4, 256)) * 0.1

    step = make_critic_step(disc, tx)
    losses = []
    for i in range(3):
        critic, d_loss = step(critic, real, fake, spk, jax.random.fold_in(rng, i))
        losses.append(float(d_loss))
        assert np.isfinite(losses[-1])
    # weight clipping held (WGAN clamp ±0.01)
    for leaf in jax.tree.leaves(critic.params):
        assert float(jnp.abs(leaf).max()) <= 0.01 + 1e-6
    # critic separates obviously-different real/fake better over steps
    assert losses[-1] < losses[0]


def test_generator_terms_finite_and_signed():
    rng = jax.random.PRNGKey(0)
    disc, tx, critic = init_critic(CFG, rng, batch_size=4)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 80, 80))
    fake = real + 0.1
    spk = jnp.zeros((4, 256))
    terms = generator_terms(critic, real, fake, spk, rng, disc)
    assert set(terms) == {"g_loss", "g_d_fm_loss"}
    assert np.isfinite(float(terms["g_loss"]))
    assert float(terms["g_d_fm_loss"]) >= 0
