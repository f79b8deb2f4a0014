"""Adversarial (WGAN) training-mode tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_adversarial_train_step_integration():
    """VERDICT r2 item 5: N combined generator+critic steps on the virtual
    DP mesh — finite losses, MOVING critic loss, adversarial terms in the
    metrics, critic weights clamped."""
    import dataclasses

    from lip2speech_tpu.models import Lip2Speech
    from lip2speech_tpu.parallel import batch_sharding, create_mesh, replicated
    from lip2speech_tpu.train import create_train_state, make_optimizer
    from lip2speech_tpu.train.adversarial import make_adversarial_train_step

    tiny = ModelConfig(
        ffn_hidden_dim=128,
        content_vocab_size=33,
        content_latent_dim=64,
        max_decoder_steps=12,
        postnet_embedding_dim=64,
        shufflenet_width=0.5,
        discriminator_patch=8,  # must fit the 12-frame tiny mels
    )
    cfg = Config(model=tiny)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, adversarial=True)
    )
    model = Lip2Speech(tiny)
    b, t, m = 8, 6, 12
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    batch = {
        "video": jax.random.normal(ks[0], (b, t, 32, 32, 3)) * 0.1,
        "speaker_embedding": jax.random.normal(ks[1], (b, 256)) * 0.1,
        "mel": jax.random.normal(ks[2], (b, 80, m)) - 5.0,
        "gate": jnp.zeros((b, m)).at[:, -1].set(1.0),
        "mel_mask": jnp.ones((b, m), bool),
    }
    rngs = {
        "gumbel": jax.random.PRNGKey(1),
        "teacher": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["video"], None, batch["mel"], 0.5,
        batch["speaker_embedding"], rngs, train=False,
    )
    tx = make_optimizer(cfg, variables["params"])
    state = create_train_state(cfg, variables)
    disc, critic_tx, critic = init_critic(cfg, jax.random.PRNGKey(7), b)

    mesh = create_mesh(n_data=8, n_model=1)
    state = jax.device_put(state, replicated(mesh))
    critic = jax.device_put(critic, replicated(mesh))
    sbatch = jax.device_put(batch, batch_sharding(mesh))

    step_fn = make_adversarial_train_step(cfg, model, tx, disc, critic_tx)
    d_losses, totals = [], []
    for i in range(4):
        state, critic, metrics = step_fn(
            state, critic, sbatch, jnp.float32(0.5), jax.random.PRNGKey(11)
        )
        d_losses.append(float(metrics["d_loss"]))
        totals.append(float(metrics["total"]))
        assert np.isfinite(d_losses[-1]) and np.isfinite(totals[-1])
        assert np.isfinite(float(metrics["g_loss"]))
        assert float(metrics["g_d_fm_loss"]) >= 0
    # the critic is actually optimizing: its loss MOVES across steps
    assert len({round(x, 7) for x in d_losses}) > 1, d_losses
    # weight clamp held through the combined step
    for leaf in jax.tree.leaves(critic.params):
        assert float(jnp.abs(leaf).max()) <= 0.01 + 1e-6
    assert int(state.step) == 4


@pytest.mark.slow
def test_critic_step_skips_nonfinite_update():
    """A NaN generator forward must not poison the critic: params,
    batch stats, and opt state all keep their previous (finite) values."""
    rng = jax.random.PRNGKey(0)
    disc, tx, critic = init_critic(CFG, rng, batch_size=4)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 80, 80)) - 5.0
    spk = jax.random.normal(jax.random.PRNGKey(3), (4, 256)) * 0.1
    step = make_critic_step(disc, tx)

    # one healthy step so the state is non-trivial
    fake = jax.random.normal(jax.random.PRNGKey(2), (4, 80, 80))
    critic, _ = step(critic, real, fake, spk, jax.random.fold_in(rng, 0))
    before = jax.tree.map(np.asarray, critic.params)

    nan_fake = jnp.full((4, 80, 80), jnp.nan)
    critic2, d_loss = step(critic, real, nan_fake, spk, jax.random.fold_in(rng, 1))
    assert not np.isfinite(float(d_loss))  # loss reports the event
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(critic2.params)):
        np.testing.assert_array_equal(np.asarray(b), a)
    for leaf in jax.tree.leaves(critic2.batch_stats):
        assert np.isfinite(np.asarray(leaf)).all()

    # and the critic still works on the next finite batch
    critic3, d3 = step(critic2, real, fake, spk, jax.random.fold_in(rng, 2))
    assert np.isfinite(float(d3))
