"""Shared setup for the multi-host integration test: a deterministic tiny
model + batch + one sharded train step, used identically by the parent
(single-process, 8 virtual devices) and each distributed worker."""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lip2speech_tpu.config import Config, ModelConfig

TINY = ModelConfig(
    ffn_hidden_dim=128,
    content_vocab_size=33,
    content_latent_dim=64,
    max_decoder_steps=8,
    postnet_embedding_dim=64,
    shufflenet_width=0.5,
)
GLOBAL_BATCH = 8


def make_setup():
    import dataclasses

    from lip2speech_tpu.models import Lip2Speech

    cfg = Config(model=TINY)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, bf16=False)
    )
    model = Lip2Speech(cfg.model)
    batch = build_global_batch()
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
    return cfg, model, variables


def build_global_batch():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    b, t, m, hw = GLOBAL_BATCH, 5, 8, 32
    return {
        "video": jax.random.normal(ks[0], (b, t, hw, hw, 3)) * 0.1,
        "speaker_embedding": jax.random.normal(ks[1], (b, 256)) * 0.1,
        "mel": jax.random.normal(ks[2], (b, 80, m)) - 5.0,
        "gate": jnp.zeros((b, m)).at[:, -1].set(1.0),
        "mel_mask": jnp.ones((b, m), bool),
    }


def run_one_step(cfg, model, variables, sharded_batch, mesh) -> float:
    from lip2speech_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    tx = make_optimizer(cfg, variables["params"])
    state = create_train_state(cfg, variables)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step_fn = make_train_step(cfg, model, tx)
    _, metrics = step_fn(
        state, sharded_batch, jnp.float32(0.5), jax.random.PRNGKey(7)
    )
    return float(metrics["total"])
