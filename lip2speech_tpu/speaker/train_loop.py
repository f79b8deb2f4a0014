"""Speaker-encoder pretraining: one jitted step, three param groups.

Rebuild of ``/root/reference/speaker_encoder/train.py:53-241``: frozen
voice encoder produces speech embeddings; the trainable FaceRecognizer is
pulled toward them with the CLIP-style contrastive loss (learnable
temperature, its own Adam) + an L2 term; a FaceDecoder reconstructs the
face from either embedding (p=0.5 per step) under a 10x MSE loss with its
own Adam; the face net uses SGD(momentum 0.9, lr 1e-3, wd 1e-5) with
cosine annealing per epoch and grad-clip 10. All three updates happen in
ONE compiled step via optax.multi_transform over a combined param tree.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from lip2speech_tpu.config import Config
from lip2speech_tpu.ops import image as image_ops
from lip2speech_tpu.speaker.losses import contrastive_loss, reconstruction_loss
from lip2speech_tpu.speaker.models import FaceDecoder, FaceRecognizer, SpeakerEncoder


class SpeakerTrainState(NamedTuple):
    step: jnp.ndarray
    params: Any          # {"face": ..., "decoder": ..., "t": scalar}
    batch_stats: Any     # {"face": ..., "decoder": ...}
    frozen: Any          # {"speaker": ...} voice-encoder variables
    opt_state: Any


def make_speaker_optimizer(steps_per_epoch: int, max_epochs: int = 100):
    face_tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.add_decayed_weights(1e-5),
        optax.sgd(
            optax.cosine_decay_schedule(1e-3, steps_per_epoch * max_epochs),
            momentum=0.9,
        ),
    )
    label_of = {"face": "face", "decoder": "adam", "t": "t"}
    return optax.multi_transform(
        {"face": face_tx, "adam": optax.adam(1e-3), "t": optax.adam(1e-3)},
        lambda params: {k: label_of[k] for k in params},
    )


def init_speaker_training(cfg: Config, rng: jax.Array, batch_size: int = 4):
    face_net = FaceRecognizer()
    decoder = FaceDecoder()
    speaker = SpeakerEncoder(cfg.model)

    k1, k2, k3 = jax.random.split(rng, 3)
    faces = jnp.zeros((batch_size, 160, 160, 3))
    # jitted inits: eager flax init dispatches per-op through the device
    # tunnel (see cli/common.init_variables)
    import functools

    face_vars = jax.jit(functools.partial(face_net.init, train=False))(k1, faces)
    dec_vars = jax.jit(functools.partial(decoder.init, train=False))(
        k2, jnp.zeros((batch_size, 256))
    )
    spk_vars = jax.jit(speaker.init)(k3, jnp.zeros((batch_size, 32000)))

    params = {
        "face": face_vars["params"],
        "decoder": dec_vars["params"],
        "t": jnp.float32(1.0),  # contrastive temperature (losses.py:41)
    }
    batch_stats = {
        "face": face_vars.get("batch_stats", {}),
        "decoder": dec_vars.get("batch_stats", {}),
    }
    return (face_net, decoder, speaker), params, batch_stats, spk_vars


def speaker_train_step(
    state: SpeakerTrainState,
    batch: dict[str, jnp.ndarray],
    rng: jax.Array,
    models,
    tx,
):
    face_net, decoder, speaker = models
    step_rng = jax.random.fold_in(rng, state.step)
    k_choice, k_drop = jax.random.split(step_rng)

    faces = image_ops.normalize_face(batch["faces_u8"])

    # frozen voice embedding (train.py:143-144)
    speech_emb = jax.lax.stop_gradient(
        speaker.apply(state.frozen, batch["speech"])
    )

    def loss_fn(params):
        face_emb, face_upd = face_net.apply(
            {"params": params["face"], "batch_stats": state.batch_stats["face"]},
            faces, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(step_rng, 1)},
        )
        # decode from face- or speech-embeddings p=0.5 (train.py:148-151)
        use_face = jax.random.bernoulli(k_choice)
        dec_in = jnp.where(
            use_face, jax.lax.stop_gradient(face_emb), speech_emb
        )
        recon, dec_upd = decoder.apply(
            {"params": params["decoder"], "batch_stats": state.batch_stats["decoder"]},
            dec_in, train=True, dropout_key=k_drop, mutable=["batch_stats"],
        )
        losses = contrastive_loss(speech_emb, face_emb, params["t"])
        losses.update(reconstruction_loss(recon, faces))
        losses["loss"] = losses["c_loss"] + losses["l2_loss"] + losses["rec_loss"]
        stats = {
            "face": face_upd["batch_stats"],
            "decoder": dec_upd["batch_stats"],
        }
        return losses["loss"], (losses, stats)

    (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # clamp t <= 100 (losses.py:44)
    new_params["t"] = jnp.clip(new_params["t"], max=100.0)

    metrics = {k: v for k, v in losses.items()}
    metrics["grad_norm"] = optax.global_norm(grads["face"])
    metrics["t"] = new_params["t"]
    return (
        SpeakerTrainState(state.step + 1, new_params, new_stats, state.frozen, new_opt),
        metrics,
    )


def make_speaker_train_step(models, tx):
    return jax.jit(
        functools.partial(speaker_train_step, models=models, tx=tx),
        donate_argnums=(0,),
    )
