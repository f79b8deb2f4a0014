"""Speaker-encoder pretraining losses.

Rebuild of ``/root/reference/speaker_encoder/losses.py``:
  * :func:`contrastive_loss` — CLIP-style symmetric cross-entropy on
    face @ speech.T with a learnable temperature clamped <= 100, plus an
    L2 MSE between relu+normalized embeddings (losses.py:27-65).
  * :func:`reconstruction_loss` — 10x MSE (losses.py:105-120).
  * :func:`gram_matrix` / :func:`style_loss` — the (unused in the
    reference default loop) VGG-style gram criterion, kept for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def contrastive_loss(
    speech_embeddings: jnp.ndarray,
    face_embeddings: jnp.ndarray,
    temperature: jnp.ndarray,
) -> dict[str, jnp.ndarray]:
    t = jnp.clip(temperature, max=100.0)
    n = face_embeddings.shape[0]

    l2 = jnp.mean(
        jnp.square(
            _norm(jax.nn.relu(face_embeddings)) - _norm(jax.nn.relu(speech_embeddings))
        )
    )

    logits = face_embeddings @ speech_embeddings.T * t
    labels = jnp.arange(n)
    # the reference weights every class by (N-1); uniform weights scale the
    # CE by a constant, so this matches up to that constant
    ce_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    ce_b = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return {"l2_loss": l2, "c_loss": (ce_a + ce_b) / 2.0}


def reconstruction_loss(pred: jnp.ndarray, target: jnp.ndarray) -> dict:
    return {"rec_loss": 10.0 * jnp.mean(jnp.square(pred - target))}


def gram_matrix(feats: jnp.ndarray) -> jnp.ndarray:
    b = feats.shape[0]
    f = feats.reshape(b, -1)
    g = f[:, :, None] @ f[:, None, :]
    return g / f.shape[-1]


def style_loss(pred_feats: jnp.ndarray, target_feats: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        jnp.square(gram_matrix(pred_feats) - jax.lax.stop_gradient(gram_matrix(target_feats)))
    )
