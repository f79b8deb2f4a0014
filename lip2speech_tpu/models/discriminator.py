"""Mel-patch WGAN discriminator (flax).

TPU-native rebuild of ``/root/reference/model/modules/discriminator.py``:
a random temporal patch of the mel is fused with the speaker embedding and
classified by a Conv1d residual pyramid.

Static-shape divergence (documented): the reference slices a random patch
of random length 7..31 (discriminator.py:92-97) — a dynamic shape XLA can't
compile. Here the patch is a fixed-size ``cfg.discriminator_patch`` (=32)
window extracted with ``dynamic_slice`` at a random start, with frames
beyond the sampled length masked to zero before encoding. Same
distributional role, one compiled program.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lip2speech_tpu.config import ModelConfig
from lip2speech_tpu.models.layers import batch_norm


class ResidualBlock(nn.Module):
    """(Conv1d+BN+LeakyReLU) x2 with conv shortcut (discriminator.py:18-40).
    Operates on (B, T, C)."""

    features: int
    down_sample: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        stride = 2 if self.down_sample else 1
        res = nn.Conv(self.features, (1,), strides=(stride,), name="shortcut")(x)
        h = nn.Conv(self.features, (3,), padding=[(1, 1)], name="conv1")(x)
        h = batch_norm(train, name="bn1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.features, (3,), strides=(stride,), padding=[(1, 1)], name="conv2")(h)
        h = batch_norm(train, name="bn2")(h)
        h = nn.leaky_relu(h, 0.2)
        return h + res


def sample_patch(key: jax.Array, t: int, max_patch: int):
    """Sample (start, length) exactly like the reference: length ~ U{7..31}
    and start = max(0, 1 + u - length) with u ~ U{0..t-1}
    (discriminator.py:93-94) — so start+length <= t always and the start
    distribution piles at 0, not at t-length."""
    k1, k2 = jax.random.split(key)
    length = jax.random.randint(k1, (), 7, min(32, max_patch))
    u = jax.random.randint(k2, (), 0, t)
    start = jnp.maximum(1 + u - length, 0)
    return start, length


def extract_patch(
    mel: jnp.ndarray, start: jnp.ndarray, length: jnp.ndarray, P: int
) -> jnp.ndarray:
    """mel (B, n_mels, T) -> (B, P, n_mels): frames [start, start+length)
    at positions [0, length), zeros after (the static-shape equivalent of
    the reference's ``x[:, :, start:end]`` ragged slice).

    ``dynamic_slice`` clamps its own start to T-P, which would silently
    shift the window off the sampled start (and the mask with it) whenever
    start > T-P — so slice from the clamped base and roll the intended
    frames to position 0 so the mask always covers them."""
    T = mel.shape[-1]
    x = jnp.swapaxes(mel, 1, 2)  # (B, T, n_mels)
    base = jnp.minimum(start, jnp.maximum(T - P, 0))
    x = jax.lax.dynamic_slice_in_dim(x, base, P, axis=1)  # (B, P, n_mels)
    x = jnp.roll(x, -(start - base), axis=1)
    mask = (jnp.arange(P) < length)[None, :, None]
    return jnp.where(mask, x, 0.0)


class Discriminator(nn.Module):
    """(B, n_mels, T) mel + (B, 256) speaker -> (B,) WGAN logit.

    ``patch`` = (start, length) from :func:`sample_patch`; pass the same
    tuple for real/fake to mirror the reference's ``same_rand`` contract.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,
        speaker_embedding: jnp.ndarray,
        patch: tuple[jnp.ndarray, jnp.ndarray],
        train: bool = True,
        return_features: bool = False,
        dropout_key: jax.Array | None = None,
    ):
        c = self.cfg
        P = c.discriminator_patch
        start, length = patch
        B, n_mels, T = mel.shape

        x = extract_patch(mel, start, length, P)  # (B, P, n_mels)

        h_mel = nn.leaky_relu(nn.Dense(256, name="mel_encoder")(x), 0.2)
        spk = nn.soft_sign(nn.Dense(256, name="speaker_encoder")(speaker_embedding))
        spk = jnp.tile(spk[:, None, :], (1, P, 1))

        h = jnp.concatenate([h_mel, spk], axis=-1)
        h = nn.leaky_relu(nn.Dense(384, name="enc_0")(h), 0.2)
        h = nn.leaky_relu(nn.Dense(256, name="enc_1")(h), 0.2)
        if train and dropout_key is not None:
            keep = 0.9
            m = jax.random.bernoulli(jax.random.fold_in(dropout_key, 0), keep, h.shape)
            h = jnp.where(m, h / keep, 0.0)

        features = []
        dims = [(256, True), (384, True), (512, True), (768, True), (1024, False)]
        for i, (f, down) in enumerate(dims):
            h = ResidualBlock(f, down_sample=down, name=f"res_{i}")(h, train)
            features.append(h)

        pooled = jnp.mean(h, axis=1)  # adaptive avg pool over time
        if train and dropout_key is not None:
            keep = 0.8
            m = jax.random.bernoulli(jax.random.fold_in(dropout_key, 1), keep, pooled.shape)
            pooled = jnp.where(m, pooled / keep, 0.0)
        out = nn.Dense(1, name="fc")(pooled)[:, 0]

        if return_features:
            return out, features
        return out
