"""Speaker-encoder pretraining models (flax).

Rebuild of ``/root/reference/speaker_encoder/model.py``: the trainable
FaceRecognizer and frozen voice SpeakerEncoder are the main-model classes
reused directly (model.py:14-95 duplicates them; we don't);
``SpeakerDecoder`` (embedding -> 40-mel sequence, model.py:99-116) and
``FaceDecoder`` (embedding -> 160x160 image, model.py:121-182) are rebuilt
channels-last.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lip2speech_tpu.config import ModelConfig
from lip2speech_tpu.models.face import FaceRecognizer  # noqa: F401 (re-export)
from lip2speech_tpu.models.layers import LSTM, batch_norm
from lip2speech_tpu.models.speaker import SpeakerEncoder  # noqa: F401


class SpeakerDecoder(nn.Module):
    """(B, 256) -> (B, 201, 40) mel sequence (model.py:99-116)."""

    seq_len: int = 201

    @nn.compact
    def __call__(self, x):
        tiled = jnp.tile(x[:, None, :], (1, self.seq_len, 1))
        out, _ = LSTM(256, num_layers=3, name="lstm")(tiled)
        return nn.Dense(40, name="linear")(out)


class ConvBlock(nn.Module):
    """Inverted-bottleneck residual block (model.py:121-139)."""

    out_chns: int
    exp_r: int = 6

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_c = x.shape[-1]
        h = nn.Conv(in_c * self.exp_r, (1, 1), name="pw")(x)
        h = batch_norm(train, name="pw_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.out_chns, (3, 3), padding=[(1, 1), (1, 1)],
            feature_group_count=self.out_chns
            if (in_c * self.exp_r) % self.out_chns == 0 else 1,
            name="dw",
        )(h)
        h = batch_norm(train, name="dw_bn")(h)
        h = nn.relu(h)
        res = nn.Conv(self.out_chns, (1, 1), name="shortcut")(x)
        return h + res


class FaceDecoder(nn.Module):
    """(B, 256) identity embedding -> (B, 160, 160, 3) face
    (model.py:142-182): 5x5x512 seed, 4 ConvBlock+bilinear-up stages."""

    @nn.compact
    def __call__(self, x, train: bool = True, dropout_key: jax.Array | None = None):
        res, lsize = 5, 512
        h = nn.Dense(res * res * lsize, name="linear")(x)
        if train and dropout_key is not None:
            keep = 0.7
            mask = jax.random.bernoulli(dropout_key, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
        h = h.reshape(-1, res, res, lsize)

        def up(z, chns):
            b, hh, ww, c = z.shape
            z = jax.image.resize(z, (b, hh * 2, ww * 2, c), "bilinear")
            return nn.Conv(chns, (3, 3), padding=[(1, 1), (1, 1)])(z)

        h = ConvBlock(256)(h, train)
        h = up(h, 256)
        h = ConvBlock(128)(h, train)
        h = up(h, 128)
        h = ConvBlock(64)(h, train)
        h = up(h, 64)
        h = ConvBlock(64)(h, train)
        h = up(h, 64)
        h = nn.Conv(3, (1, 1), name="to_rgb")(h)
        b, hh, ww, c = h.shape
        return jax.image.resize(h, (b, 160, 160, c), "bilinear")


def get_network(cfg: ModelConfig):
    """fnet (trainable) + snet (frozen) (model.py:185-192)."""
    return FaceRecognizer(), SpeakerEncoder(cfg)
