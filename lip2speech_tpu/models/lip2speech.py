"""Top-level Lip2Speech model (flax).

TPU-native rebuild of ``/root/reference/model/model.py:13-72``: mouth-ROI
video -> VideoExtractor features, first face crop -> FaceRecognizer
identity embedding (stop-gradient, eval-mode — the reference runs it under
``no_grad`` inside ``inference`` and excludes it from the optimizer,
train.py:102-104), concat -> Decoder.

API edge layouts match the reference contract:
  video: (B, T, H, W, 3) channels-last (reference uses (B,3,T,H,W); the
         host loader emits channels-last directly — TPU-preferred)
  faces: (B, n_crops, Hf, Wf, 3)
  mels:  (B, n_mels, M)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lip2speech_tpu.config import ModelConfig
from lip2speech_tpu.models.decoder import Decoder
from lip2speech_tpu.models.face import FaceRecognizer
from lip2speech_tpu.models.video import VideoExtractor


class Lip2Speech(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,
        faces: jnp.ndarray | None = None,
        mels: jnp.ndarray | None = None,
        tf_ratio: jnp.ndarray | float = 1.0,
        speaker_embedding: jnp.ndarray | None = None,
        rngs: dict[str, jax.Array] | None = None,
        train: bool = True,
    ) -> dict[str, Any]:
        """Training forward when ``mels`` is given (model.py:23-40); full
        inference when ``mels is None`` (model.py:43-58). An external
        ``speaker_embedding`` (e.g. from the voice SpeakerEncoder) replaces
        the face-derived one, mirroring ``inference``'s optional arg."""
        if rngs is None:
            rngs = {
                "gumbel": jax.random.PRNGKey(0),
                "teacher": jax.random.PRNGKey(1),
            }
        inference = mels is None

        feats = VideoExtractor(
            self.cfg.frontend_channels, self.cfg.shufflenet_width, name="encoder"
        )(video, train=train)

        if train and "encoder_dropout" in rngs:
            keep = 1.0 - self.cfg.encoder_feature_dropout
            mask = jax.random.bernoulli(rngs["encoder_dropout"], keep, feats.shape)
            feats = jnp.where(mask, feats / keep, 0.0)

        if speaker_embedding is None:
            face_net = FaceRecognizer(name="vgg_face")
            emb = face_net(faces[:, 0], train=False)  # eval-mode BN, first crop
            emb = nn.relu(emb)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
            )
            # no_grad in the reference (vgg_face.py:56; train.py:102-104)
            speaker_embedding = jax.lax.stop_gradient(emb)

        T = feats.shape[1]
        visual = jnp.concatenate(
            [feats, jnp.tile(speaker_embedding[:, None, :], (1, T, 1))], axis=-1
        )

        out = Decoder(self.cfg, name="decoder")(
            visual,
            speaker_embedding,
            mels=mels,
            tf_ratio=tf_ratio,
            rngs=rngs,
            train=train and not inference,
        )
        # conditioning vector, exposed for the WGAN critic (the reference's
        # AdversarialLoss consumes the same embedding, losses.py:92-99)
        out["speaker_embedding"] = speaker_embedding
        return out


def get_network(cfg: ModelConfig) -> Lip2Speech:
    """Mirror of ``model.get_network`` (model.py:62-72); train/eval mode is
    an argument of ``__call__`` in the functional style."""
    return Lip2Speech(cfg)
