"""Lip (mouth-ROI) video encoder: 3D conv front-end + ShuffleNetV2 trunk.

TPU-native redesign of ``/root/reference/model/modules/video.py:26-87``:
video is ``(B, T, H, W, 3)`` channels-last, the time axis is folded into the
batch for the 2D trunk (one big batched conv — MXU-friendly), and features
are L2-normalized per frame (video.py:85).

Output: ``(B, T, 768)`` for width 1.0 at 96x96 input.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.models.layers import PReLU, batch_norm
from lip2speech_tpu.models.shufflenet import ShuffleNetV2Trunk, WIDTH_CHANNELS


def sqrt_fan_init(key, shape, dtype=jnp.float32):
    """Reference's custom conv init: normal(0, sqrt(2/n)), n = prod(kernel)
    * out_channels (video.py:27-51). Flax conv kernels are (*k, in, out)."""
    n = float(np.prod(shape[:-2]) * shape[-1])
    return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / n)


class VideoExtractor(nn.Module):
    """(B, T, H, W, 3) -> (B, T, C_video), L2-normalized."""

    frontend_channels: int = 24
    width_mult: float = 1.0

    @property
    def output_dim(self) -> int:
        return WIDTH_CHANNELS[self.width_mult][-1]

    @nn.compact
    def __call__(self, video: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        B, T, H, W, C = video.shape

        # frontend3D (video.py:68-72): Conv3d k=(5,7,7) s=(1,2,2) + BN +
        # PReLU + MaxPool3d k=(1,3,3) s=(1,2,2)
        x = nn.Conv(
            self.frontend_channels,
            kernel_size=(5, 7, 7),
            strides=(1, 2, 2),
            padding=[(2, 2), (3, 3), (3, 3)],
            use_bias=False,
            kernel_init=sqrt_fan_init,
            name="frontend_conv",
        )(video)
        x = batch_norm(train, name="frontend_bn")(x)
        x = PReLU(self.frontend_channels, name="frontend_prelu")(x)
        x = nn.max_pool(
            x,
            window_shape=(1, 3, 3),
            strides=(1, 2, 2),
            padding=[(0, 0), (1, 1), (1, 1)],
        )

        # Fold T into batch: one large 2D conv stack instead of a per-frame
        # loop (threeD_to_2D_tensor, video.py:20-23).
        _, Tn, Hn, Wn, Cn = x.shape
        x = x.reshape(B * Tn, Hn, Wn, Cn)
        feats = ShuffleNetV2Trunk(self.width_mult, name="trunk")(x, train)
        feats = feats.reshape(B, Tn, -1)

        # L2 normalize per frame (video.py:85)
        norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats / jnp.maximum(norm, 1e-12)
