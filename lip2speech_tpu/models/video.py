"""Lip (mouth-ROI) video encoder: 3D conv front-end + ShuffleNetV2 trunk.

TPU-native redesign of ``/root/reference/model/modules/video.py:26-87``:
video is ``(B, T, H, W, 3)`` channels-last, and — new in round 4 — NO 5D
tensor ever reaches the device. The k=(5,7,7) s=(1,2,2) Conv3d is run as
a standard 7x7 2D convolution over the 5 temporal taps folded into
channels (pad T by 2, concatenate the 5 shifted slices -> 15 input
channels), and everything downstream (BN, PReLU, the (1,3,3) max-pool
that never pools over time, the ShuffleNet trunk) is per-frame 2D on the
folded ``(B*T, H, W, C)`` layout. The math is identical (same
contraction per output element; ``tools/bench_encoder_interior.py`` pins
the folded conv against ``conv3d`` in f32) but the 5D NTHWC layouts XLA
picked for the conv/elementwise/pool ops measured ~17 ms of glue at
B=64 on v5e — more than the trunk itself (DESIGN.md round-4 section).

The parameter tree is unchanged (``frontend_conv/kernel`` keeps the
reference's (5, 7, 7, 3, C) shape), so Orbax checkpoints and the .pth
converter are unaffected.

Output: ``(B, T, 768)`` for width 1.0 at 96x96 input, L2-normalized per
frame (video.py:85).
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


def fold_time_taps(video: jnp.ndarray, taps: int = 5) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B*T, H, W, taps*C).

    Zero-pads T by taps//2 (the Conv3d's temporal 'same' padding) and
    concatenates the taps time-shifted views on the channel axis, so a
    k=(taps, kh, kw) conv3d with temporal stride 1 becomes a (kh, kw)
    conv2d over taps*C input channels. Channel block ``dt`` holds
    ``x[t + dt - taps//2]`` — matching a kernel reshaped by concatenating
    its taps on the input-channel axis."""
    B, T, H, W, C = video.shape
    r = taps // 2
    xp = jnp.pad(video, ((0, 0), (r, r), (0, 0), (0, 0), (0, 0)))
    folded = jnp.concatenate([xp[:, dt : dt + T] for dt in range(taps)], axis=-1)
    return folded.reshape(B * T, H, W, taps * C)


class _FrontendConv(nn.Module):
    """The reference Conv3d's parameters, applied as the folded 2D conv.

    Named ``frontend_conv`` with a ``kernel`` of the reference shape so
    the checkpoint tree is byte-compatible with the previous 3D lowering
    and the .pth converter's mapping."""

    features: int

    @nn.compact
    def __call__(self, folded: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", sqrt_fan_init, (5, 7, 7, 3, self.features))
        taps = kernel.shape[0]
        # (5,7,7,3,C) -> (7,7,15,C): input-channel blocks ordered by tap,
        # matching fold_time_taps' concat order
        k2 = jnp.concatenate([kernel[i] for i in range(taps)], axis=2)
        dt = jnp.result_type(folded.dtype, kernel.dtype)
        return jax.lax.conv_general_dilated(
            folded.astype(dt),
            k2.astype(dt),
            window_strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


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
        # PReLU + MaxPool3d k=(1,3,3) s=(1,2,2) — all executed 2D on the
        # time-folded layout (module docstring)
        x = fold_time_taps(video)  # (B*T, H, W, 15)
        x = _FrontendConv(self.frontend_channels, name="frontend_conv")(x)
        x = batch_norm(train, name="frontend_bn")(x)
        x = PReLU(self.frontend_channels, name="frontend_prelu")(x)
        x = nn.max_pool(
            x,
            window_shape=(3, 3),
            strides=(2, 2),
            padding=[(1, 1), (1, 1)],
        )

        # already folded: one big batched 2D conv stack
        # (threeD_to_2D_tensor, video.py:20-23)
        feats = ShuffleNetV2Trunk(self.width_mult, name="trunk")(x, train)
        feats = feats.reshape(B, T, -1)

        # L2 normalize per frame (video.py:85)
        norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats / jnp.maximum(norm, 1e-12)
