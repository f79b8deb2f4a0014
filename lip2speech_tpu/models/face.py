"""Face-identity encoder: InceptionResnetV1 + projection head (flax, NHWC).

TPU-native rebuild of the reference ``FaceRecognizer``
(``/root/reference/model/modules/vgg_face.py:12-60``), which wraps
facenet-pytorch's ``InceptionResnetV1(pretrained='casia-webface')`` with a
512->512->GELU->256 projection. The backbone layer names mirror the
facenet state dict (conv2d_1a ... last_bn) so the checkpoint converter maps
weights 1:1; padding follows the facenet convention (VALID unless noted).

``inference`` = relu + L2-normalize (vgg_face.py:52-60); eval-mode BN.
Input faces are 160x160, normalized (x - 127.5) / 128 on the host.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class BasicConv2d(nn.Module):
    out: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out,
            kernel_size=self.kernel,
            strides=(self.stride, self.stride),
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3, name="bn"
        )(x)
        return nn.relu(x)


class Block35(nn.Module):
    """Inception-A residual block at 256 channels, scale 0.17."""

    scale: float = 0.17

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = BasicConv2d(32, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(32, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(32, (3, 3), padding=(1, 1), name="branch1_1")(b1, train)
        b2 = BasicConv2d(32, (1, 1), name="branch2_0")(x, train)
        b2 = BasicConv2d(32, (3, 3), padding=(1, 1), name="branch2_1")(b2, train)
        b2 = BasicConv2d(32, (3, 3), padding=(1, 1), name="branch2_2")(b2, train)
        up = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(256, (1, 1), name="conv2d")(up)
        return nn.relu(x + self.scale * up)


class Block17(nn.Module):
    """Inception-B residual block at 896 channels, scale 0.10."""

    scale: float = 0.10

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = BasicConv2d(128, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(128, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(128, (1, 7), padding=(0, 3), name="branch1_1")(b1, train)
        b1 = BasicConv2d(128, (7, 1), padding=(3, 0), name="branch1_2")(b1, train)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(896, (1, 1), name="conv2d")(up)
        return nn.relu(x + self.scale * up)


class Block8(nn.Module):
    """Inception-C residual block at 1792 channels, scale 0.20."""

    scale: float = 0.20
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = BasicConv2d(192, (1, 1), name="branch0")(x, train)
        b1 = BasicConv2d(192, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(192, (1, 3), padding=(0, 1), name="branch1_1")(b1, train)
        b1 = BasicConv2d(192, (3, 1), padding=(1, 0), name="branch1_2")(b1, train)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(1792, (1, 1), name="conv2d")(up)
        out = x + self.scale * up
        return out if self.no_relu else nn.relu(out)


class Mixed6a(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = BasicConv2d(384, (3, 3), stride=2, name="branch0")(x, train)
        b1 = BasicConv2d(192, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(192, (3, 3), padding=(1, 1), name="branch1_1")(b1, train)
        b1 = BasicConv2d(256, (3, 3), stride=2, name="branch1_2")(b1, train)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Mixed7a(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        b0 = BasicConv2d(256, (1, 1), name="branch0_0")(x, train)
        b0 = BasicConv2d(384, (3, 3), stride=2, name="branch0_1")(b0, train)
        b1 = BasicConv2d(256, (1, 1), name="branch1_0")(x, train)
        b1 = BasicConv2d(256, (3, 3), stride=2, name="branch1_1")(b1, train)
        b2 = BasicConv2d(256, (1, 1), name="branch2_0")(x, train)
        b2 = BasicConv2d(256, (3, 3), padding=(1, 1), name="branch2_1")(b2, train)
        b2 = BasicConv2d(256, (3, 3), stride=2, name="branch2_2")(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionResnetV1(nn.Module):
    """Backbone: (B, 160, 160, 3) -> (B, 512) raw embedding."""

    dropout_rate: float = 0.6

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConv2d(32, (3, 3), stride=2, name="conv2d_1a")(x, train)
        x = BasicConv2d(32, (3, 3), name="conv2d_2a")(x, train)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="conv2d_2b")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="conv2d_3b")(x, train)
        x = BasicConv2d(192, (3, 3), name="conv2d_4a")(x, train)
        x = BasicConv2d(256, (3, 3), stride=2, name="conv2d_4b")(x, train)
        for i in range(5):
            x = Block35(name=f"repeat_1_{i}")(x, train)
        x = Mixed6a(name="mixed_6a")(x, train)
        for i in range(10):
            x = Block17(name=f"repeat_2_{i}")(x, train)
        x = Mixed7a(name="mixed_7a")(x, train)
        for i in range(5):
            x = Block8(name=f"repeat_3_{i}")(x, train)
        x = Block8(no_relu=True, name="block8")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(512, use_bias=False, name="last_linear")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3, name="last_bn"
        )(x)
        return x


class FaceRecognizer(nn.Module):
    """Backbone + projection MLP -> 256-d identity embedding
    (vgg_face.py:22-50)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        emb = InceptionResnetV1(name="resnet")(x, train)
        h = nn.Dense(512, name="proj_0")(emb)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(256, name="proj_1")(h)

    def inference(self, x):
        """relu + L2-normalize, eval mode (vgg_face.py:52-60)."""
        emb = nn.relu(self(x, train=False))
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb / jnp.maximum(norm, 1e-12)
