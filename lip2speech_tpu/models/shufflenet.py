"""ShuffleNetV2 feature trunk (flax.linen, NHWC).

TPU-native redesign of the vendored classifier backbone the reference uses
as its lip-reading trunk (``/root/reference/model/modules/shufflenetv2.py``).
Only the parts the pipeline exercises are built as the trunk: the
``features`` stages + ``conv_last`` + global pool — the reference's
``VideoExtractor`` skips ``conv1``/``maxpool`` and feeds the 3D front-end
output straight into the stages (video.py:63).

Depthwise convs use ``feature_group_count``. The channel shuffle is NOT
executed as a reshape/transpose: a lane-dim interleave lowers to per-vreg
VPU cross-lane shuffles and measured 33 ms of the 46 ms trunk forward at
B*T=1856 frames on v5e (tools/bench_stages.py protocol). Instead the
interleave runs as two one-hot matmuls on the MXU (``_interleave_gemm``),
which is numerically EXACT (each output sums exactly one product by 1.0)
and cuts the trunk to 30.5 ms. The byte-identical-to-reference permutation
is covered by tests/test_shufflenet.py and the end-to-end torch parity
test.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.models.layers import batch_norm

STAGE_REPEATS = (4, 8, 4)

# width multiplier -> per-stage output channels (shufflenetv2.py:116-123);
# final entry is conv_last. 1.0x ends at 1024-256=768 so video features plus
# the 256-d face embedding make the 1024-d encoder dim.
WIDTH_CHANNELS = {
    0.5: (24, 48, 96, 192, 768),
    1.0: (24, 116, 232, 464, 768),
    1.5: (24, 176, 352, 704, 768),
    2.0: (24, 244, 488, 976, 2048),
}


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """Reference-layout shuffle (reshape/transpose). Kept as the oracle
    for tests; the forward path uses ``_interleave_gemm`` instead."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


def _interleave_gemm(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """``channel_shuffle(concat([left, right]), 2)`` as two one-hot GEMMs.

    out[..., 2i] = left[..., i]; out[..., 2i+1] = right[..., i]. Exact in
    any float dtype: each output lane is one input times 1.0 plus exact
    zeros, accumulated in f32 and rounded back to the input's own value.
    On TPU this streams through the MXU instead of per-vreg cross-lane
    VPU shuffles (2.8 ms -> 0.4 ms per trunk unit at B*T=1856)."""
    half = left.shape[-1]
    out_c = 2 * half
    idx = np.arange(half)
    pe = np.zeros((half, out_c), np.float32)
    po = np.zeros((half, out_c), np.float32)
    pe[idx, 2 * idx] = 1.0
    po[idx, 2 * idx + 1] = 1.0
    # No f32 accumulator requested: each output lane is one product by 1.0
    # (MXU still sums in f32 internally), so emitting the input dtype
    # directly is exact AND avoids a full f32 intermediate + astype pass
    # over the (B*T*H*W, C) tensor.
    return jnp.matmul(left, jnp.asarray(pe, left.dtype)) + jnp.matmul(
        right, jnp.asarray(po, right.dtype)
    )


def _conv_bn_relu(x, features, kernel, stride, train, groups=1, relu=True, name=None):
    x = nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        feature_group_count=groups,
        use_bias=False,
        name=None if name is None else f"{name}_conv",
    )(x)
    x = batch_norm(train, name=None if name is None else f"{name}_bn")(x)
    if relu:
        x = nn.relu(x)
    return x


class InvertedResidual(nn.Module):
    """ShuffleNetV2 unit (shufflenetv2.py:42-104). ``downsample=True`` is
    the stride-2 'benchmodel 2' variant with the extra depthwise branch."""

    out_channels: int
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        half = self.out_channels // 2
        stride = 2 if self.downsample else 1

        if self.downsample:
            in_c = x.shape[-1]
            # branch1: dw conv -> pw (applied to the full input)
            left = _conv_bn_relu(x, in_c, 3, stride, train, groups=in_c, relu=False, name="b1_dw")
            left = _conv_bn_relu(left, half, 1, 1, train, name="b1_pw")
            b2_in = x
        else:
            # channel split: first half passes through, second half -> branch2
            left, b2_in = x[..., :half], x[..., half:]

        b2 = _conv_bn_relu(b2_in, half, 1, 1, train, name="b2_pw1")
        b2 = _conv_bn_relu(b2, half, 3, stride, train, groups=half, relu=False, name="b2_dw")
        b2 = _conv_bn_relu(b2, half, 1, 1, train, name="b2_pw2")

        return _interleave_gemm(left, b2)


class ShuffleNetV2Trunk(nn.Module):
    """Stages + conv_last + global average pool: (B, H, W, 24) -> (B, C_out)."""

    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        chans = WIDTH_CHANNELS[self.width_mult]
        for stage_idx, repeats in enumerate(STAGE_REPEATS):
            out_c = chans[stage_idx + 1]
            for i in range(repeats):
                x = InvertedResidual(
                    out_c,
                    downsample=(i == 0),
                    name=f"stage{stage_idx + 2}_{i}",
                )(x, train)
        x = _conv_bn_relu(x, chans[-1], 1, 1, train, name="conv_last")
        return jnp.mean(x, axis=(1, 2))  # global pool (AvgPool2d(3) at 3x3)
