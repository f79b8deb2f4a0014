"""Microbench the ShuffleNet trunk's sub-ops at real stage shapes.

The trunk (models/shufflenet.py) is the largest remaining inference stage
after the round-3 interleave-GEMM fix (~30 ms of the ~60 ms B=64 device
total). Its FLOPs are tiny (~0.2 TFLOP at B*T=1856, ~1 ms at peak), so
whatever dominates is overhead: small-K GEMMs padding to the 128-wide MXU,
the depthwise convs' lowering, BN/ReLU elementwise passes, or the channel
interleave. This tool times each candidate in isolation with the
device-true protocol (utils/devtime.py) so the next optimization targets
measurement, not belief — round 3's lesson (tools/bench_frontend_conv.py)
is that tunnel-confounded numbers invert the ranking.

Variants measured per stage (B*T=1856 frames at B=64):
  pw_gemm         1x1 conv half->half (the unit's pw1/pw2 as built)
  pw_gemm_fullK   1x1 conv C->half with zero rows — the extra cost of
                  folding a channel-subset gather into the kernel
                  (permutation-folding candidate: free iff K pads anyway)
  dw_group        3x3 depthwise via feature_group_count (as built)
  dw_shift        3x3 depthwise as 9 shifted multiply-accumulates (VPU
                  elementwise candidate)
  interleave_gemm current one-hot-GEMM channel shuffle
  interleave_rshp stack+reshape shuffle (the lowering the GEMM replaced)
  concat          plain concat of the two halves (floor: any shuffle
                  implementation must at least materialize the output)
  unit            the full InvertedResidual forward for context

Run: python tools/bench_trunk_ops.py [--batch 64]
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.utils.compile_cache import enable_compilation_cache
from lip2speech_tpu.utils.devtime import device_time

# (H_in, C) per non-downsample unit's input, width 1.0, 96x96 mouth ROI:
# trunk entry 24x24@24 -> stage2 12x12@116 -> stage3 6x6@232 -> stage4 3x3@464
STAGES = {"stage2": (12, 116), "stage3": (6, 232), "stage4": (3, 464)}


def dw_shift(x, k):
    """3x3 depthwise conv as 9 shifted multiply-accumulates.

    x: (B, H, W, C), k: (3, 3, C). Zero ('same') padding; accumulate in
    f32 like XLA's conv does for bf16 inputs.
    """
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for dh in range(3):
        for dw_ in range(3):
            acc = acc + xp[:, dh : dh + h, dw_ : dw_ + w, :] * k[dh, dw_].astype(
                jnp.float32
            )
    return acc.astype(x.dtype)


def dw_group(x, k):
    """3x3 depthwise via feature_group_count (the as-built lowering)."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        k.reshape(3, 3, 1, c),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def interleave_gemm(left, right):
    from lip2speech_tpu.models.shufflenet import _interleave_gemm

    return _interleave_gemm(left, right)


def interleave_rshp(left, right):
    b, h, w, c = left.shape
    return jnp.stack([left, right], axis=-1).reshape(b, h, w, 2 * c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=29)
    args = ap.parse_args()

    enable_compilation_cache()
    m = args.batch * args.frames
    bf = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    results = {}

    for name, (hw, c) in STAGES.items():
        half = c // 2
        x = jax.random.normal(key, (m, hw, hw, c), bf)
        xh = x[..., :half]
        kdw = jax.random.normal(key, (3, 3, half), bf)
        w_hh = jax.random.normal(key, (half, half), bf)
        w_ch = jnp.zeros((c, half), bf).at[:half].set(w_hh)

        t = {}
        t["pw_gemm"] = device_time(lambda a: jnp.matmul(a, w_hh), xh) * 1e3
        t["pw_gemm_fullK"] = device_time(lambda a: jnp.matmul(a, w_ch), x) * 1e3
        t["dw_group"] = device_time(functools.partial(dw_group, k=kdw), xh) * 1e3
        t["dw_shift"] = device_time(functools.partial(dw_shift, k=kdw), xh) * 1e3
        t["interleave_gemm"] = (
            device_time(lambda a: interleave_gemm(a, a + 1), xh) * 1e3
        )
        t["interleave_rshp"] = (
            device_time(lambda a: interleave_rshp(a, a + 1), xh) * 1e3
        )
        t["concat"] = (
            device_time(lambda a: jnp.concatenate([a, a + 1], axis=-1), xh) * 1e3
        )
        results[name] = {k: round(v, 3) for k, v in t.items()}
        print(json.dumps({name: results[name]}), flush=True)

    # full-unit context at stage2 shape
    from lip2speech_tpu.models.shufflenet import InvertedResidual

    hw, c = STAGES["stage2"]
    unit = InvertedResidual(c)
    x = jax.random.normal(key, (m, hw, hw, c), bf)
    uv = unit.init(jax.random.PRNGKey(1), x, train=False)
    uv = jax.tree.map(lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, uv)
    results["unit_stage2_ms"] = round(
        device_time(lambda a: unit.apply(uv, a, train=False), x) * 1e3, 3
    )
    print(json.dumps({"unit_stage2_ms": results["unit_stage2_ms"]}), flush=True)

    # numerics: the shifted-MAC depthwise must match the grouped lowering
    xs = jax.random.normal(key, (4, 12, 12, 116), jnp.float32)
    ks = jax.random.normal(key, (3, 3, 116), jnp.float32)
    gap = float(jnp.max(jnp.abs(dw_shift(xs, ks) - dw_group(xs, ks))))
    print(json.dumps({"dw_shift_vs_group_maxgap_f32": gap}), flush=True)


if __name__ == "__main__":
    main()
