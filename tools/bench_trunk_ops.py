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
  bn_relu         the BN(inference)+ReLU elementwise pass alone (what
                  inference-time BN folding would remove if unfused)
  pw_gemm_pad     1x1 conv with channels zero-padded to the 128-lane
                  boundary (explicit-padding candidate)
  unit            the full InvertedResidual forward for context
  unit_x2         two chained units (cross-unit fusion headroom: if
                  2*unit >> unit_x2, XLA already fuses across units)

Plus whole-trunk context rows (trunk_ms, per-stage sequences).

Round-4 note: the round-3 run of this tool used the single-host-read
protocol whose ~3 ms fixed RTT made every op read flat (DESIGN.md
retraction); devtime.py now cancels that cost via the (t_2N-t_N)/N
difference quotient, so these numbers are marginal on-device costs.

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


def dw_shift_hwmc(x, k):
    """3x3 depthwise as 9 shifted MACs in (H, W, M, C) layout.

    The trunk's NHWC activations put W in the sublane dim — 12/6/3 pads
    to the bf16 16-sublane tile (25/62/81% waste by stage). With M in the
    sublanes instead, every vreg is dense (M=1856 is a multiple of 16,
    C=58 pads the lanes only) and the spatial shifts slice *leading*
    (untiled) dims, which moves whole tiles instead of re-laning.
    """
    h, w, m, c = x.shape
    xf = x.astype(jnp.float32)
    xp = jnp.pad(xf, ((1, 1), (1, 1), (0, 0), (0, 0)))
    acc = jnp.zeros((h, w, m, c), jnp.float32)
    for dh in range(3):
        for dw_ in range(3):
            acc = acc + xp[dh : dh + h, dw_ : dw_ + w] * k[dh, dw_].astype(
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

        # (H, W, M, C) layout: dense sublanes (M) instead of padded W
        x_hwmc = jnp.transpose(xh, (1, 2, 0, 3))
        t["dw_shift_hwmc"] = (
            device_time(functools.partial(dw_shift_hwmc, k=kdw), x_hwmc) * 1e3
        )
        # pointwise GEMM over the flattened tokens (layout-independent
        # contraction — what the pw conv should cost in any dense layout)
        x_flat = xh.reshape(-1, half)
        t["pw_gemm_flat"] = device_time(lambda a: jnp.matmul(a, w_hh), x_flat) * 1e3
        # bn+relu over the dense flat layout vs the padded NHWC one
        gam0 = jax.random.normal(key, (half,), bf)
        bet0 = jax.random.normal(key, (half,), bf)
        t["bn_relu_flat"] = (
            device_time(lambda a: jax.nn.relu(a * gam0 + bet0), x_flat) * 1e3
        )
        t["interleave_gemm"] = (
            device_time(lambda a: interleave_gemm(a, a + 1), xh) * 1e3
        )
        t["interleave_rshp"] = (
            device_time(lambda a: interleave_rshp(a, a + 1), xh) * 1e3
        )
        t["concat"] = (
            device_time(lambda a: jnp.concatenate([a, a + 1], axis=-1), xh) * 1e3
        )

        # BN(inference)+ReLU elementwise pass alone, at the half width
        gam = jax.random.normal(key, (half,), bf)
        bet = jax.random.normal(key, (half,), bf)
        t["bn_relu"] = (
            device_time(lambda a: jax.nn.relu(a * gam + bet), xh) * 1e3
        )

        # explicit zero-padding of the half channels to the 128-lane
        # boundary: is the small-C GEMM paying for implicit lane padding?
        pad = (-half) % 128
        w_pp = jnp.zeros((half + pad, half + pad), bf).at[:half, :half].set(w_hh)
        xp = jnp.pad(xh, ((0, 0), (0, 0), (0, 0), (0, pad)))
        t["pw_gemm_pad"] = device_time(lambda a: jnp.matmul(a, w_pp), xp) * 1e3

        results[name] = {k: round(v, 3) for k, v in t.items()}
        print(json.dumps({name: results[name]}), flush=True)

    # full-unit and chained-unit context at every stage shape
    from lip2speech_tpu.models.shufflenet import InvertedResidual

    for name, (hw, c) in STAGES.items():
        unit = InvertedResidual(c)
        x = jax.random.normal(key, (m, hw, hw, c), bf)
        uv = unit.init(jax.random.PRNGKey(1), x, train=False)
        uv = jax.tree.map(
            lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, uv
        )
        row = {
            "unit_ms": round(
                device_time(lambda a: unit.apply(uv, a, train=False), x) * 1e3, 3
            ),
            "unit_x2_ms": round(
                device_time(
                    lambda a: unit.apply(
                        uv, unit.apply(uv, a, train=False), train=False
                    ),
                    x,
                )
                * 1e3,
                3,
            ),
        }
        results[f"unit_{name}"] = row
        print(json.dumps({f"unit_{name}": row}), flush=True)

    # whole-trunk forward at the real entry shape (24x24@24)
    from lip2speech_tpu.models.shufflenet import ShuffleNetV2Trunk

    trunk = ShuffleNetV2Trunk()
    xt = jax.random.normal(key, (m, 24, 24, 24), bf)
    tv = trunk.init(jax.random.PRNGKey(2), xt, train=False)
    tv = jax.tree.map(lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, tv)
    results["trunk_ms"] = round(
        device_time(lambda a: trunk.apply(tv, a, train=False), xt) * 1e3, 3
    )
    print(json.dumps({"trunk_ms": results["trunk_ms"]}), flush=True)

    # numerics: the shifted-MAC depthwise must match the grouped lowering
    xs = jax.random.normal(key, (4, 12, 12, 116), jnp.float32)
    ks = jax.random.normal(key, (3, 3, 116), jnp.float32)
    gap = float(jnp.max(jnp.abs(dw_shift(xs, ks) - dw_group(xs, ks))))
    print(json.dumps({"dw_shift_vs_group_maxgap_f32": gap}), flush=True)


if __name__ == "__main__":
    main()
