"""Locate the encoder's non-trunk cost and test the 2D-folded frontend.

Round-4 finding (fixed devtime protocol): the full VideoExtractor is
~30 ms at B=64 while its parts account for ~12 (frontend conv3d 8.5 +
trunk 3.75) — the remainder hides in the 5D NTHWC elementwise/pool ops
(BN, PReLU, MaxPool3d) and the fold reshape. This tool times cumulative
prefixes of the encoder so the gap is attributed, then measures the
candidate rewrite: fold the 5 temporal taps into channels (one pad + 5
static slices + concat) and run the WHOLE frontend as standard 2D ops on
the (B*T, H, W, C) layout — one 7x7 2D conv (15->24), 2D BN/PReLU/pool.
FLOPs are identical; the 5D tensors (and whatever layout XLA picks for
them) disappear. Numerics: the folded conv must match conv3d bit-for-bit
in f32 (same contraction order per output element up to conv lowering).

Run: python tools/bench_encoder_interior.py [--batch 64]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from lip2speech_tpu.utils.compile_cache import enable_compilation_cache
from lip2speech_tpu.utils.devtime import device_time


def fold_time_taps(video: jnp.ndarray, taps: int = 5) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B*T, H, W, taps*C): zero-pad T by taps//2 and
    concatenate the taps shifted windows on the channel axis, so a
    k=(taps,7,7) conv3d becomes a k=(7,7) conv2d over taps*C channels."""
    B, T, H, W, C = video.shape
    r = taps // 2
    xp = jnp.pad(video, ((0, 0), (r, r), (0, 0), (0, 0), (0, 0)))
    cols = [xp[:, dt : dt + T] for dt in range(taps)]
    folded = jnp.concatenate(cols, axis=-1)  # (B, T, H, W, taps*C)
    return folded.reshape(B * T, H, W, taps * C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=29)
    args = ap.parse_args()
    enable_compilation_cache()

    from lip2speech_tpu.config import Config
    from lip2speech_tpu.models.shufflenet import ShuffleNetV2Trunk
    from lip2speech_tpu.models.video import VideoExtractor
    from lip2speech_tpu.train.train_step import cast_floats

    cfg = Config()
    bf = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    B, T = args.batch, args.frames
    video = jax.random.normal(key, (B, T, *cfg.data.mouth_size, 3), bf)

    enc = VideoExtractor(cfg.model.frontend_channels, cfg.model.shufflenet_width)
    ev = cast_floats(
        jax.jit(lambda v: enc.init(jax.random.PRNGKey(0), v, train=False))(video), bf
    )
    p = ev["params"]
    w3d = p["frontend_conv"]["kernel"]  # (5, 7, 7, 3, 24)
    bn = ev["batch_stats"]["frontend_bn"]
    gamma, beta = p["frontend_bn"]["scale"], p["frontend_bn"]["bias"]
    prelu_a = p["frontend_prelu"]["alpha"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + 1e-5)
    scale = (gamma.astype(jnp.float32) * inv).astype(bf)
    shift = (
        beta.astype(jnp.float32) - bn["mean"].astype(jnp.float32) * gamma.astype(jnp.float32) * inv
    ).astype(bf)

    results = {}

    def rec(name, fn, *a):
        results[name] = round(device_time(fn, *a) * 1e3, 2)
        print(json.dumps({name: results[name]}), flush=True)

    def conv3d(v):
        return jax.lax.conv_general_dilated(
            v, w3d, (1, 2, 2), [(2, 2), (3, 3), (3, 3)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        )

    def bn_prelu(x):
        x = x * scale + shift
        return jnp.where(x >= 0, x, prelu_a * x)

    def pool3d(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
            [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)],
        )

    rec("conv3d", jax.jit(conv3d), video)
    rec("conv3d_bn_prelu", jax.jit(lambda v: bn_prelu(conv3d(v))), video)
    rec("conv3d_bn_prelu_pool", jax.jit(lambda v: pool3d(bn_prelu(conv3d(v)))), video)

    # trunk alone from the folded pooled input
    pooled = jax.jit(lambda v: pool3d(bn_prelu(conv3d(v))))(video)
    folded_in = pooled.reshape(-1, *pooled.shape[2:])
    trunk = ShuffleNetV2Trunk(cfg.model.shufflenet_width)
    tv = cast_floats(
        jax.jit(lambda x: trunk.init(jax.random.PRNGKey(1), x, train=False))(folded_in),
        bf,
    )
    rec("trunk", jax.jit(lambda x: trunk.apply(tv, x, train=False)), folded_in)

    rec("full_encoder", jax.jit(lambda v: enc.apply(ev, v, train=False)), video)

    # ---- candidate: 2D-folded frontend (identical math, no 5D tensors) ----
    w2d = jnp.concatenate([w3d[i] for i in range(w3d.shape[0])], axis=2)  # (7,7,15,24)

    def conv2d_folded(v):
        x = fold_time_taps(v)
        return jax.lax.conv_general_dilated(
            x, w2d, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def pool2d(x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )

    rec("conv2d_folded", jax.jit(conv2d_folded), video)
    rec(
        "frontend2d_full",
        jax.jit(lambda v: pool2d(bn_prelu(conv2d_folded(v)))),
        video,
    )

    # numerics: folded 2D conv vs conv3d in f32
    vf = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 32, 32, 3), jnp.float32)
    wf = jax.random.normal(jax.random.PRNGKey(4), (5, 7, 7, 3, 8), jnp.float32)
    a = jax.lax.conv_general_dilated(
        vf, wf, (1, 2, 2), [(2, 2), (3, 3), (3, 3)],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    ).reshape(-1, 16, 16, 8)
    w2f = jnp.concatenate([wf[i] for i in range(5)], axis=2)
    xb = fold_time_taps(vf)
    b2 = jax.lax.conv_general_dilated(
        xb, w2f, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    gap = float(jnp.max(jnp.abs(a - b2)))
    rel = gap / float(jnp.max(jnp.abs(a)))
    print(json.dumps({"fold_vs_conv3d_max_abs_gap_f32": gap, "rel": rel}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
