"""Micro-bench of the 3D conv front-end (video.py frontend3D) variants on TPU.

The reference front-end (``/root/reference/model/modules/video.py:68-72``) is a
Conv3d 3->24, k=(5,7,7), s=(1,2,2) on (B,T,96,96,3).  With only 3 input
channels the MXU's 128-wide contraction is mostly padding.  Candidates:

  direct — lax 3D conv as production currently runs it
  s2d    — space-to-depth: fold the 2x2 spatial stride into channels
           (3 -> 12); conv becomes k=(5,4,4) s=(1,1,1) on a 48x48 grid
  s2d_t  — additionally fold the 5-tap time kernel into channels
           (12 -> 60); conv becomes k=(1,4,4), pure 2D, Cin=60

All variants are built from the same weights; numerics are asserted close
before timing.  Run on the real chip (single-process-exclusive tunnel).

Measured (v5e, B=64, bf16, device-true in-jit timing — see ``timed``):
direct 4.4 ms (34 true-TFLOP/s), s2d 4.7 ms, s2d_t 7.8 ms.
Round 2's 32-35 ms figures were tunnel-dispatch artifacts (15-30 ms RPC
per call, block_until_ready does not sync).  A Pallas im2col kernel
(space-to-depth + haloed time windows in VMEM, K=240 MXU dots) was built
and measured at 23-61 ms depending on structure — XLA's native conv
emitter wins on this small-channel conv outright, so the kernel was
dropped (negative result recorded here; the AR decoder Pallas kernel in
ops/pallas_decoder.py is the one that pays).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.utils.devtime import device_time

B, T, H, W, C = 64, 29, 96, 96, 3
OUT = 24
KT, KH, KW = 5, 7, 7
DTYPE = jnp.bfloat16


def timed(fn, *a, n=10):
    """Device-true seconds/call (see lip2speech_tpu.utils.devtime)."""
    return device_time(fn, *a, n=n)


def direct(video, w):
    return jax.lax.conv_general_dilated(
        video.astype(DTYPE),
        w.astype(DTYPE),
        window_strides=(1, 2, 2),
        padding=[(2, 2), (3, 3), (3, 3)],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )


def pack_space(video):
    """(B,T,H,W,C) -> (B,T,H/2,W/2,4C); channel = ((ph*2+pw)*C + c)."""
    b, t, h, w, c = video.shape
    x = video.reshape(b, t, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, t, h // 2, w // 2, 4 * c)


def pack_kernel_space(w):
    """(KT,7,7,C,OUT) -> (KT,4,4,4C,OUT) on the packed layout.

    Output site i of the stride-2 7-tap conv reads input 2i+d, d in [-3,3].
    On the packed grid, phase p tap offset o covers d = 2o+p, o in [-2,1].
    """
    kt = w.shape[0]
    c = w.shape[3]
    wp = np.zeros((kt, 4, 4, 4 * c, OUT), np.float32)
    for oh in range(-2, 2):
        for ow in range(-2, 2):
            for ph in range(2):
                for pw in range(2):
                    dh, dw = 2 * oh + ph, 2 * ow + pw
                    if -3 <= dh <= 3 and -3 <= dw <= 3:
                        ci = (ph * 2 + pw) * c
                        wp[:, oh + 2, ow + 2, ci : ci + c, :] = w[:, dh + 3, dw + 3]
    return jnp.asarray(wp)


def s2d(video, wp):
    x = pack_space(video).astype(DTYPE)
    return jax.lax.conv_general_dilated(
        x,
        wp.astype(DTYPE),
        window_strides=(1, 1, 1),
        padding=[(2, 2), (2, 1), (2, 1)],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )


def s2d_t(video, wp):
    # additionally fold time taps: x_t[..., kt*Cp] = x[t + kt - 2]
    x = pack_space(video).astype(DTYPE)
    xpad = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0), (0, 0)))
    taps = [xpad[:, dt : dt + T] for dt in range(KT)]
    xt = jnp.concatenate(taps, axis=-1)  # (B,T,48,48,60)
    b, t, hh, ww, cc = xt.shape
    xt = xt.reshape(b * t, hh, ww, cc)
    # kernel: (KT,4,4,12,OUT) -> (4,4,60,OUT) with channel = kt*12 + cp
    wt = jnp.transpose(wp, (1, 2, 0, 3, 4)).reshape(4, 4, KT * wp.shape[3], OUT)
    out = jax.lax.conv_general_dilated(
        xt,
        wt.astype(DTYPE),
        window_strides=(1, 1),
        padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(b, t, hh, ww, OUT)


def fold2d(video, w):
    """The round-4 PRODUCTION path (models/video.py): 5 time taps folded
    into channels (15), 7x7 s=2 2D conv on (B*T, 96, 96, 15)."""
    from lip2speech_tpu.models.video import fold_time_taps

    x = fold_time_taps(video.astype(DTYPE))  # (B*T, 96, 96, 15)
    k2 = jnp.concatenate([w[i] for i in range(KT)], axis=2)  # (7,7,15,OUT)
    out = jax.lax.conv_general_dilated(
        x,
        k2.astype(DTYPE),
        window_strides=(2, 2),
        padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(B, T, H // 2, W // 2, OUT)


def fold2d_pad16(video, w):
    """fold2d with input channels padded 15 -> 16 (VERDICT r4 item 6:
    does a pow-2 Cin help XLA's tiling?)."""
    from lip2speech_tpu.models.video import fold_time_taps

    x = fold_time_taps(video.astype(DTYPE))
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    k2 = jnp.concatenate([w[i] for i in range(KT)], axis=2)
    k2 = jnp.pad(k2, ((0, 0), (0, 0), (0, 1), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x,
        k2.astype(DTYPE),
        window_strides=(2, 2),
        padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(B, T, H // 2, W // 2, OUT)


def fold2d_s2d(video, w):
    """fold2d + spatial space-to-depth x2: the 7x7 s=2 conv over 15
    channels becomes a 4x4 s=1 conv over 60 channels on the 51x51 padded
    half-res grid — 4x the MXU contraction fill for +31% padded MACs.

    Derivation: y[p] = sum_i k[i] xp[2p+i] (xp = x padded by 3, i=0..6).
    With i = 2a+r (a=0..3, r=0..1): index = 2(p+a)+r -> s2d block p+a,
    slot r. Kernel tap a slot r carries k[2a+r]; slot (a=3, r=1) is zero.
    """
    from lip2speech_tpu.models.video import fold_time_taps

    x = fold_time_taps(video.astype(DTYPE))  # (B*T, 96, 96, 15)
    n, h, ww_, c = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))  # 102x102
    xs = xp.reshape(n, (h + 6) // 2, 2, (ww_ + 6) // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, (h + 6) // 2, (ww_ + 6) // 2, 4 * c
    )  # channel = ((r*2)+s)*C + c
    # kernel rearrangement traced in jnp (static indices — constant-folded
    # by XLA; numpy here would fail under jit on the traced w)
    k2 = jnp.concatenate([w[i] for i in range(KT)], axis=2)
    ks = jnp.zeros((4, 4, 4 * c, OUT), jnp.float32)
    for a in range(4):
        for b_ in range(4):
            for r in range(2):
                for s in range(2):
                    i, j = 2 * a + r, 2 * b_ + s
                    if i <= 6 and j <= 6:
                        ci = (r * 2 + s) * c
                        ks = ks.at[a, b_, ci : ci + c].set(k2[i, j])
    out = jax.lax.conv_general_dilated(
        xs,
        ks.astype(DTYPE),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(B, T, H // 2, W // 2, OUT)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    video = jax.random.normal(k1, (B, T, H, W, C), jnp.float32)
    w = np.asarray(jax.random.normal(k2, (KT, KH, KW, C, OUT), jnp.float32)) * 0.05
    wp = pack_kernel_space(w)

    fns = {
        "direct": (direct, jnp.asarray(w)),
        "s2d": (s2d, wp),
        "s2d_t": (s2d_t, wp),
        "fold2d": (fold2d, jnp.asarray(w)),
        "fold2d_pad16": (fold2d_pad16, jnp.asarray(w)),
        "fold2d_s2d": (fold2d_s2d, jnp.asarray(w)),
    }
    outs = {}
    flops = 2 * B * T * (H // 2) * (W // 2) * OUT * KT * KH * KW * C
    for name, (fn, wt) in fns.items():
        o = jax.jit(fn)(video, wt)
        outs[name] = np.asarray(o, np.float32)
        dt = timed(fn, video, wt)
        print(
            f"{name:8s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.2f} TFLOP/s (true-flop)"
        )
    for name in ("s2d", "s2d_t", "fold2d", "fold2d_pad16", "fold2d_s2d"):
        err = np.abs(outs["direct"] - outs[name]).max()
        scale = np.abs(outs["direct"]).max()
        print(f"max |direct - {name}| = {err:.4g} (scale {scale:.3g})")


if __name__ == "__main__":
    main()
