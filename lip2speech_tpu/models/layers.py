"""Shared building blocks for the model zoo (flax.linen).

Conventions (TPU-first, channels-last):
  * sequences: ``(B, T, C)``; images: ``(B, H, W, C)``; video: ``(B, T, H, W, C)``.
  * LSTM parameters use torch gate order (i, f, g, o) packed in single
    ``(in, 4H)`` / ``(H, 4H)`` matrices so reference checkpoints convert by
    transposition (see train/checkpoint.py).

Reference counterparts cited per class (files under /root/reference/).
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def clip_grad_norm(x: jnp.ndarray, limit: float) -> jnp.ndarray:
    """Identity whose *backward* clips the cotangent to ``limit`` L2 norm.

    Long-horizon AR training stabilizer: applied to a ``lax.scan`` carry at
    each step boundary it bounds the per-step backward gain, so BPTT through
    hundreds of recurrent steps cannot compound into overflow (measured on
    hardware: the decoder scan's max|grad| went 5.6 -> 3e34 within ~6
    optimizer steps before NaN — tools/diagnose_nan.py). Forward semantics
    are exactly unchanged; gradients are only rescaled when their norm
    exceeds ``limit``, and a nonfinite norm passes through untouched (the
    optimizer-level apply_if_finite guard handles that case). Opt-in via
    ``ModelConfig.scan_grad_clip`` — default off preserves reference-parity
    gradients (the reference has no in-loop clipping, train.py:180-191).
    """
    del limit
    return x


def _cgn_fwd(x, limit):
    del limit
    return x, None


def _cgn_bwd(limit, _, g):
    norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
    scale = jnp.where(
        jnp.isfinite(norm) & (norm > limit), limit / norm, 1.0
    ).astype(g.dtype)
    return (g * scale,)


clip_grad_norm.defvjp(_cgn_fwd, _cgn_bwd)


def xavier_uniform_gain(gain: float):
    """torch ``xavier_uniform_`` with an explicit gain (LinearNorm/ConvNorm
    wrappers, decoder.py:73-104)."""

    def init(key, shape, dtype=jnp.float32):
        # shape is (in, out) for Dense kernels / (k, in, out) for Conv.
        fan_in = int(np.prod(shape[:-1]))
        fan_out = shape[-1]
        if len(shape) > 2:  # conv: receptive field multiplies both fans
            rf = int(np.prod(shape[:-2]))
            fan_in = shape[-2] * rf
            fan_out = shape[-1] * rf
        a = gain * float(np.sqrt(6.0 / (fan_in + fan_out)))
        return jax.random.uniform(key, shape, dtype, -a, a)

    return init


GAIN = {"linear": 1.0, "relu": float(np.sqrt(2.0)), "tanh": 5.0 / 3.0, "sigmoid": 1.0}


class LinearNorm(nn.Module):
    """Dense with xavier-uniform(gain) init (decoder.py:73-83)."""

    features: int
    use_bias: bool = True
    w_init_gain: str = "linear"

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform_gain(GAIN[self.w_init_gain]),
        )(x)


class ConvNorm(nn.Module):
    """1-D conv over (B, T, C) with xavier init (decoder.py:86-104)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    w_init_gain: str = "linear"
    padding: str | int | None = None

    @nn.compact
    def __call__(self, x):
        if self.padding is None:
            pad = self.dilation * (self.kernel_size - 1) // 2
        else:
            pad = self.padding
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)] if isinstance(pad, int) else pad,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform_gain(GAIN[self.w_init_gain]),
        )(x)


class PSine(nn.Module):
    """Learned-amplitude sine activation: ``sin(x) * w`` with per-channel w
    (decoder.py:43-70). Operates on the last axis."""

    dims: int
    w_init: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param("w", lambda k, s: jnp.full(s, self.w_init), (self.dims,))
        return jnp.sin(x) * w


class PReLU(nn.Module):
    """Per-channel PReLU (video.py:67)."""

    channels: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda k, s: jnp.full(s, self.init), (self.channels,))
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


@functools.lru_cache(maxsize=16)
def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """Sinusoid positional table, shape (n_position, d_hid)
    (decoder.py:19-40 — same interleaved sin/cos layout)."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


def positional_encoding(n_position: int, d_hid: int) -> jnp.ndarray:
    return jnp.asarray(sinusoid_table(n_position, d_hid))


def lstm_cell_step(params: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """One fused LSTM step. ``params`` = {wx: (in,4H), wh: (H,4H), b: (4H,)},
    torch gate order (i, f, g, o). One matmul for all four gates keeps the
    step MXU-bound."""
    gates = (
        jnp.dot(x, params["wx"], preferred_element_type=jnp.float32)
        + jnp.dot(h, params["wh"], preferred_element_type=jnp.float32)
        + params["b"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c32 = c.astype(jnp.float32)
    c_new = jax.nn.sigmoid(f) * c32 + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    # matmuls accumulate f32 on the MXU; the carry returns in the compute
    # dtype so bf16 scans stay bf16
    return h_new.astype(x.dtype), c_new.astype(x.dtype)


def _lstm_param(key, in_dim, hidden):
    k1, k2, k3 = jax.random.split(key, 3)
    s = 1.0 / np.sqrt(hidden)  # torch LSTM init: U(-1/sqrt(H), 1/sqrt(H))
    return {
        "wx": jax.random.uniform(k1, (in_dim, 4 * hidden), jnp.float32, -s, s),
        "wh": jax.random.uniform(k2, (hidden, 4 * hidden), jnp.float32, -s, s),
        "b": jax.random.uniform(k3, (4 * hidden,), jnp.float32, -s, s),
    }


class LSTM(nn.Module):
    """Multi-layer (optionally bidirectional) LSTM over (B, T, C) via
    ``lax.scan``. Replaces torch ``nn.LSTM`` (decoder.py:296,312;
    audio.py:114-117) with explicit functional state.

    Returns (outputs (B,T,D*H), (h (L*D,B,H), c (L*D,B,H))) in the torch
    layout so checkpoint conversion and site-embedding init line up.
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x, h0=None, c0=None):
        B, T, _ = x.shape
        D = 2 if self.bidirectional else 1
        H = self.hidden_size

        if h0 is None:
            h0 = jnp.zeros((self.num_layers * D, B, H), x.dtype)
        if c0 is None:
            c0 = jnp.zeros((self.num_layers * D, B, H), x.dtype)

        def run_direction(params, seq, h_init, c_init, reverse):
            def step(carry, xt):
                h, c = carry
                h, c = lstm_cell_step(params, xt, h, c)
                return (h, c), h

            (h_last, c_last), ys = jax.lax.scan(
                step,
                (h_init, c_init),
                jnp.swapaxes(seq, 0, 1),
                reverse=reverse,
            )
            return jnp.swapaxes(ys, 0, 1), h_last, c_last

        hs, cs = [], []
        out = x
        for layer in range(self.num_layers):
            in_dim = out.shape[-1]
            fwd = self.param(f"l{layer}_fwd", _lstm_param, in_dim, H)
            y_f, h_f, c_f = run_direction(
                fwd, out, h0[layer * D], c0[layer * D], reverse=False
            )
            if self.bidirectional:
                bwd = self.param(f"l{layer}_bwd", _lstm_param, in_dim, H)
                y_b, h_b, c_b = run_direction(
                    bwd, out, h0[layer * D + 1], c0[layer * D + 1], reverse=True
                )
                out = jnp.concatenate([y_f, y_b], axis=-1)
                hs += [h_f, h_b]
                cs += [c_f, c_b]
            else:
                out = y_f
                hs.append(h_f)
                cs.append(c_f)
        return out, (jnp.stack(hs), jnp.stack(cs))


class MLP(nn.Module):
    """Dense stack with SiLU between layers (Content.location_fc etc.)."""

    features: Sequence[int]
    activation: str = "silu"
    final_activation: bool = True

    @nn.compact
    def __call__(self, x):
        act = {"silu": nn.silu, "gelu": nn.gelu, "relu": nn.relu}[self.activation]
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1 or self.final_activation:
                x = act(x)
        return x


def batch_norm(train: bool, name: str | None = None, **kw) -> nn.BatchNorm:
    """torch-default BatchNorm (eps 1e-5, running momentum 0.1 torch ==
    0.9 linen)."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name, **kw
    )
