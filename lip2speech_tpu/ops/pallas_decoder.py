"""Pallas TPU kernel: the full autoregressive mel-decode loop.

The AR decoder (models/decoder.py) runs 300 sequential steps; as a
lax.scan each step's small matmuls leave the MXU idle between iterations.
This kernel runs the WHOLE loop in one ``pallas_call``: every weight
matrix sits in VMEM for all 300 steps (bf16, ~11 MB), the per-step state
(h, c, ys) lives in registers/VMEM scratch, and outputs stream to the
output buffers with dynamic-index stores. Matmuls accumulate f32 on the
MXU (``preferred_element_type``); attention over the short encoder axis
(T<=29) runs on the VPU as multiply-reduce.

Inference-path only (no dropout / teacher forcing) — the serving hot loop.
Numerics match the lax.scan decoder to bf16 tolerance (see
tests/test_pallas_decoder.py, interpret mode).

Measured on v5e (300 steps, tools/bench_serving_latency.py, round 2):

    batch   lax.scan   pallas   speedup
    1       33.2 ms    31.4 ms  1.06x
    4       32.3 ms    30.9 ms  1.05x
    64      36.0 ms    35.3 ms  1.02x

The loop is sequential-latency-bound at every batch size (B=1 costs the
same as B=64), and XLA's scan is already tight — the kernel's VMEM-resident
weights buy only ~5%. Verdict: NOT wired as the default serving backend
(documented in README); kept as a tested capability for when the decoder
grows past VMEM-streaming scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lip2speech_tpu.config import ModelConfig


def _dot(x, w):
    # run the MXU at the weights' dtype (bf16 on chip, f32 in the
    # interpret-mode tests) with f32 accumulation; casting x instead of w
    # avoids re-casting every VMEM-resident weight matrix on every step
    return jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)


def _make_kernel(cfg: ModelConfig, n_steps: int):
    def kernel(
        # per-batch tensors
        h_init_ref,      # (2, B, F)
        k_ref,           # (B, T, F)
        v_ref,           # (B, T, F)
        ck_ref,          # (B, S, L)
        cv_ref,          # (B, S, L)
        ec_ref,          # (B, F) encoder_cell
        bos_ref,         # (B, n_mels)
        pos_ref,         # (n_steps, 1, F) — leading dim untiled so the
                         # per-step dynamic row load needs no alignment proof
        # weights (packed dict order, see wrapper)
        pre0_k, pre0_b, pre0_w,
        pre1_k, pre1_b, pre1_w,
        q_k, q_b, q_w,
        attn_k, attn_b,
        cq_k, cq_b,
        l0_wx, l0_wh, l0_b,
        l1_wx, l1_wh, l1_b,
        out_k, out_b,
        stop_k, stop_b,
        temps_ref,       # (2,) [attention temp, content temp]
        # outputs
        mel_out,         # (n_steps, B, n_mels)
        stop_out,        # (n_steps, B, 1)
        attn_out,        # (n_steps, B, T)
    ):
        k_bank = k_ref[:].astype(jnp.float32)
        v_bank = v_ref[:].astype(jnp.float32)
        c_key = ck_ref[:].astype(jnp.float32)
        c_val = cv_ref[:].astype(jnp.float32)
        ec = ec_ref[:].astype(jnp.float32)
        t_attn = temps_ref[0]
        t_content = temps_ref[1]

        def step(i, carry):
            h0, h1, c0, c1, ys = carry

            # prenet
            pre = jnp.sin(_dot(ys, pre0_k[:]) + pre0_b[:]) * pre0_w[:]
            pre = jnp.sin(_dot(pre, pre1_k[:]) + pre1_b[:]) * pre1_w[:]

            # attention query
            h_cat = jnp.concatenate([h0, h1], axis=-1)
            q = jnp.sin(_dot(h_cat, q_k[:]) + q_b[:]) * q_w[:] + pos_ref[i]  # (1,F) bcast

            # dot-product attention over T (VPU multiply-reduce)
            scores = jnp.sum((q * t_attn)[:, None, :] * k_bank, axis=-1)
            a = jax.nn.softmax(scores, axis=-1)
            o = jnp.sum(a[:, :, None] * v_bank, axis=1)
            o = _dot(o, attn_k[:]) + attn_b[:]

            ys_mid = pre + o

            # content attention
            c_cat = jnp.concatenate([c0, c1], axis=-1)
            cq = _dot(c_cat, cq_k[:]) + cq_b[:]
            cq = cq * jax.nn.sigmoid(cq)  # silu
            ca = jax.nn.softmax(
                jnp.sum((cq * t_content)[:, None, :] * c_key, axis=-1), axis=-1
            )
            content_o = jnp.sum(ca[:, :, None] * c_val, axis=1)

            rnn_in = jnp.concatenate([content_o, ys_mid], axis=-1)

            # fused LSTM cells
            g0 = _dot(rnn_in, l0_wx[:]) + _dot(h0, l0_wh[:]) + l0_b[:]
            i0, f0, gg0, o0 = jnp.split(g0, 4, axis=-1)
            c0n = jax.nn.sigmoid(f0) * c0 + jax.nn.sigmoid(i0) * jnp.tanh(gg0)
            h0n = jax.nn.sigmoid(o0) * jnp.tanh(c0n)

            g1 = _dot(h0n, l1_wx[:]) + _dot(h1, l1_wh[:]) + l1_b[:]
            i1, f1, gg1, o1 = jnp.split(g1, 4, axis=-1)
            c1n = jax.nn.sigmoid(f1) * c1 + jax.nn.sigmoid(i1) * jnp.tanh(gg1)
            h1n = jax.nn.sigmoid(o1) * jnp.tanh(c1n)

            ys_new = _dot(h1n, out_k[:]) + out_b[:]
            stop = _dot(jnp.concatenate([h1n, ec], axis=-1), stop_k[:]) + stop_b[:]

            mel_out[i] = ys_new.astype(mel_out.dtype)
            stop_out[i] = stop.astype(stop_out.dtype)
            attn_out[i] = a.astype(attn_out.dtype)
            return h0n, h1n, c0n, c1n, ys_new

        h0 = h_init_ref[0].astype(jnp.float32)
        h1 = h_init_ref[1].astype(jnp.float32)
        zeros = jnp.zeros_like(h0)
        ys0 = bos_ref[:].astype(jnp.float32)
        jax.lax.fori_loop(0, n_steps, step, (h0, h1, zeros, zeros, ys0))

    return kernel


WEIGHT_ORDER = [
    ("prenet0", "kernel"), ("prenet0", "bias"), ("prenet0_w", None),
    ("prenet1", "kernel"), ("prenet1", "bias"), ("prenet1_w", None),
    ("Q", "kernel"), ("Q", "bias"), ("Q_w", None),
    ("attention_proj", "kernel"), ("attention_proj", "bias"),
    ("content_Q", "kernel"), ("content_Q", "bias"),
    ("lstm0", "wx"), ("lstm0", "wh"), ("lstm0", "b"),
    ("lstm1", "wx"), ("lstm1", "wh"), ("lstm1", "b"),
    ("fc_out", "kernel"), ("fc_out", "bias"),
    ("stop", "kernel"), ("stop", "bias"),
]


def pallas_ar_decode(
    cfg: ModelConfig,
    p: dict,
    enc: dict,
    bos: jnp.ndarray,        # (B, n_mels)
    n_steps: int | None = None,
    weight_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Run the AR loop as one pallas kernel.

    Returns (mels (M, B, n_mels), stops (M, B, 1), attn (M, B, T)) — the
    same stacked layout the lax.scan path produces.
    """
    from lip2speech_tpu.models.layers import positional_encoding

    M = n_steps or cfg.max_decoder_steps
    F = cfg.ffn_hidden_dim
    B, T, _ = enc["k"].shape
    S = enc["content_key"].shape[1]
    n_mels = cfg.n_mels

    # Mosaic needs >= one full sublane tile on the batch dim: B < 8 hits an
    # "invalid relayout" on the (B, T) attention vectors. Pad with zero rows
    # and slice the outputs back — latency is unchanged in this regime.
    # (Applied in interpret mode too so tests cover the pad+slice logic.)
    pad_b = 0
    if B < 8:
        pad_b = 8 - B

        def _pad(x, axis):
            widths = [(0, 0)] * x.ndim
            widths[axis] = (0, pad_b)
            return jnp.pad(x, widths)

        enc = dict(
            enc,
            hidden=_pad(enc["hidden"], 1),
            k=_pad(enc["k"], 0),
            v=_pad(enc["v"], 0),
            content_key=_pad(enc["content_key"], 0),
            content_value=_pad(enc["content_value"], 0),
            encoder_cell=_pad(enc["encoder_cell"], 0),
        )
        bos = _pad(bos, 0)
        B = B + pad_b

    pos = positional_encoding(max(cfg.max_decoder_steps, M), F)[:M].astype(
        weight_dtype
    )[:, None, :]  # (M, 1, F)

    weights = []
    for name, leaf in WEIGHT_ORDER:
        w = p[name] if leaf is None else p[name][leaf]
        weights.append(jnp.asarray(w, weight_dtype))
    temps = jnp.stack(
        [p["temperature"][0], p["content_temp"][0]]
    ).astype(jnp.float32)

    kernel = _make_kernel(cfg, M)
    out_shapes = (
        jax.ShapeDtypeStruct((M, B, n_mels), jnp.float32),
        jax.ShapeDtypeStruct((M, B, 1), jnp.float32),
        jax.ShapeDtypeStruct((M, B, T), jnp.float32),
    )
    n_inputs = 8 + len(weights) + 1
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_inputs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        enc["hidden"].astype(weight_dtype),
        enc["k"].astype(weight_dtype),
        enc["v"].astype(weight_dtype),
        enc["content_key"].astype(weight_dtype),
        enc["content_value"].astype(weight_dtype),
        enc["encoder_cell"].astype(weight_dtype),
        bos.astype(weight_dtype),
        pos,
        *weights,
        temps,
    )
    if pad_b:
        outs = tuple(o[:, : B - pad_b] for o in outs)
    return outs
