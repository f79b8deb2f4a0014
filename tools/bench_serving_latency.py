"""Serving-latency comparison: lax.scan AR decode vs the Pallas kernel
(VERDICT r1 item 8).

Measures the 300-step autoregressive decode (full-size ModelConfig) at
small serving batches (B=1, 4) and the throughput batch (B=64) on the real
chip. The Pallas kernel keeps every weight matrix VMEM-resident across all
300 steps, which is the hypothesized win in the latency-bound regime.

Run: python tools/bench_serving_latency.py
Prints one JSON line per (batch, backend) plus a summary.

NOTE: these are per-request latencies synced with a host read, so each
includes one ~30-36 ms tunnel round trip — the number a remote caller
actually experiences. The device-true AR decode time is ~9.3 ms at B=64
(tools/bench_stages.py, chained in-jit protocol); the scan-vs-Pallas
DELTA is still meaningful here because the RTT term is common to both.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import ModelConfig
from lip2speech_tpu.models import Decoder
from lip2speech_tpu.models.decoder import _build_step
from lip2speech_tpu.models.layers import positional_encoding
from lip2speech_tpu.ops.pallas_decoder import pallas_ar_decode

N_ITERS = 10
BATCHES = (1, 4, 64)


def scan_ar(cfg: ModelConfig, p, enc, bos):
    """The exact lax.scan AR loop from the same (p, enc, bos) the pallas
    kernel consumes (mirrors Decoder.__call__'s inference branch)."""
    M = cfg.max_decoder_steps
    B = bos.shape[0]
    dtype = enc["k"].dtype
    step = _build_step(cfg, p, enc, False, jnp.float32(1.0), jnp.int32(0))
    teacher = jnp.zeros((B, M, cfg.n_mels), dtype)
    pos_dec = positional_encoding(M, cfg.ffn_hidden_dim).astype(dtype)
    step_keys = jax.random.split(jax.random.PRNGKey(0), M)
    init = (
        enc["hidden"],
        jnp.zeros_like(enc["hidden"]),
        bos.astype(dtype),
        jnp.zeros((), jnp.int32),
    )
    xs = (jnp.swapaxes(teacher, 0, 1), pos_dec, jnp.zeros((M,)), step_keys)
    _, (outputs, stops, attn) = jax.lax.scan(step, init, xs)
    return outputs


def full_pipeline_b1():
    """Device-true B=1 video->waveform latency (VERDICT r3 item 7): the
    chip's real serving capability with the tunnel RTT cancelled by the
    devtime difference-quotient protocol, printed next to the
    RTT-inclusive per-request rows so both are on record."""
    import functools

    from lip2speech_tpu.config import Config
    from lip2speech_tpu.models import Lip2Speech
    from lip2speech_tpu.ops import griffin_lim as gl_ops
    from lip2speech_tpu.train.train_step import cast_floats
    from lip2speech_tpu.utils.devtime import device_time

    cfg = Config()
    model = Lip2Speech(cfg.model)
    bf = jnp.bfloat16
    video = jax.random.normal(
        jax.random.PRNGKey(0), (1, cfg.data.max_video_frames, *cfg.data.mouth_size, 3), bf
    )
    faces = jax.random.normal(
        jax.random.PRNGKey(1), (1, cfg.data.n_face_crops, *cfg.data.face_size, 3), bf
    )
    rngs = {"gumbel": jax.random.PRNGKey(1)}
    variables = cast_floats(
        jax.jit(functools.partial(model.init, train=False))(
            {"params": jax.random.PRNGKey(0)},
            video, faces, jnp.zeros((1, 80, 8)), 0.5, None,
            {**rngs, "teacher": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        ),
        bf,
    )
    key = jax.random.PRNGKey(0)

    def pipeline(video, faces, key):
        out = model.apply(variables, video, faces, None, 1.0, None, rngs, train=False)
        mel = out["mel_postnet"].astype(jnp.float32)[..., :80]
        return gl_ops.mel_to_audio(mel, key, cfg.audio, n_iter=32, compute_dtype=bf)

    ms = device_time(pipeline, video, faces, key, n=10) * 1e3
    print(json.dumps({"device_true_full_pipeline_b1_ms": round(ms, 2)}), flush=True)


def main():
    cfg = ModelConfig()
    model = Decoder(cfg)
    T = 29
    results = {}
    for b in BATCHES:
        enc_in = (
            jax.random.normal(
                jax.random.PRNGKey(0), (b, T, cfg.encoder_embedding_dim)
            )
            * 0.3
        )
        face = jax.random.normal(jax.random.PRNGKey(1), (b, 256)) * 0.3
        rngs = {"gumbel": jax.random.PRNGKey(2)}
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            enc_in, face, None, 1.0, rngs, train=False,
        )
        out = model.apply(
            variables, enc_in, face, None, 1.0, rngs, train=False,
            return_ar_inputs=True,
        )
        ar = out["ar_inputs"]
        # bf16 on both paths (the kernel casts internally; match the scan)
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            t,
        )
        p, bos = ar["p"], ar["bos"]
        enc = cast(ar["enc"])

        @jax.jit
        def scan_path(p, enc, bos):
            return jnp.sum(scan_ar(cfg, cast(p), enc, bos))

        @jax.jit
        def pallas_path(p, enc, bos):
            mels, stops, attn = pallas_ar_decode(cfg, p, enc, bos)
            return jnp.sum(mels)

        def timeit(fn, *args):
            float(fn(*args))  # compile + sync
            ts = []
            for _ in range(N_ITERS):
                t0 = time.time()
                float(fn(*args))
                ts.append(time.time() - t0)
            return float(np.median(ts))

        t_scan = timeit(scan_path, p, enc, bos)
        t_pallas = timeit(pallas_path, p, enc, bos)
        results[b] = {"scan_ms": t_scan * 1e3, "pallas_ms": t_pallas * 1e3}
        print(
            json.dumps(
                {
                    "batch": b,
                    "scan_ms": round(t_scan * 1e3, 2),
                    "pallas_ms": round(t_pallas * 1e3, 2),
                    "speedup": round(t_scan / t_pallas, 2),
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "summary": {
                    str(b): round(r["scan_ms"] / r["pallas_ms"], 2)
                    for b, r in results.items()
                }
            }
        )
    )
    full_pipeline_b1()


if __name__ == "__main__":
    main()
