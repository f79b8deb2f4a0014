"""Capture a jax.profiler trace of the full inference pipeline and print a
coarse stage breakdown (encoder+AR decode vs mel inversion+Griffin-Lim).

The trace (viewable in TensorBoard / Perfetto) lands in --trace_dir; the
printed JSON gives stage wall-times two ways: device-true (chained in-jit
loop, one host read) and per-call-synced (includes one ~30-36 ms tunnel
round trip per call — the number a single remote request would see).

Run: python tools/profile_inference.py [--batch 64] [--trace_dir /tmp/l2s_trace]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.utils.compile_cache import enable_compilation_cache
from lip2speech_tpu.utils.devtime import device_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--gl_iters", type=int, default=64)
    ap.add_argument("--trace_dir", default="/tmp/l2s_trace")
    args = ap.parse_args()

    enable_compilation_cache()
    from lip2speech_tpu.config import Config
    from lip2speech_tpu.models import Lip2Speech
    from lip2speech_tpu.ops import griffin_lim as gl_ops
    from lip2speech_tpu.train.train_step import cast_floats

    cfg = Config()
    model = Lip2Speech(cfg.model)
    b = args.batch
    video = jax.random.normal(
        jax.random.PRNGKey(0), (b, cfg.data.max_video_frames, *cfg.data.mouth_size, 3)
    )
    faces = jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.data.n_face_crops, *cfg.data.face_size, 3)
    )
    rngs = {"gumbel": jax.random.PRNGKey(1)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        video, faces, jnp.zeros((b, 80, 8)), 0.5, None,
        {**rngs, "teacher": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        train=False,
    )
    variables = cast_floats(variables, jnp.bfloat16)
    video, faces = video.astype(jnp.bfloat16), faces.astype(jnp.bfloat16)

    @jax.jit
    def model_fwd(vars_, video, faces):
        out = model.apply(vars_, video, faces, None, 1.0, None, rngs, train=False)
        # bench semantics: invert only the speech-bearing LRW mel prefix
        return out["mel_postnet"].astype(jnp.float32)[..., : cfg.data.max_mel_frames]

    @jax.jit
    def invert(mel, key):
        return jnp.sum(
            gl_ops.mel_to_audio(
                mel, key, cfg.audio, n_iter=args.gl_iters,
                compute_dtype=jnp.bfloat16,
            )
        )

    key = jax.random.PRNGKey(0)
    mel = model_fwd(variables, video, faces)
    float(jnp.sum(mel))
    float(invert(mel, key))

    def timed_rtt(fn, *a):
        """Per-call synced: includes one ~30-36 ms tunnel round trip."""
        ts = []
        for i in range(5):
            t0 = time.time()
            r = fn(*a)
            float(jnp.sum(r)) if hasattr(r, "shape") else float(r)
            ts.append(time.time() - t0)
        return float(np.median(ts))

    def timed_device(fn, *a, n=10):
        """Device-true seconds/call (lip2speech_tpu.utils.devtime)."""
        return device_time(fn, *a, n=n)

    t_fwd = timed_device(lambda v, f: model_fwd(variables, v, f), video, faces)
    t_inv = timed_device(invert, mel, key)
    t_fwd_rtt = timed_rtt(model_fwd, variables, video, faces)
    t_inv_rtt = timed_rtt(invert, mel, key)

    with jax.profiler.trace(args.trace_dir):
        mel = model_fwd(variables, video, faces)
        s = invert(mel, key)
        float(s)

    print(
        json.dumps(
            {
                "batch": b,
                "model_fwd_ms": round(t_fwd * 1e3, 1),
                "invert_ms": round(t_inv * 1e3, 1),
                "model_fwd_ms_with_rtt": round(t_fwd_rtt * 1e3, 1),
                "invert_ms_with_rtt": round(t_inv_rtt * 1e3, 1),
                # device_time returns 0.0 for noise-dominated measurements;
                # emit null rather than dividing by zero
                "model_clips_per_sec": round(b / t_fwd, 1) if t_fwd > 0 else None,
                "pipeline_clips_per_sec": (
                    round(b / (t_fwd + t_inv), 1) if t_fwd + t_inv > 0 else None
                ),
                "trace_dir": args.trace_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
