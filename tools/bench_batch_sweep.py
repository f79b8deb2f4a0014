"""Sweep the full-inference batch size to find the bench operating point.

Runs bench.py's exact pipelined-steady-state protocol (video -> 300-step
AR decode -> NNLS + 32-iter GL waveform, bf16) at each batch size and
prints clips/s. History: 635 @ 64, 888 @ 128, 949 @ 256 (round 2);
1168 @ 256 after the round-3 MXU-interleave trunk + fused-DFT changes.

Run: python tools/bench_batch_sweep.py [--batches 128,256,384,512]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from lip2speech_tpu.utils.compile_cache import enable_compilation_cache

GL_ITERS = 32
MEL_FRAMES = 80
N_ITERS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,256,384,512")
    args = ap.parse_args()

    enable_compilation_cache()
    from lip2speech_tpu.config import Config
    from lip2speech_tpu.models import Lip2Speech
    from lip2speech_tpu.ops import griffin_lim as gl_ops
    from lip2speech_tpu.train.train_step import cast_floats

    cfg = Config()
    model = Lip2Speech(cfg.model)
    rngs = {"gumbel": jax.random.PRNGKey(1)}

    for b in [int(x) for x in args.batches.split(",")]:
        video = jax.random.normal(
            jax.random.PRNGKey(0),
            (b, cfg.data.max_video_frames, *cfg.data.mouth_size, 3),
        )
        faces = jax.random.normal(
            jax.random.PRNGKey(1), (b, cfg.data.n_face_crops, *cfg.data.face_size, 3)
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            video, faces, jnp.zeros((b, 80, 8)), 0.5, None,
            {**rngs, "teacher": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            train=False,
        )
        bf_vars = cast_floats(variables, jnp.bfloat16)
        bv, bfc = video.astype(jnp.bfloat16), faces.astype(jnp.bfloat16)

        def full_inference(vars_, video, faces, key):
            out = model.apply(vars_, video, faces, None, 1.0, None, rngs, train=False)
            mel = out["mel_postnet"].astype(jnp.float32)[..., :MEL_FRAMES]
            wav = gl_ops.mel_to_audio(
                mel, key, cfg.audio, n_iter=GL_ITERS, compute_dtype=jnp.bfloat16
            )
            return jnp.sum(wav), out["lengths"]

        key = jax.random.PRNGKey(0)
        compiled = jax.jit(full_inference).lower(bf_vars, bv, bfc, key).compile()
        s, _ = compiled(bf_vars, bv, bfc, key)
        float(s)  # warm + sync
        t0 = time.time()
        outs = [
            compiled(bf_vars, bv, bfc, jax.random.fold_in(key, 100 + i))[0]
            for i in range(N_ITERS)
        ]
        for s in outs:
            float(s)
        dt = (time.time() - t0) / N_ITERS
        print(f"B={b}: {b/dt:.1f} clips/s ({dt*1e3:.1f} ms/batch)")
        del compiled, variables, bf_vars, video, faces, bv, bfc


if __name__ == "__main__":
    main()
