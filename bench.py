"""End-of-round benchmark. Prints ONE JSON line.

Metric: full LRW inference throughput on one chip — silent video + face
crop -> 300-step AR mel decode -> NNLS mel inversion + 64-iter Griffin-Lim
waveform — i.e. the reference demo/eval hot path end to end on device.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
``REFERENCE_CLIPS_PER_SEC`` is a documented estimate of the PyTorch
pipeline on a V100: the per-step Python AR loop (decoder.py:353, ~300
sequential small-kernel steps) plus InverseMelScale (256 SGD iterations)
and GriffinLim(256) put it at ~1 clip/sec; we use 1.0 until a measured
number exists. BASELINE.json north star: >= 5x reference on v5e-8 —
vs_baseline here is per chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_CLIPS_PER_SEC = 1.0  # documented estimate, see module docstring
BATCH = 32
N_ITERS = 5


def main():
    from lip2speech_tpu.config import Config
    from lip2speech_tpu.models import Lip2Speech
    from lip2speech_tpu.ops import griffin_lim as gl_ops

    cfg = Config()
    model = Lip2Speech(cfg.model)

    b = BATCH
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

    @jax.jit
    def full_inference(vars_, video, faces, key):
        out = model.apply(vars_, video, faces, None, 1.0, None, rngs, train=False)
        wav = gl_ops.mel_to_audio(out["mel_postnet"], key, cfg.audio, n_iter=64)
        return wav, out["lengths"]

    key = jax.random.PRNGKey(0)
    wav, _ = full_inference(variables, video, faces, key)  # compile
    jax.block_until_ready(wav)

    t0 = time.time()
    for i in range(N_ITERS):
        wav, lengths = full_inference(variables, video, faces, jax.random.fold_in(key, i))
    jax.block_until_ready(wav)
    dt = (time.time() - t0) / N_ITERS
    clips_per_sec = b / dt

    print(
        json.dumps(
            {
                "metric": "lrw_full_inference_clips_per_sec",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s/chip (video->waveform, 300-step AR + 64-iter GL)",
                "vs_baseline": round(clips_per_sec / REFERENCE_CLIPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
