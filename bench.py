"""End-of-round benchmark. Prints ONE JSON line.

Metric: full LRW inference throughput on one chip — silent video + face
crop -> 300-step AR mel decode -> NNLS mel inversion + 64-iter matmul-DFT
Griffin-Lim waveform — the reference demo/eval hot path end to end on
device, bf16 model compute.

Timing forces a data-dependent host read per call (block_until_ready does
not actually synchronize through the axon TPU tunnel).

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
``REFERENCE_CLIPS_PER_SEC`` is a documented estimate of the PyTorch
pipeline on a V100: the per-step Python AR loop (decoder.py:353, 300
sequential small-kernel iterations with ~10 kernel launches each) plus
InverseMelScale (256 SGD iterations) and GriffinLim(256) put it at about
1 clip/sec end to end; we use 1.0 until a measured number exists.
BASELINE.json north star: >= 5x reference on v5e-8 — vs_baseline here is
per chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CLIPS_PER_SEC = 1.0  # documented estimate, see module docstring
BATCH = 64
GL_ITERS = 64
N_ITERS = 5


def main():
    from lip2speech_tpu.config import Config
    from lip2speech_tpu.models import Lip2Speech
    from lip2speech_tpu.ops import griffin_lim as gl_ops
    from lip2speech_tpu.train.train_step import cast_floats

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
    variables = cast_floats(variables, jnp.bfloat16)
    video = video.astype(jnp.bfloat16)
    faces = faces.astype(jnp.bfloat16)

    @jax.jit
    def full_inference(vars_, video, faces, key):
        out = model.apply(vars_, video, faces, None, 1.0, None, rngs, train=False)
        mel = out["mel_postnet"].astype(jnp.float32)
        wav = gl_ops.mel_to_audio(mel, key, cfg.audio, n_iter=GL_ITERS)
        # data-dependent scalar forces real completion through the tunnel
        return jnp.sum(wav), out["lengths"]

    key = jax.random.PRNGKey(0)
    s, _ = full_inference(variables, video, faces, key)
    float(s)  # compile + sync

    ts = []
    for i in range(N_ITERS):
        t0 = time.time()
        s, _ = full_inference(variables, video, faces, jax.random.fold_in(key, i))
        float(s)
        ts.append(time.time() - t0)
    dt = float(np.median(ts))
    clips_per_sec = b / dt

    print(
        json.dumps(
            {
                "metric": "lrw_full_inference_clips_per_sec",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s/chip (video->waveform, 300-step AR + 64-iter GL, bf16)",
                "vs_baseline": round(clips_per_sec / REFERENCE_CLIPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
