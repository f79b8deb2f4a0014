"""Griffin-Lim quality/speed sweep on real fixture speech (TPU).

Ground-truth round trip (wav -> log-mel -> NNLS + GL -> wav) scored with
ESTOI for {f32, bf16 MXU} x {16, 32, 64} GL iterations, plus B=64 batch
timing — decides the production n_iter / compute_dtype defaults.

Run: python tools/sweep_gl_quality.py
"""

from __future__ import annotations

import glob
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import AudioConfig
from lip2speech_tpu.ops import estoi as estoi_ops
from lip2speech_tpu.ops import griffin_lim as gl_ops
from lip2speech_tpu.ops import mel as mel_ops
from lip2speech_tpu.utils.compile_cache import enable_compilation_cache

FIXTURES = sorted(
    glob.glob("/root/reference/Datasets/SAMPLE_LRW/lipread_audio/ABOUT/test/*.npz")
)
N_TIME = 3


def main():
    enable_compilation_cache()
    cfg = AudioConfig()
    wavs = np.stack(
        [np.load(f)["data"][:19456].astype(np.float32) for f in FIXTURES]
    )
    log_mel = mel_ops.melspectrogram(jnp.asarray(wavs), cfg)

    for n_iter in (16, 32, 64):
        for dtype_name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
            wav_rt = gl_ops.mel_to_audio(
                log_mel, jax.random.PRNGKey(0), cfg, n_iter=n_iter,
                compute_dtype=dtype,
            )
            wav_rt = np.asarray(wav_rt)[:, : wavs.shape[1]]
            scores = [
                estoi_ops.estoi(w, r) for w, r in zip(wavs, wav_rt)
            ]

            # timing at the bench batch size
            big = jnp.tile(log_mel, (64 // len(FIXTURES) + 1, 1, 1))[:64]

            def run(key):
                return jnp.sum(
                    gl_ops.mel_to_audio(big, key, cfg, n_iter=n_iter,
                                        compute_dtype=dtype)
                )

            float(run(jax.random.PRNGKey(0)))  # compile
            ts = []
            for i in range(N_TIME):
                t0 = time.time()
                float(run(jax.random.fold_in(jax.random.PRNGKey(0), i)))
                ts.append(time.time() - t0)
            print(
                json.dumps(
                    {
                        "n_iter": n_iter,
                        "dtype": dtype_name,
                        "estoi_mean": round(float(np.mean(scores)), 4),
                        "estoi_min": round(float(np.min(scores)), 4),
                        "batch64_ms": round(float(np.median(ts)) * 1e3, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
