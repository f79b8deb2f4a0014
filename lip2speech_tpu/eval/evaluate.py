"""Evaluation: batched forward -> Griffin-Lim inversion -> ESTOI mean.

Rebuild of ``/root/reference/evaluate.py:22-51``. Semantics preserved:
the forward runs with the GT mels supplied and ``tf_ratio=1`` (which, per
the reference's teacher-forcing rule, means the decoder free-runs on its
own predictions while matching the GT mel length), the *postnet* output is
inverted, and ESTOI is computed per clip against the GT waveform.

The heavy path (mel inversion + Griffin-Lim) runs on-device as one jitted
program per batch; ESTOI uses the exact numpy implementation on host (153
clips in the reference benchmark — negligible), with the batched JAX
variant available for large-scale eval.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import Config
from lip2speech_tpu.data import Loader, prepare_batch
from lip2speech_tpu.ops import estoi as estoi_ops
from lip2speech_tpu.ops import griffin_lim as gl_ops


def evaluate_net(
    model,
    variables: dict[str, Any],
    dataset,
    cfg: Config,
    batch_size: int = 32,
    n_gl_iters: int = 32,  # saturates round-trip ESTOI (sweep_gl_quality)
    max_batches: int | None = None,
    seed: int = 0,
    device_estoi: bool = False,
) -> float:
    """Mean ESTOI over the dataset (evaluate.py:22-51)."""
    loader = Loader(
        dataset, batch_size, cfg.data, shuffle=False, drop_last=False,
        num_workers=8,
    )
    rngs = {
        "gumbel": jax.random.PRNGKey(seed),
        "teacher": jax.random.PRNGKey(seed + 1),
        "dropout": jax.random.PRNGKey(seed + 2),
    }

    bf16 = cfg.train.bf16

    @jax.jit
    def forward_invert(vars_, batch, key):
        if bf16:
            from lip2speech_tpu.train.train_step import cast_floats

            vars_ = cast_floats(vars_, jnp.bfloat16)
            batch = cast_floats(batch, jnp.bfloat16)
        out = model.apply(
            vars_,
            batch["video"],
            batch["faces"],
            batch["mel"],
            1.0,
            None,
            rngs,
            train=False,
        )
        mel_pred = out["mel_postnet"].astype(jnp.float32)  # (B, 80, M)
        wav = gl_ops.mel_to_audio(mel_pred, key, cfg.audio, n_iter=n_gl_iters)
        return wav

    scores = []
    key = jax.random.PRNGKey(seed)
    for bi, raw in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        # static-shape batches only: pad the ragged tail by repeating row 0
        n_valid = raw["mouth_u8"].shape[0]
        if n_valid < batch_size:
            reps = batch_size - n_valid
            raw = {
                k: np.concatenate([v, np.repeat(v[:1], reps, 0)]) for k, v in raw.items()
            }
        batch = prepare_batch(
            {k: jnp.asarray(v) for k, v in raw.items()}, cfg.audio, cfg.data
        )
        key, sub = jax.random.split(key)
        wav_pred = forward_invert(variables, batch, sub)
        gt = np.asarray(raw["audio"])
        if device_estoi:
            # batched on-device ESTOI — same algorithm with static-shape
            # silent-frame excision; measured ≤ 2.7e-4 off the host metric
            # on fixture speech (tests/test_estoi_oracle.py)
            batch_scores = np.asarray(
                estoi_ops.estoi_batch_jax(
                    jnp.asarray(gt), wav_pred, lengths=raw["audio_lengths"],
                    fs=cfg.audio.sample_rate,
                )
            )
            scores.extend(batch_scores[:n_valid].tolist())
        else:
            wav_pred = np.asarray(wav_pred)
            for i in range(n_valid):
                n = int(raw["audio_lengths"][i])
                scores.append(
                    estoi_ops.estoi(gt[i, :n], wav_pred[i, :n], cfg.audio.sample_rate)
                )
    return float(np.mean(scores)) if scores else 0.0
