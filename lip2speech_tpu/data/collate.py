"""Static-shape batch assembly.

The reference pads dynamically to the batch max on the host
(``/root/reference/datasets/__init__.py:7-46``). XLA wants static shapes,
so batches pad to the fixed ``DataConfig`` buckets; and where the reference
normalizes images and extracts mels per item on CPU workers
(lrw/dataset.py:136-141), we ship compact uint8/raw-audio buffers and run
normalization + mel extraction batched on the TPU (:func:`prepare_batch`,
one jitted program) — 4x less host->device traffic and no host DSP.

Collate output (numpy, host):
  mouth_u8  (B, Tv, 96, 96, 3) uint8   video_lengths (B,) int32
  audio     (B, S) float32             audio_lengths (B,) int32
  faces_u8  (B, n_crops, 160, 160, 3)  mel_lengths   (B,) int32
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import AudioConfig, DataConfig
from lip2speech_tpu.ops import image as image_ops
from lip2speech_tpu.ops import mel as mel_ops


def collate(samples: Sequence[dict], cfg: DataConfig) -> dict[str, np.ndarray]:
    b = len(samples)
    tv = cfg.max_video_frames
    s_max = cfg.max_audio_samples
    mouth = np.zeros((b, tv, *cfg.mouth_size, 3), np.uint8)
    faces = np.zeros((b, cfg.n_face_crops, *cfg.face_size, 3), np.uint8)
    audio = np.zeros((b, s_max), np.float32)
    v_len = np.zeros((b,), np.int32)
    a_len = np.zeros((b,), np.int32)

    # host-side estimate at the default hop; prepare_batch recomputes
    # mel_lengths from the configured audio_cfg.hop_length and is the
    # authoritative value the gate/mask are built from
    hop = 256
    for i, s in enumerate(samples):
        t = min(s["mouth"].shape[0], tv)
        mouth[i, :t] = s["mouth"][:t]
        v_len[i] = t
        n = min(s["audio"].shape[-1], s_max)
        audio[i, :n] = s["audio"][..., :n]
        a_len[i] = n
        faces[i] = s["faces"][: cfg.n_face_crops]

    mel_len = 1 + a_len // hop  # torch.stft center=True frame count
    return {
        "mouth_u8": mouth,
        "faces_u8": faces,
        "audio": audio,
        "video_lengths": v_len,
        "audio_lengths": a_len,
        "mel_lengths": mel_len.astype(np.int32),
    }


@functools.partial(jax.jit, static_argnames=("audio_cfg", "data_cfg"))
def prepare_batch(
    raw: dict[str, jnp.ndarray],
    audio_cfg: AudioConfig = AudioConfig(),
    data_cfg: DataConfig = DataConfig(),
) -> dict[str, jnp.ndarray]:
    """uint8/raw-audio buffers -> model-ready tensors, on device.

    Produces: video (B,T,96,96,3) ImageNet-normalized, faces (B,2,160,160,3)
    facenet-normalized, mel (B,80,M) log-mel padded with log(1e-5), gate
    (B,M) with 1s from the last valid frame on (datasets/__init__.py:36),
    mel_mask (B,M).
    """
    video = image_ops.normalize_mouth(raw["mouth_u8"])
    # zero out padded frames (collate pads with zeros in the reference too)
    tmask = (
        jnp.arange(video.shape[1])[None, :] < raw["video_lengths"][:, None]
    )
    video = video * tmask[:, :, None, None, None]

    faces = image_ops.normalize_face(raw["faces_u8"])

    mel = mel_ops.melspectrogram(raw["audio"], audio_cfg)  # (B, 80, Mfull)
    # derive valid frame counts from the SAME hop the spectrogram above
    # used — collate's host-side mel_lengths assumes the default hop and
    # would desynchronize the gate/mask if audio.hop_length is overridden
    mel_lengths = (1 + raw["audio_lengths"] // audio_cfg.hop_length).astype(
        jnp.int32
    )
    m = mel.shape[-1]
    steps = jnp.arange(m)[None, :]
    valid = steps < mel_lengths[:, None]
    mel = jnp.where(valid[:, None, :], mel, data_cfg.mel_pad_value)
    gate = (steps >= (mel_lengths - 1)[:, None]).astype(jnp.float32)

    return {
        "video": video,
        "faces": faces,
        "mel": mel,
        "gate": gate,
        "mel_mask": valid,
        "video_lengths": raw["video_lengths"],
        "mel_lengths": mel_lengths,
        "audio": raw["audio"],
        "audio_lengths": raw["audio_lengths"],
    }
