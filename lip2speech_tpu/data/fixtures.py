"""Synthetic SAMPLE_LRW-format fixture generator.

Writes clips in the exact on-disk format the LRW reader consumes
(bz2-pickled JPEG stacks + raw-audio npz — see data/lrw.py), so tests and
demos run without the real corpus. Audio is a multi-tone chirp rather than
noise so mel/ESTOI paths have structure to latch onto.
"""

from __future__ import annotations

import bz2
import os
import pickle

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _encode_stack(frames: np.ndarray) -> bytes:
    enc = [cv2.imencode(".jpg", f[:, :, ::-1])[1] for f in frames]
    return bz2.compress(pickle.dumps(enc))


def make_sample_lrw(
    root: str,
    word: str = "ABOUT",
    split: str = "test",
    n_clips: int = 4,
    n_frames: int = 29,
    n_samples: int = 19456,
    seed: int = 0,
) -> str:
    rng = np.random.default_rng(seed)
    faces_dir = os.path.join(root, "LRW_Faces", word, split)
    audio_dir = os.path.join(root, "lipread_audio", word, split)
    os.makedirs(faces_dir, exist_ok=True)
    os.makedirs(audio_dir, exist_ok=True)

    sr = 16000
    t = np.arange(n_samples) / sr
    for i in range(1, n_clips + 1):
        name = f"{word}_{i:05d}"
        mouth = rng.integers(0, 255, (n_frames, 96, 96, 3), dtype=np.uint8)
        face = rng.integers(0, 255, (n_frames, 146, 120, 3), dtype=np.uint8)
        f0 = 200 + 50 * i
        wav = (
            0.4 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 2 * f0 * t * (1 + 0.1 * t))
        ).astype(np.float32)

        with open(os.path.join(faces_dir, f"{name}_mouth.npz"), "wb") as f:
            f.write(_encode_stack(mouth))
        with open(os.path.join(faces_dir, f"{name}_face.npz"), "wb") as f:
            f.write(_encode_stack(face))
        np.savez(os.path.join(audio_dir, f"{name}.npz"), data=wav)
    return root
