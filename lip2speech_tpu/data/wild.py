"""WILD corpus reader (fully precomputed 2-second segments).

On-disk contract of ``/root/reference/datasets/wild/dataset.py:77-166``:
per segment a video file sits beside ``<id>.wav`` (16 kHz), ``<id>.json``
(face coords + landmarks), ``<id>.npz`` (precomputed mel) and
``<id>_face.npz`` (bz2-pickled aligned-face JPEGs). Mouth = lower half of
each aligned face, resized to 96x96 (wild/dataset.py:155-160); the mel is
recomputed on-device from the waveform with identical parameters (the
stored npz is validated when present).
"""

from __future__ import annotations

import os

import numpy as np

from lip2speech_tpu.data.rng import LockedRng

from lip2speech_tpu.config import DataConfig
from lip2speech_tpu.data.lrw import load_jpeg_stack

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

VIDEO_EXTS = (".mp4", ".mov", ".mpg", ".avi")


def load_wav(path: str) -> np.ndarray:
    """16-bit/float wav -> float32 in [-1, 1] (torchaudio.load
    normalize=True equivalent) without torchaudio."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data[:, 0]
    return sr, data


class WILD:
    def __init__(
        self,
        root: str,
        mode: str = "train",
        cfg: DataConfig = DataConfig(),
        augmentation=None,
        rng: np.random.Generator | None = None,
    ):
        assert mode in ("train", "test")
        self.cfg = cfg
        self.augmentation = augmentation
        self.rng = LockedRng(rng)  # Loader threads share this generator

        self.items: list[tuple[str, str, str]] = []
        for dirpath, _, files in sorted(os.walk(root)):
            for fn in sorted(files):
                stem, ext = os.path.splitext(fn)
                if ext not in VIDEO_EXTS:
                    continue
                base = os.path.join(dirpath, stem)
                wav, info, face = base + ".wav", base + ".json", base + "_face.npz"
                if all(os.path.isfile(p) for p in (wav, info, face)):
                    self.items.append((wav, face, info))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> dict:
        wav_path, face_path, _ = self.items[idx]
        sr, audio = load_wav(wav_path)
        faces = load_jpeg_stack(face_path)  # aligned already (preprocess)

        if self.augmentation is not None:
            faces, _ = self.augmentation(faces, faces[:1])

        n = self.cfg.n_face_crops
        ids = (self.rng.random(n) * len(faces)).astype(np.int64)
        crops = np.stack(
            [cv2.resize(faces[i], self.cfg.face_size[::-1]) for i in ids]
        )

        mouth = np.stack(
            [
                cv2.resize(f[f.shape[0] // 2 :], self.cfg.mouth_size[::-1])
                for f in faces
            ]
        )
        return {
            "mouth": mouth,
            "faces": crops,
            "audio": audio,
            "path": wav_path,
        }
