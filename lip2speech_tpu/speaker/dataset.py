"""AVSpeechFace dataset: (2-second speech window, one aligned face crop).

On-disk contract of ``/root/reference/speaker_encoder/dataset.py:47-195``:
under ``root/<mode>/`` each clip has ``<id>.mp4|.mov|.mpg`` (only used as
the stem), ``<id>.wav`` (16 kHz), ``<id>.json`` (per-absolute-frame face
coords + landmarks) and ``<id>/frames/<n>.jpg`` frame dumps produced by
the speaker preprocess tool. Sampling mirrors the reference: random 2 s
speech window on a 0.25 s grid, one random frame inside the window,
align-and-crop to a 160x160 facenet-normalized face; invalid frames and
broken audio are memoized and substituted (dataset.py:99-151).
"""

from __future__ import annotations

import collections
import glob
import json
import os

import numpy as np

from lip2speech_tpu.config import DataConfig
from lip2speech_tpu.data.face_align import align_and_crop_face
from lip2speech_tpu.data.wild import load_wav

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

FPS = 25
SR = 16000


class AVSpeechFace:
    def __init__(
        self,
        root: str,
        mode: str = "train",
        cfg: DataConfig = DataConfig(),
        duration: float = 2.0,
        rng: np.random.Generator | None = None,
    ):
        assert mode in ("train", "test")
        self.root = os.path.join(root, mode)
        self.cfg = cfg
        self.duration = duration
        self.rng = rng or np.random.default_rng(0)

        self.items: list[tuple[str, str, str]] = []
        for fmt in ("mp4", "mov", "mpg"):
            for video in sorted(glob.glob(f"{self.root}/*.{fmt}")):
                stem = video[:-4]
                wav, js = stem + ".wav", stem + ".json"
                if os.path.isfile(wav) and os.path.isfile(js):
                    self.items.append((stem, wav, js))

        self.invalid_frame: dict[str, set] = collections.defaultdict(set)
        self.invalid_audio: set = set()
        self._depth = 0

    def __len__(self):
        return len(self.items)

    def reset_item(self):
        self._depth += 1
        if self._depth > 32:
            raise RuntimeError("too many invalid samples")
        try:
            return self[int(self.rng.integers(len(self)))]
        finally:
            self._depth -= 1

    def __getitem__(self, idx: int) -> dict:
        stem, wav_path, json_path = self.items[idx]
        if wav_path in self.invalid_audio:
            return self.reset_item()

        frames_dir = os.path.join(stem, "frames")
        frame_files = glob.glob(f"{frames_dir}/*.jpg")
        if not frame_files:
            return self.reset_item()
        end_time = len(frame_files) / FPS

        start = float(self.rng.choice(np.arange(0, max(end_time, 0.25), 0.25)))
        if start + self.duration > end_time:
            start = max(0.0, start - self.duration)
        dur = min(end_time, start + self.duration) - start

        frame_time = start + float(self.rng.uniform(0, 0.25))
        frame_idx = str(int(frame_time * FPS))
        if frame_idx in self.invalid_frame[json_path]:
            return self.reset_item()

        with open(json_path) as f:
            info = json.load(f)
        if frame_idx not in info:
            self.invalid_frame[json_path].add(frame_idx)
            return self.reset_item()

        frame_path = os.path.join(frames_dir, f"{frame_idx}.jpg")
        frame = cv2.imread(frame_path)
        if frame is None:
            self.invalid_frame[json_path].add(frame_idx)
            return self.reset_item()
        frame = frame[:, :, ::-1]

        coords = np.asarray(info[frame_idx]["face_coords"], np.int64)
        coords[coords < 0] = 0
        face = align_and_crop_face(frame, coords, info[frame_idx]["landmarks"])
        if face.shape[0] < 16 or face.shape[1] < 16:
            return self.reset_item()
        face = cv2.resize(face, self.cfg.face_size[::-1])

        try:
            sr, audio = load_wav(wav_path)
        except Exception:
            self.invalid_audio.add(wav_path)
            return self.reset_item()
        a0 = int(SR * start)
        speech = audio[a0 : a0 + int(SR * dur)].astype(np.float32)
        if speech.shape[-1] < SR // 2:
            return self.reset_item()

        return {"speech": speech, "face": face}


def collate_speaker(samples, n_samples: int = 32000) -> dict[str, np.ndarray]:
    """Min-trim collate (dataset.py:26-40), then pad to the static 2 s
    bucket so XLA sees one shape."""
    min_s = min(s["speech"].shape[-1] for s in samples)
    min_s = min(min_s, n_samples)
    speech = np.stack([s["speech"][:min_s] for s in samples])
    if min_s < n_samples:
        speech = np.pad(speech, ((0, 0), (0, n_samples - min_s)))
    faces = np.stack([s["face"] for s in samples])
    return {"speech": speech.astype(np.float32), "faces_u8": faces}
