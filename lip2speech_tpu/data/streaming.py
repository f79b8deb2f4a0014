"""Streaming windowed video readers: GRID and AVSpeech.

Rebuild of the stateful samplers in
``/root/reference/datasets/grid/dataset.py:74-243`` and
``datasets/avspeech/dataset.py:99-268``: walk the corpus for raw videos
with ``.wav`` + ``.json`` (face coords + 68-pt landmarks per absolute
frame index) sidecars; sample random 0.5..duration+0.2 s windows with
0.2 s overlap, cursor advancing through each clip; per frame
align-and-crop the face, take the lower half as the mouth ROI; any decode
failure substitutes another sample (reset_item semantics,
grid/dataset.py:136-138).

Host decode uses cv2.VideoCapture (ffmpeg-backed) instead of
torchvision.io; audio slicing reads the wav directly.
"""

from __future__ import annotations

import json
import os
import threading

import numpy as np

from lip2speech_tpu.data.rng import LockedRng

from lip2speech_tpu.config import DataConfig
from lip2speech_tpu.data.face_align import align_and_crop_face
from lip2speech_tpu.data.wild import load_wav

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

FPS = 25
SR = 16000
OVERLAP = 0.2


class StreamingWindowDataset:
    """Common GRID/AVSpeech machinery; subclasses define VIDEO_EXTS and
    directory layout."""

    VIDEO_EXTS: tuple = ()

    def __init__(
        self,
        root: str,
        mode: str = "train",
        cfg: DataConfig = DataConfig(),
        duration: float = 1.0,
        augmentation=None,
        rng: np.random.Generator | None = None,
        samples_per_epoch: int | None = None,
    ):
        self.cfg = cfg
        self.duration = duration
        self.augmentation = augmentation
        self.rng = LockedRng(rng)  # Loader threads share this generator

        self.items: list[tuple[str, str, str]] = []
        for dirpath, _, files in sorted(os.walk(self._walk_root(root, mode))):
            for fn in sorted(files):
                stem, ext = os.path.splitext(fn)
                if ext not in self.VIDEO_EXTS:
                    continue
                base = os.path.join(dirpath, stem)
                wav, info = base + ".wav", base + ".json"
                if os.path.isfile(wav) and os.path.isfile(info):
                    self.items.append((os.path.join(dirpath, fn), wav, info))
        self._n = samples_per_epoch or max(len(self.items), 1)
        # windowed cursor state (per-process; the reference keeps it
        # per-DataLoader-worker, grid/dataset.py:149-150)
        self._order = list(range(len(self.items)))
        self.rng.shuffle(self._order)
        self._cursor = 0
        self._clip = None
        self._time = 0.0
        self._end = 0.0
        self._depth = 0
        # the windowed cursor is stateful; the threaded Loader may call
        # __getitem__ concurrently (the reference relies on per-worker
        # process state instead, grid/dataset.py:149-150)
        self._lock = threading.RLock()  # re-entrant: reset_item recurses under the lock

    def _walk_root(self, root: str, mode: str) -> str:
        return root

    def __len__(self):
        return self._n

    # -- clip cursor ---------------------------------------------------
    def _next_clip(self):
        if not self.items:
            raise RuntimeError("empty streaming dataset")
        if self._cursor >= len(self._order):
            self.rng.shuffle(self._order)
            self._cursor = 0
        idx = self._order[self._cursor]
        self._cursor += 1
        video, wav, info = self.items[idx]
        cap = cv2.VideoCapture(video)
        n_frames = cap.get(cv2.CAP_PROP_FRAME_COUNT)
        fps = cap.get(cv2.CAP_PROP_FPS) or FPS
        cap.release()
        self._clip = (video, wav, info)
        self._time = 0.0
        self._end = round(float(n_frames / max(fps, 1e-6)), 1)

    def reset_item(self):
        self._clip = None
        self._depth += 1
        if self._depth > 16:
            raise RuntimeError("too many consecutive decode failures")
        try:
            return self[0]
        finally:
            self._depth -= 1

    def __getitem__(self, _) -> dict:
        with self._lock:
            if self._clip is None:
                self._next_clip()
            video, wav_path, info_path = self._clip

            start = max(self._time - OVERLAP, 0.0)
            if start > self._end:
                return self.reset_item()
            dur = float(
                self.rng.choice(np.arange(0.5, self.duration + OVERLAP, OVERLAP))
            )
            self._time += dur

        try:
            sr, audio_full = load_wav(wav_path)
            a0 = int(SR * start)
            audio = audio_full[a0 : a0 + int(SR * dur)]
        except Exception:
            return self.reset_item()
        if sr != SR or audio.shape[-1] == 0:
            return self.reset_item()

        frames = self._read_frames(video, start, dur)
        if frames is None or not len(frames):
            return self.reset_item()

        with open(info_path) as f:
            frame_info = json.load(f)

        first_abs = int(start * FPS)
        faces = []
        for i, frame in enumerate(frames):
            key = str(first_abs + i)
            if key not in frame_info:
                continue
            coords = np.asarray(frame_info[key]["face_coords"], np.int64)
            coords[coords < 0] = 0
            face = align_and_crop_face(frame, coords, frame_info[key]["landmarks"])
            if face.shape[0] < 16 or face.shape[1] < 16:
                return self.reset_item()
            faces.append(face)
        if not faces:
            return self.reset_item()

        if self.augmentation is not None:
            # flip every frame consistently (augmentation works on stacks)
            flip = self.rng.random() < getattr(self.augmentation, "p_flip", 0.5)
            if flip:
                faces = [f[:, ::-1] for f in faces]

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
            "audio": audio.astype(np.float32),
            "path": wav_path,
        }

    def _read_frames(self, video: str, start: float, dur: float):
        cap = cv2.VideoCapture(video)
        if not cap.isOpened():
            return None
        cap.set(cv2.CAP_PROP_POS_MSEC, start * 1000.0)
        frames = []
        want = int(dur * FPS) + 1
        while len(frames) < want:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame[:, :, ::-1])  # BGR -> RGB
        cap.release()
        return frames


class GRID(StreamingWindowDataset):
    """GRID: .mov/.mpg anywhere under root (grid/dataset.py:105-120)."""

    VIDEO_EXTS = (".mov", ".mpg", ".avi", ".mp4")

    def __init__(self, root, mode="train", **kw):
        super().__init__(root, mode, **kw)


class AVSpeech(StreamingWindowDataset):
    """AVSpeech: .mp4 under ``root/<mode>`` (avspeech/dataset.py:128-143)."""

    VIDEO_EXTS = (".mp4", ".avi")

    def _walk_root(self, root: str, mode: str) -> str:
        sub = os.path.join(root, mode)
        return sub if os.path.isdir(sub) else root
