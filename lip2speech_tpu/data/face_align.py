"""Host-side face alignment math (numpy/cv2).

Same transform as the jittable ``ops.image.align_face_batched``; this is
the host variant used by streaming readers and offline preprocessing.
Reference: ``/root/reference/datasets/face_utils.py:12-103`` — eye-line
midpoints from 68-pt landmarks -> rotation about the crop center.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

EYE1 = slice(36, 42)
EYE2 = slice(42, 48)


def eye_angle_degrees(landmarks: np.ndarray) -> float:
    """Angle of the eye line, degrees, from integer bounding-rect midpoints
    (face_utils.py:23-39 semantics)."""
    lm = np.asarray(landmarks)

    def mid(roi):
        x, y = roi[:, 0], roi[:, 1]
        x0, y0 = int(x.min()), int(y.min())
        w, h = int(x.max()) - x0 + 1, int(y.max()) - y0 + 1
        return x0 + w // 2, y0 + h // 2

    lx, ly = mid(lm[EYE1])
    rx, ry = mid(lm[EYE2])
    dx, dy = rx - lx, ry - ly
    if dx == 0:
        return 0.0
    return float(np.degrees(np.arctan(dy / dx)))


def align_and_crop_face(
    frame: np.ndarray, face_coords, landmarks
) -> np.ndarray:
    """frame (H, W, 3) uint8, face_coords (x1, y1, x2, y2) -> rotated crop
    with the eye line horizontal."""
    x1, y1, x2, y2 = [max(int(v), 0) for v in face_coords]
    crop = frame[y1:y2, x1:x2]
    if crop.size == 0:
        return crop
    angle = eye_angle_degrees(landmarks)
    h, w = crop.shape[:2]
    m = cv2.getRotationMatrix2D((w // 2, h // 2), angle, 1.0)
    return cv2.warpAffine(crop, m, (w, h))
