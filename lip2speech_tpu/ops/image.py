"""Batched, jittable image ops (VPU-friendly) + face-alignment math.

The reference does all image work on the host with OpenCV
(``/root/reference/datasets/face_utils.py:12-59`` eye-line rotation,
per-dataset cv2 resizes). Here the *math* is reimplemented as static-shape
JAX ops so the same transforms can run batched on-device (the
BASELINE.json north star asks for an on-device preprocessing stage);
``lip2speech_tpu.data`` keeps thin host-side equivalents for offline tools.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def resize_bilinear(img: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(..., H, W, C) -> (..., height, width, C)."""
    shape = (*img.shape[:-3], height, width, img.shape[-1])
    return jax.image.resize(img, shape, method="bilinear")


def normalize_mouth(img: jnp.ndarray) -> jnp.ndarray:
    """uint8-range mouth frames -> ImageNet-normalized floats
    (datasets/lrw/dataset.py:83-86)."""
    x = img.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def normalize_face(img: jnp.ndarray) -> jnp.ndarray:
    """facenet normalization (x - 127.5) / 128 (lrw/dataset.py:79)."""
    return (img.astype(jnp.float32) - 127.5) / 128.0


def hflip(img: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip over the width axis (..., H, W, C)."""
    return img[..., :, ::-1, :]


def batched_random_hflip(key: jax.Array, video: jnp.ndarray, p: float = 0.5):
    """Per-clip horizontal flip of (B, T, H, W, C) videos — the on-device
    equivalent of FaceAugmentation (datasets/augmentation.py:8-18), applied
    to the whole frame list of each clip."""
    flip = jax.random.bernoulli(key, p, (video.shape[0],))
    flipped = hflip(video)
    return jnp.where(flip[:, None, None, None, None], flipped, video)


def eye_alignment_angle(landmarks: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle (radians) that levels the eye line, from 68-pt
    landmarks (..., 68, 2). Reproduces the bounding-rect midpoint method of
    ``align_face`` (face_utils.py:23-39)."""
    def mid(roi):
        lo = jnp.min(roi, axis=-2)
        hi = jnp.max(roi, axis=-2)
        # cv2.boundingRect integer mid: x + w // 2 with w = hi - lo + 1
        # (boundingRect's width counts both endpoints); float version here
        return (
            (lo + (hi - lo + 1) // 2) if roi.dtype.kind == "i" else (lo + hi) / 2.0
        )

    left = mid(landmarks[..., 36:42, :])
    right = mid(landmarks[..., 42:48, :])
    d = right - left
    return jnp.arctan2(d[..., 1], d[..., 0])


def rotate_image(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate (H, W, C) by ``angle`` radians about the image center with
    bilinear sampling, zero-padded — cv2.getRotationMatrix2D +
    warpAffine equivalent (face_utils.py:51-57), but jittable/batchable
    (vmap over leading dims)."""
    h, w = img.shape[0], img.shape[1]
    cy, cx = (h // 2), (w // 2)
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # inverse mapping: dst (x,y) <- src rotated by -angle about center
    x0 = xx - cx
    y0 = yy - cy
    sx = cos * x0 - sin * y0 + cx
    sy = sin * x0 + cos * y0 + cy

    x1 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    x2 = jnp.clip(x1 + 1, 0, w - 1)
    y2 = jnp.clip(y1 + 1, 0, h - 1)
    fx = jnp.clip(sx - x1, 0.0, 1.0)[..., None]
    fy = jnp.clip(sy - y1, 0.0, 1.0)[..., None]

    f = img.astype(jnp.float32)
    v11 = f[y1, x1]
    v12 = f[y1, x2]
    v21 = f[y2, x1]
    v22 = f[y2, x2]
    out = (
        v11 * (1 - fx) * (1 - fy)
        + v12 * fx * (1 - fy)
        + v21 * (1 - fx) * fy
        + v22 * fx * fy
    )
    inside = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))[..., None]
    return jnp.where(inside, out, 0.0)


def align_face_batched(
    crops: jnp.ndarray, landmarks: jnp.ndarray
) -> jnp.ndarray:
    """Batched align: (B, H, W, C) face crops + (B, 68, 2) landmarks ->
    eye-line-leveled crops. On-device replacement for the per-frame
    ``align_and_crop_face`` host loop (face_utils.py:100-103)."""
    angles = eye_alignment_angle(landmarks.astype(jnp.float32))
    return jax.vmap(rotate_image)(crops, angles)
