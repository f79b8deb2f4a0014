"""Face detection + 68-pt landmark pipeline, native JAX end to end.

Rebuild of the reference ``FaceDetector``
(``/root/reference/datasets/wild/fast_detector/__init__.py:34-224``), which
drives an ONNX Runtime SSD (RFB-320) and an OpenVINO landmark regressor
per frame. Here both compiled graphs execute natively in JAX (see
onnx_jax.py / openvino_jax.py) with the original weight files, detection
runs *batched* over all frames in one jitted call (the reference loops
per frame, fast_detector/__init__.py:73-75), and NMS is available both as
numpy (host) and as a static-shape jittable op.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

REFERENCE_MODEL_DIR = "/root/reference/datasets/wild/fast_detector/models"
MODEL_DIR_ENV = "LIP2SPEECH_DETECTOR_DIR"
IOU_THRESHOLD = 0.3


def iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Pairwise IoU for (N,4)/(M,4) corner-form boxes."""
    lt = np.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = np.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(boxes_a[:, 2:] - boxes_a[:, :2], 0, None), -1)
    area_b = np.prod(np.clip(boxes_b[:, 2:] - boxes_b[:, :2], 0, None), -1)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def hard_nms(box_probs: np.ndarray, iou_threshold: float = IOU_THRESHOLD,
             top_k: int = -1, candidate_size: int = 200) -> np.ndarray:
    """Greedy NMS on (N,5) [x1,y1,x2,y2,score] — host-side, mirrors the
    runtime subset of the vendored box utils the reference actually calls
    (fast_detector/__init__.py:24-27)."""
    order = np.argsort(box_probs[:, 4])[-candidate_size:]
    picked = []
    while order.size:
        idx = order[-1]
        picked.append(idx)
        if 0 < top_k == len(picked) or order.size == 1:
            break
        order = order[:-1]
        ious = iou_matrix(box_probs[order, :4], box_probs[idx : idx + 1, :4])[:, 0]
        order = order[ious <= iou_threshold]
    return box_probs[picked]


def nms_jax(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
            score_threshold: float, max_out: int = 32):
    """Static-shape greedy NMS: returns (boxes (max_out,4), scores
    (max_out,), valid mask). Suitable for on-device batched preprocessing."""
    n = boxes.shape[0]
    scores = jnp.where(scores >= score_threshold, scores, -1.0)

    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area = jnp.prod(jnp.clip(boxes[:, 2:] - boxes[:, :2], 0), -1)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

    def body(carry, _):
        live_scores, = carry
        idx = jnp.argmax(live_scores)
        score = live_scores[idx]
        keep = score > 0
        suppress = iou[idx] > iou_threshold
        live_scores = jnp.where(suppress, -1.0, live_scores)
        live_scores = live_scores.at[idx].set(-1.0)
        return (live_scores,), (idx, jnp.where(keep, score, -1.0))

    (_,), (ids, kept) = jax.lax.scan(body, (scores,), None, length=max_out)
    valid = kept > 0
    return boxes[ids], kept, valid


class FaceDetector:
    """frames (N, H, W, 3) RGB uint8 -> per frame (box, 68x2 landmarks).

    Matches the reference contract (fast_detector/__init__.py:63-120):
    center-face selection by default; optional target-face filtering via a
    caller-provided embedding function."""

    def __init__(
        self,
        model_dir: str | None = None,
        threshold: float = 0.9,
        target_face_embedding: np.ndarray | None = None,
        face_embed_fn=None,
    ):
        """Weight resolution order: explicit ``model_dir`` arg >
        $LIP2SPEECH_DETECTOR_DIR > repo-local .npz artifacts
        (detect/weights/, produced by tools/convert_detector_weights.py) >
        the reference checkout (fallback only)."""
        import jax

        from lip2speech_tpu.detect import artifacts
        from lip2speech_tpu.detect.onnx_jax import make_runner, run_graph
        from lip2speech_tpu.detect.openvino_jax import make_ir_runner, run_ir

        model_dir = model_dir or os.environ.get(MODEL_DIR_ENV)
        if model_dir is None and os.path.exists(artifacts.RFB320_NPZ):
            graph = artifacts.load_onnx_npz(artifacts.RFB320_NPZ)
            self.detect_fn = jax.jit(
                lambda x: run_graph(graph, {graph.inputs[0]: x})
            )
            layers, consts = artifacts.load_ir_npz(artifacts.MOBILEFACENET_NPZ)
            in_name = next(
                l.name for l in layers.values() if l.type == "Parameter"
            )
            self.landmark_fn = jax.jit(
                lambda x: run_ir(layers, consts, {in_name: x})
            )
        else:
            model_dir = model_dir or REFERENCE_MODEL_DIR
            self.detect_fn, _ = make_runner(
                os.path.join(model_dir, "version-RFB-320.onnx")
            )
            self.landmark_fn, _ = make_ir_runner(
                os.path.join(model_dir, "mobilefacenet.xml"),
                os.path.join(model_dir, "mobilefacenet.bin"),
            )
        self.threshold = threshold
        self.target_face_embedding = target_face_embedding
        self.face_embed_fn = face_embed_fn

    def __call__(self, frames: np.ndarray):
        n, H, W, _ = frames.shape
        x = (frames.astype(np.float32) - 127.0) / 128.0
        x = np.stack([cv2.resize(f, (320, 240), interpolation=cv2.INTER_CUBIC) for f in x])
        out = self.detect_fn(jnp.asarray(x.transpose(0, 3, 1, 2)))
        confidences = np.asarray(out["scores"])  # (N, P, 2)
        boxes_all = np.asarray(out["boxes"])  # (N, P, 4) normalized

        results = []
        for i in range(n):
            probs = confidences[i, :, 1]
            mask = probs > self.threshold
            if not mask.any():
                results.append(None)
                continue
            bp = np.concatenate(
                [boxes_all[i, mask], probs[mask, None]], axis=1
            )
            picked = hard_nms(bp, IOU_THRESHOLD)
            boxes = (picked[:, :4] * [W, H, W, H]).astype(np.int32)

            box = self._select_box(frames[i], boxes, W, H)
            if box is None:
                results.append(None)
                continue
            lm = self._landmarks(frames[i], box)
            box = np.clip(np.asarray(box, np.int64), 0, None)
            results.append([box, lm.astype(np.int64)])
        return results

    def _select_box(self, frame, boxes, W, H):
        if self.target_face_embedding is not None and self.face_embed_fn is not None:
            embs = []
            for b in boxes:
                x1, y1, x2, y2 = b
                crop = frame[max(y1, 0) : y2, max(x1, 0) : x2]
                if crop.size == 0:
                    embs.append(None)
                    continue
                embs.append(self.face_embed_fn(crop))
            dists = np.array(
                [np.linalg.norm(self.target_face_embedding - e) if e is not None else 1e9
                 for e in embs]
            )
            if not (dists < 0.9).any():
                return None
            return boxes[int(np.argmin(dists))]
        # center face (fast_detector/__init__.py:122-135)
        if len(boxes) == 0:
            return None
        if len(boxes) == 1:
            return boxes[0]
        cx, cy = W // 2, H // 2
        centers = np.stack(
            [(boxes[:, 0] + boxes[:, 2]) // 2, (boxes[:, 1] + boxes[:, 3]) // 2], 1
        )
        d = np.abs(centers - [cx, cy]).sum(1)
        return boxes[int(np.argmin(d))]

    def _landmarks(self, frame: np.ndarray, box) -> np.ndarray:
        """Square-pad crop -> 112x112 /255 -> landmark net -> reproject
        (fast_detector/__init__.py:178-224)."""
        H, W, _ = frame.shape
        x1, y1, x2, y2 = [int(v) for v in box]
        w, h = x2 - x1 + 1, y2 - y1 + 1
        size = max(w, h)
        cx, cy = x1 + w // 2, y1 + h // 2
        x1, y1 = cx - size // 2, cy - size // 2
        x2, y2 = x1 + size, y1 + size
        dx, dy = max(0, -x1), max(0, -y1)
        edx, edy = max(0, x2 - W), max(0, y2 - H)
        x1c, y1c, x2c, y2c = max(0, x1), max(0, y1), min(W, x2), min(H, y2)
        face = frame[y1c:y2c, x1c:x2c]
        if dx or dy or edx or edy:
            face = cv2.copyMakeBorder(face, dy, edy, dx, edx, cv2.BORDER_CONSTANT, 0)
        face = cv2.resize(face, (112, 112)).astype(np.float32) / 255.0
        out = np.asarray(self.landmark_fn(face.transpose(2, 0, 1)[None]))
        lm = out[0].reshape(-1, 2).copy()
        # reproject from unit square to the padded box
        lm[:, 0] = x1 + lm[:, 0] * size
        lm[:, 1] = y1 + lm[:, 1] * size
        return lm
