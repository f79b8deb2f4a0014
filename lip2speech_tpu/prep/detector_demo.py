"""Headless face-detector demo over a video: annotated frames out.

Parity with /root/reference/datasets/grid/preprocess.py (a vendored
realtime ONNX+OpenVINO detector demo with cv2 windows): same pipeline,
but frames with drawn boxes/landmarks are written to an output directory
instead of displayed.
Usage: python -m lip2speech_tpu.prep.detector_demo --video x.mp4 --out dir
"""

from __future__ import annotations

import argparse
import os

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def main(argv=None):
    p = argparse.ArgumentParser("detector demo")
    p.add_argument("--video", required=True)
    p.add_argument("--out", default="detector_demo_out")
    p.add_argument("--max_frames", type=int, default=100)
    args = p.parse_args(argv)

    from lip2speech_tpu.detect import FaceDetector

    det = FaceDetector()
    os.makedirs(args.out, exist_ok=True)
    cap = cv2.VideoCapture(args.video)
    idx = 0
    while idx < args.max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        res = det(frame[None, :, :, ::-1])[0]
        if res is not None:
            box, lm = res
            cv2.rectangle(frame, (box[0], box[1]), (box[2], box[3]), (0, 255, 0), 2)
            for x, y in lm:
                cv2.circle(frame, (int(x), int(y)), 1, (0, 0, 255), -1)
        cv2.imwrite(os.path.join(args.out, f"{idx:05d}.jpg"), frame)
        idx += 1
    cap.release()
    print(f"wrote {idx} annotated frames to {args.out}")


if __name__ == "__main__":
    main()
