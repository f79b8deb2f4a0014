"""LRW corpus preprocessing.

Rebuild of ``/root/reference/datasets/lrw/preprocess.py:28-61``: per
word/split, (1) extract mono 16 kHz audio from each mp4 (ffmpeg-gated) and
store it as the raw-waveform ``.npz`` the LRW reader consumes, and (2) run
batched face detection over the video frames writing per-frame
``face_coords`` json (the reference used face_alignment SFD; here the
native-JAX RFB-320 detector).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def preprocess_clip(video_path: str, detector, out_audio: str | None,
                    out_json: str, sr: int = 16000):
    if out_audio and not os.path.isfile(out_audio):
        import tempfile

        from lip2speech_tpu.prep.common import extract_wav
        from lip2speech_tpu.data.wild import load_wav

        with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
            extract_wav(video_path, tmp.name, sr)
            _, wav = load_wav(tmp.name)
        os.makedirs(os.path.dirname(out_audio), exist_ok=True)
        np.savez(out_audio, data=wav.astype(np.float32))

    cap = cv2.VideoCapture(video_path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[:, :, ::-1])
    cap.release()
    if not frames:
        return 0
    results = detector(np.stack(frames))
    info = {
        str(i): {"face_coords": [int(v) for v in res[0]],
                 "landmarks": res[1].astype(int).tolist()}
        for i, res in enumerate(results)
        if res is not None
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(info, f)
    return len(info)


def main(argv=None):
    p = argparse.ArgumentParser("LRW preprocess")
    p.add_argument("--root", required=True, help="LRW mp4 root (word/split/*.mp4)")
    p.add_argument("--out", required=True, help="output corpus root")
    p.add_argument("--skip_audio", action="store_true")
    args = p.parse_args(argv)

    from lip2speech_tpu.detect import FaceDetector

    det = FaceDetector()
    n = 0
    for dirpath, _, files in sorted(os.walk(args.root)):
        for fn in sorted(files):
            if not fn.endswith(".mp4"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn[:-4]), args.root)
            preprocess_clip(
                os.path.join(dirpath, fn),
                det,
                None if args.skip_audio else os.path.join(args.out, "lipread_audio", rel + ".npz"),
                os.path.join(args.out, "face_info", rel + ".json"),
            )
            n += 1
    print(f"processed {n} clips")


if __name__ == "__main__":
    main()
