"""Long-video synthesis CLI (the paper's chunked inference setting,
Report.pdf §4.2): silent video of ANY length -> chunked batched decode ->
one Griffin-Lim pass -> waveform.

Inputs (no ffmpeg needed in this image):
  --frames_npz  an .npz with `mouth` (T, 96, 96, 3) uint8 mouth-ROI
                frames @25 fps and `faces` (n_crops, 160, 160, 3) uint8
                identity crops, or
  --from_lrw    an LRW-format root: the test clips are concatenated into
                one long video (handy smoke over the bundled fixture).

Usage: python -m lip2speech_tpu.cli.synthesize --from_lrw <root> --out out.wav
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from lip2speech_tpu.cli.common import load_model
from lip2speech_tpu.config import Config
from lip2speech_tpu.eval.long_video import synthesize_long_video
from lip2speech_tpu.ops import image as image_ops


def parse_args(argv=None):
    p = argparse.ArgumentParser("lip2speech_tpu synthesize (long video)")
    p.add_argument("--frames_npz", default=None)
    p.add_argument("--from_lrw", default=None,
                   help="LRW root; concatenates its test clips")
    p.add_argument("--n_clips", type=int, default=4,
                   help="clips to concatenate with --from_lrw")
    p.add_argument("--model_path", default=None)
    p.add_argument("--out", default="synth.wav")
    p.add_argument("--gl_iters", type=int, default=32)
    p.add_argument("--override", action="append", default=[])
    return p.parse_args(argv)


def load_frames(args, cfg: Config):
    if args.frames_npz:
        data = np.load(args.frames_npz)
        return data["mouth"], data["faces"]
    if args.from_lrw:
        from lip2speech_tpu.data import LRW

        ds = LRW(args.from_lrw, mode="test", cfg=cfg.data)
        samples = [ds[i % len(ds)] for i in range(args.n_clips)]
        mouth = np.concatenate([s["mouth"] for s in samples], axis=0)
        return mouth, samples[0]["faces"]
    raise SystemExit("need --frames_npz or --from_lrw")


def main(argv=None):
    args = parse_args(argv)
    from lip2speech_tpu.config import config_with_overrides

    cfg = config_with_overrides(*args.override)
    mouth_u8, faces_u8 = load_frames(args, cfg)
    model, variables, _ = load_model(cfg, args.model_path, batch_size=1)

    video = np.asarray(image_ops.normalize_mouth(mouth_u8[None]))[0]
    faces = np.asarray(image_ops.normalize_face(faces_u8[None]))[0]
    wav, mel = synthesize_long_video(
        model, variables, video, faces, cfg, jax.random.PRNGKey(0),
        n_gl_iters=args.gl_iters,
    )

    from scipy.io import wavfile

    wavfile.write(args.out, cfg.audio.sample_rate, wav.astype(np.float32))
    dur = len(wav) / cfg.audio.sample_rate
    print(
        f"synthesized {dur:.2f}s ({mouth_u8.shape[0]} frames -> "
        f"{mel.shape[1]} mel frames) -> {args.out}"
    )


if __name__ == "__main__":
    main()
