"""Qualitative speaker-encoder check: dump a sample's face image and the
face/speech embeddings as .npy for manual inspection.

Rebuild of /root/reference/speaker_encoder/test.py:29-46.
Usage: python -m lip2speech_tpu.cli.speaker_test --root <AVSpeech root>
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import Config
from lip2speech_tpu.ops import image as image_ops
from lip2speech_tpu.speaker import AVSpeechFace, init_speaker_training


def main(argv=None):
    p = argparse.ArgumentParser("speaker encoder qualitative test")
    p.add_argument("--root", required=True)
    p.add_argument("--out", default="speaker_test_out")
    p.add_argument("--index", type=int, default=0)
    args = p.parse_args(argv)

    cfg = Config()
    os.makedirs(args.out, exist_ok=True)
    ds = AVSpeechFace(args.root, mode="test", cfg=cfg.data)
    sample = ds[args.index]

    (face_net, _, speaker), params, stats, spk_vars = init_speaker_training(
        cfg, jax.random.PRNGKey(0), batch_size=1
    )
    faces = image_ops.normalize_face(jnp.asarray(sample["face"][None]))
    face_emb = face_net.apply(
        {"params": params["face"], "batch_stats": stats["face"]},
        faces, train=False,
    )
    speech = jnp.asarray(sample["speech"][None])
    speech_emb = speaker.apply(spk_vars, speech)

    import cv2

    cv2.imwrite(os.path.join(args.out, "face.jpg"), sample["face"][:, :, ::-1])
    np.save(os.path.join(args.out, "face_embedding.npy"), np.asarray(face_emb))
    np.save(os.path.join(args.out, "speech_embedding.npy"), np.asarray(speech_emb))
    print(f"wrote face.jpg + embeddings to {args.out}")


if __name__ == "__main__":
    main()
