"""Per-stage device timings of the inference pipeline on the real chip.

Times each jitted piece in isolation with data-dependent syncs:
  frontend   — the 3->24 Conv3d front-end alone (video.py frontend3D)
  encoder    — full VideoExtractor (frontend + ShuffleNetV2 trunk)
  facenet    — FaceRecognizer on one 160x160 crop
  decoder    — 300-step AR decode + postnet on precomputed features
  inversion  — NNLS + Griffin-Lim on the 80-frame mel prefix

Isolated pieces overlap less than the fused program (no cross-stage fusion),
so the sum exceeds the fused forward; use the deltas to rank targets.

Run: python tools/bench_stages.py [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.utils.compile_cache import enable_compilation_cache
from lip2speech_tpu.utils.devtime import device_time


def timed(fn, *a, n=10):
    """Device-true ms/call; see lip2speech_tpu.utils.devtime for why
    nothing else survives the axon tunnel."""
    return device_time(fn, *a, n=n) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--gl_iters", type=int, default=32)
    args = ap.parse_args()

    enable_compilation_cache()
    from lip2speech_tpu.config import Config
    from lip2speech_tpu.models.decoder import Decoder
    from lip2speech_tpu.models.face import FaceRecognizer
    from lip2speech_tpu.models.video import VideoExtractor
    from lip2speech_tpu.ops import griffin_lim as gl_ops
    from lip2speech_tpu.train.train_step import cast_floats

    cfg = Config()
    b = args.batch
    bf = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    video = jax.random.normal(key, (b, cfg.data.max_video_frames, *cfg.data.mouth_size, 3), bf)
    face = jax.random.normal(key, (b, *cfg.data.face_size, 3), bf)
    rngs = {"gumbel": jax.random.PRNGKey(1)}

    results = {}

    # tunnel round-trip floor: one synced trivial dispatch (NOT the
    # in-jit protocol — this deliberately measures the RPC cost that the
    # in-jit loops exclude, for context)
    @jax.jit
    def null_op(x):
        return x + 1.0

    float(null_op(jnp.float32(0.0)))  # warm
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(null_op(jnp.float32(0.0)))
        rtts.append(time.time() - t0)
    results["tunnel_rtt_ms"] = float(np.median(rtts)) * 1e3

    # encoder & frontend
    enc = VideoExtractor(cfg.model.frontend_channels, cfg.model.shufflenet_width)
    ev = cast_floats(enc.init(jax.random.PRNGKey(0), video, train=False), bf)

    fe_w = ev["params"]["frontend_conv"]["kernel"]

    @jax.jit
    def frontend(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 2, 2), [(2, 2), (3, 3), (3, 3)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        )

    results["frontend_ms"] = timed(frontend, video, fe_w)

    @jax.jit
    def encoder(v):
        return enc.apply(ev, v, train=False)

    results["encoder_ms"] = timed(encoder, video)

    # facenet
    fr = FaceRecognizer()
    frv = cast_floats(fr.init(jax.random.PRNGKey(0), face, train=False), bf)

    @jax.jit
    def facenet(f):
        return fr.apply(frv, f, train=False)

    results["facenet_ms"] = timed(facenet, face)

    # decoder on fake features
    feats = encoder(video)
    emb = facenet(face)
    emb = jax.nn.relu(emb)
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    T = feats.shape[1]
    visual = jnp.concatenate([feats, jnp.tile(emb[:, None, :], (1, T, 1))], -1)
    dec = Decoder(cfg.model)
    # init in f32 (as production does) then cast params + activations
    dv = cast_floats(
        dec.init(
            jax.random.PRNGKey(0),
            visual.astype(jnp.float32),
            emb.astype(jnp.float32),
            None, 1.0, rngs, False,
        ),
        bf,
    )

    @jax.jit
    def decode(vis, e):
        return dec.apply(dv, vis, e, None, 1.0, rngs, False)["mel_postnet"]

    results["decoder_ms"] = timed(decode, visual, emb)

    # inversion
    mel = decode(visual, emb).astype(jnp.float32)[..., : cfg.data.max_mel_frames]

    @jax.jit
    def invert(m, k):
        return gl_ops.mel_to_audio(m, k, cfg.audio, n_iter=args.gl_iters,
                                   compute_dtype=bf)

    results["invert_ms"] = timed(invert, mel, key)

    results = {k: round(v, 2) for k, v in results.items()}
    results["batch"] = b
    print(json.dumps(results))


if __name__ == "__main__":
    main()
