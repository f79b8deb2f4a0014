"""Per-stage device timings of the inference pipeline on the real chip.

Times each jitted piece in isolation with data-dependent syncs:
  frontend   — the 3->24 Conv3d front-end alone (video.py frontend3D)
  encoder    — full VideoExtractor (frontend + ShuffleNetV2 trunk)
  facenet    — FaceRecognizer on one 160x160 crop
  decoder    — 300-step AR decode + postnet on precomputed features
  inversion  — NNLS + Griffin-Lim on the 80-frame mel prefix

Isolated pieces overlap less than the fused program (no cross-stage fusion),
so the sum exceeds the fused forward; use the deltas to rank targets.

With ``--analysis`` each stage also gets a speed-of-light accounting:
compiled-HLO FLOPs and bytes-accessed (XLA cost analysis) against the
chip's peak bf16 FLOP rate and HBM bandwidth, i.e. the fastest the stage
could possibly run = max(flops/peak, bytes/bw). ``attained_pct`` is that
bound over the measured time. The decoder row adds the AR-loop-specific
bound: 300 sequential steps each stream the per-step weights (prenet,
query/attention projections, 2-layer LSTM, frame/stop heads) from HBM if
they don't stay VMEM-resident — ``ar_weight_stream_ms`` is that floor.
This reframes low whole-model MFU: stages bound by bandwidth or serial
latency cannot express progress as FLOP utilization.

Run: python tools/bench_stages.py [--batch 64] [--analysis] [--no-time]
(--no-time computes the analysis alone — works on CPU with no chip.)
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


# peak bf16 FLOP/s and HBM bytes/s by device kind (public TPU specs);
# the CPU fallback keeps --no-time analysis runs meaningful relative to
# the v5e the bench targets.
PEAKS = {
    "TPU v4": (275e12, 1.2e12),
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v5p": (459e12, 2.8e12),
    "TPU v6 lite": (918e12, 1.6e12),
    "TPU v6e": (918e12, 1.6e12),
}
DEFAULT_PEAK = (197e12, 819e9)


def cost(jitted, *a):
    """(flops, bytes_accessed) of the compiled program."""
    ca = jitted.lower(*a).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    if not ca:
        return 0.0, 0.0
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--gl_iters", type=int, default=32)
    ap.add_argument("--analysis", action="store_true",
                    help="add FLOPs/bytes + speed-of-light bounds per stage")
    ap.add_argument("--no-time", action="store_true",
                    help="skip device timing (analysis-only; runs on CPU)")
    args = ap.parse_args()
    if args.no_time:
        args.analysis = True
        # Analysis-only runs need no chip; force CPU via the config flag
        # (the axon plugin ignores $JAX_PLATFORMS, same dodge as conftest).
        jax.config.update("jax_platforms", "cpu")

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
    peak_f, peak_b = PEAKS.get(jax.devices()[0].device_kind, DEFAULT_PEAK)

    def record(name, jitted, *a):
        row = {}
        if not args.no_time:
            row["ms"] = round(timed(jitted, *a), 2)
        if args.analysis:
            f, by = cost(jitted, *a)
            sol = max(f / peak_f, by / peak_b) * 1e3
            row["gflops"] = round(f / 1e9, 1)
            row["gbytes"] = round(by / 1e9, 2)
            row["sol_ms"] = round(sol, 2)
            if row.get("ms"):
                row["attained_pct"] = round(100.0 * sol / row["ms"], 1)
        results[name] = row if args.analysis else row["ms"]
        print(json.dumps({name: results[name]}), flush=True)
        return row

    if not args.no_time:
        # tunnel round-trip floor: one synced trivial dispatch (NOT the
        # in-jit protocol — this deliberately measures the RPC cost that
        # the in-jit loops exclude, for context)
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

    record("frontend", frontend, video, fe_w)

    @jax.jit
    def encoder(v):
        return enc.apply(ev, v, train=False)

    record("encoder", encoder, video)

    # facenet
    fr = FaceRecognizer()
    frv = cast_floats(fr.init(jax.random.PRNGKey(0), face, train=False), bf)

    @jax.jit
    def facenet(f):
        return fr.apply(frv, f, train=False)

    record("facenet", facenet, face)

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

    row = record("decoder", decode, visual, emb)
    if args.analysis:
        # AR-loop-specific floor: each of the max_mel_frames sequential
        # steps reads the per-step weights (prenet, query + attention
        # projections, 2-layer LSTM, frame/stop heads) from HBM unless
        # XLA keeps them VMEM-resident across the scan. Encoder-side
        # banks (K/V/content/BiLSTM sites) run once and are excluded.
        per_step_params = 0
        for gname, sub in dv["params"].items():
            if gname.startswith(
                ("prenet", "Q_", "attention_proj", "content_Q",
                 "decoder_rnn", "fc_out", "stop_token")
            ):
                per_step_params += sum(
                    int(np.prod(leaf.shape)) for leaf in jax.tree.leaves(sub)
                )
        ar_ms = cfg.data.max_mel_frames * per_step_params * 2 / peak_b * 1e3
        row["ar_weight_stream_ms"] = round(ar_ms, 2)
        print(json.dumps({"decoder_ar_weight_stream_ms": row["ar_weight_stream_ms"]}),
              flush=True)

    # inversion
    mel = decode(visual, emb).astype(jnp.float32)[..., : cfg.data.max_mel_frames]

    @jax.jit
    def invert(m, k):
        return gl_ops.mel_to_audio(m, k, cfg.audio, n_iter=args.gl_iters,
                                   compute_dtype=bf)

    record("invert", invert, mel, key)

    results = {
        k: (round(v, 2) if isinstance(v, float) else v) for k, v in results.items()
    }
    results["batch"] = b
    results["device_kind"] = jax.devices()[0].device_kind
    print(json.dumps(results))


if __name__ == "__main__":
    main()
