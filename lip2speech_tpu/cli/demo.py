"""Demo CLI: free-running inference on test clips, waveform artifacts out.

Rebuild of ``/root/reference/demo.py:24-120`` for headless TPU hosts: no
cv2 windows / sounddevice playback; instead each clip writes
``<out>/clip{i}_gt.wav``, ``..._pred.wav``, mel + attention PNGs, exactly
the artifacts the reference renders interactively. Speaker conditioning
comes from the face crop (default) or the voice SpeakerEncoder
(--encoding voice), mirroring demo.py:81-84.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from scipy.io import wavfile

from lip2speech_tpu.cli.common import add_common_args, common_config, load_model
from lip2speech_tpu.config import Config
from lip2speech_tpu.data import Loader, get_dataset, prepare_batch
from lip2speech_tpu.models import SpeakerEncoder
from lip2speech_tpu.ops import griffin_lim as gl_ops
from lip2speech_tpu.train.logging_utils import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser("lip2speech_tpu demo")
    add_common_args(p)
    p.add_argument("--encoding", choices=("face", "voice"), default="face")
    p.add_argument("--n_clips", type=int, default=4)
    p.add_argument("--out", default="demo_out")
    p.add_argument("--gl_iters", type=int, default=64)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = common_config(args)
    os.makedirs(args.out, exist_ok=True)

    ds = get_dataset(args.dataset, args.root, mode="test", cfg=cfg.data)
    model, variables, speaker_sd = load_model(cfg, args.model_path, 1)
    logger = MetricLogger(args.out)

    speaker = None
    speaker_vars = None
    if args.encoding == "voice":
        speaker = SpeakerEncoder(cfg.model)
        speaker_vars = jax.jit(speaker.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 16000))
        )
        if speaker_sd:
            from lip2speech_tpu.train.checkpoint import _set

            p = {}
            for l in range(cfg.model.speaker_lstm_layers):
                _set(p, ("lstm", f"l{l}_fwd", "wx"), speaker_sd[f"lstm.weight_ih_l{l}"].T)
                _set(p, ("lstm", f"l{l}_fwd", "wh"), speaker_sd[f"lstm.weight_hh_l{l}"].T)
                _set(p, ("lstm", f"l{l}_fwd", "b"),
                     speaker_sd[f"lstm.bias_ih_l{l}"] + speaker_sd[f"lstm.bias_hh_l{l}"])
            _set(p, ("linear", "kernel"), speaker_sd["linear.weight"].T)
            _set(p, ("linear", "bias"), speaker_sd["linear.bias"])
            speaker_vars = {"params": p}
            print("loaded speaker_encoder weights from combined checkpoint")

    rngs = {"gumbel": jax.random.PRNGKey(0)}

    @jax.jit
    def infer(vars_, video, faces, spk_emb, key):
        out = model.apply(
            vars_, video, faces, None, 1.0, spk_emb, rngs, train=False
        )
        wav = gl_ops.mel_to_audio(
            out["mel_postnet"], key, cfg.audio, n_iter=args.gl_iters
        )
        return out, wav

    loader = Loader(ds, 1, cfg.data, shuffle=False, drop_last=False, num_workers=2)
    key = jax.random.PRNGKey(0)
    sr = cfg.audio.sample_rate
    for i, raw in enumerate(loader):
        if i >= args.n_clips:
            break
        batch = prepare_batch(
            {k: jnp.asarray(v) for k, v in raw.items()}, cfg.audio, cfg.data
        )
        spk_emb = None
        if speaker is not None:
            spk_emb = speaker.apply(
                speaker_vars, batch["audio"], method=SpeakerEncoder.inference
            )
        key, k1, k2 = jax.random.split(key, 3)
        out, wav_pred = infer(variables, batch["video"], batch["faces"], spk_emb, k1)

        n_steps = int(out["lengths"][0])
        wav_pred = np.asarray(wav_pred)[0, : n_steps * cfg.audio.hop_length]
        gt = np.asarray(raw["audio"])[0, : int(raw["audio_lengths"][0])]
        gt_mel = np.asarray(batch["mel"])[0]
        wav_gt = np.asarray(
            gl_ops.mel_to_audio(jnp.asarray(gt_mel), k2, cfg.audio, n_iter=args.gl_iters)
        )[: len(gt)]

        wavfile.write(f"{args.out}/clip{i}_gt.wav", sr, gt.astype(np.float32))
        wavfile.write(f"{args.out}/clip{i}_gt_gl.wav", sr, wav_gt.astype(np.float32))
        wavfile.write(f"{args.out}/clip{i}_pred.wav", sr, wav_pred.astype(np.float32))
        logger.images(
            i,
            mel_pred=np.asarray(out["mel_postnet"])[0],
            mel_target=gt_mel,
            attention=np.asarray(out["attention"])[0].T,
            gate=jax.nn.sigmoid(np.asarray(out["gate"])[0].reshape(-1)),
        )
        print(
            f"clip {i}: stop at step {n_steps}/{cfg.model.max_decoder_steps}, "
            f"wrote {args.out}/clip{i}_pred.wav"
        )


if __name__ == "__main__":
    main()
