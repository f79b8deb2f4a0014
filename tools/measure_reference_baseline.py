"""Measure the PyTorch reference's end-to-end eval throughput on this host.

Times the reference eval hot path (/root/reference/evaluate.py:22-51):
  net forward (tf_ratio=1)  ->  MelSpec2Audio  ->  waveform
with the ACTUAL reference modules where importable (VideoExtractor,
Decoder — imported from /root/reference, randomly initialised exactly as
the parity tests do) and faithful core-torch reimplementations of the
torchaudio 0.9.0 kernels that are not installed here:

* ``InverseMelScale`` — SGD(lr=0.1, momentum=0.9) on the linear spec,
  ``max_iter=256`` with per-iteration clamp(min=0), identical op count
  (torchaudio 0.9.0 source semantics; reference instantiates it at
  datasets/spectograms.py:81-86 with max_iters=256).
* ``GriffinLim`` — 256 iterations of istft/stft phase refinement with
  momentum 0.99 (torchaudio 0.9.0; reference spectograms.py:88-92).

Exclusions (documented in BASELINE.md): FaceRecognizer
(facenet-pytorch InceptionResnetV1, not installable offline) — one
160x160 forward per clip, ~1.6 GFLOPs, <2% of the path; pystoi scoring
(a metric, not part of synthesis).

Run:  python tools/measure_reference_baseline.py [--batch 32] [--runs 3]
Prints one JSON line with clips/sec and a per-stage breakdown.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time

import numpy as np
import torch

REF = "/root/reference"

# fixture-real shapes: SAMPLE_LRW clips are 19456 samples @16 kHz = 1.216 s
N_VIDEO_FRAMES = 25  # 25 fps x ~1 s window (LRW duration=1)
N_MEL = 76  # 19456 / hop 256
N_FFT, HOP, WIN = 1024, 256, 1024
N_MELS, N_FREQ = 80, 513
INV_MEL_ITERS = 256
GL_ITERS = 256


def _import_ref():
    for p in (REF, os.path.join(REF, "model", "modules")):
        if p not in sys.path:
            sys.path.insert(0, p)
    video_mod = importlib.import_module("video")
    decoder_mod = importlib.import_module("decoder")
    return video_mod, decoder_mod


def _mel_fb() -> torch.Tensor:
    """(n_freq, n_mels) HTK mel filterbank, torchaudio-equivalent layout."""
    fmin, fmax, sr = 0.0, 8000.0, 16000

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), N_MELS + 2)
    f_pts = mel_to_hz(mels)
    freqs = np.linspace(0, sr / 2, N_FREQ)
    fb = np.zeros((N_FREQ, N_MELS))
    for i in range(N_MELS):
        lower = (freqs - f_pts[i]) / (f_pts[i + 1] - f_pts[i])
        upper = (f_pts[i + 2] - freqs) / (f_pts[i + 2] - f_pts[i + 1])
        fb[:, i] = np.maximum(0, np.minimum(lower, upper))
    return torch.from_numpy(fb.astype(np.float32))


def inverse_mel_scale(melspec: torch.Tensor, fb: torch.Tensor) -> torch.Tensor:
    """torchaudio 0.9.0 InverseMelScale semantics: SGD on the linear spec.

    melspec (B, n_mels, T) -> (B, n_freq, T)
    """
    b, _, t = melspec.shape
    melspec_bt = melspec.transpose(1, 2)  # (B, T, n_mels)
    spec = torch.rand(b, t, N_FREQ, requires_grad=True)
    optim = torch.optim.SGD([spec], lr=0.1, momentum=0.9)
    for _ in range(INV_MEL_ITERS):
        optim.zero_grad()
        diff = melspec_bt - spec.matmul(fb)
        loss = diff.pow(2).sum(axis=-1).mean()
        loss.backward()
        optim.step()
        with torch.no_grad():
            spec.clamp_(min=0)
    return spec.detach().transpose(1, 2)


def griffin_lim(power_spec: torch.Tensor) -> torch.Tensor:
    """torchaudio 0.9.0 GriffinLim (power=2, momentum=0.99, rand init)."""
    momentum = 0.99 / (1 + 0.99)
    mag = power_spec.clamp(min=1e-10).pow(0.5)  # (B, F, T)
    window = torch.hann_window(WIN)
    angles = torch.polar(torch.ones_like(mag), torch.rand_like(mag) * 2 * np.pi)
    tprev = torch.zeros_like(angles)
    length = (mag.shape[-1] - 1) * HOP
    for _ in range(GL_ITERS):
        inverse = torch.istft(
            mag * angles, N_FFT, HOP, WIN, window, length=length
        )
        rebuilt = torch.stft(
            inverse, N_FFT, HOP, WIN, window, return_complex=True
        )
        angles = rebuilt - tprev * momentum
        angles = angles / angles.abs().clamp(min=1e-16)
        tprev = rebuilt
    return torch.istft(mag * angles, N_FFT, HOP, WIN, window, length=length)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)  # reference eval batch
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    video_mod, decoder_mod = _import_ref()
    torch.manual_seed(0)
    encoder = video_mod.VideoExtractor().eval()
    decoder = decoder_mod.Decoder().eval()

    b = args.batch
    rng = np.random.RandomState(0)
    videos = torch.from_numpy(
        rng.randn(b, 3, N_VIDEO_FRAMES, 96, 96).astype(np.float32)
    )
    mels = torch.from_numpy(rng.randn(b, N_MELS, N_MEL).astype(np.float32) - 5.0)
    face_emb = torch.from_numpy(rng.randn(b, 256).astype(np.float32))
    video_lengths = torch.full((b,), N_VIDEO_FRAMES, dtype=torch.long)
    mel_lengths = torch.full((b,), N_MEL, dtype=torch.long)
    fb = _mel_fb()

    stages = {"forward": [], "inv_mel": [], "griffin_lim": []}
    for _ in range(args.runs):
        t0 = time.time()
        with torch.no_grad():
            visual = encoder(videos)  # (B, T, 768)
            face_tiled = face_emb[:, None, :].repeat(1, visual.shape[1], 1)
            # model/model.py:36 concatenates video features + tiled face emb
            features = torch.cat([visual, face_tiled], dim=2)  # (B, T, 1024)
            out = decoder(
                features, face_tiled, mels, video_lengths, mel_lengths, 1.0
            )
            mel_out = out[1]  # postnet output, evaluate.py:38
        stages["forward"].append(time.time() - t0)

        t0 = time.time()
        # spectral_de_normalize = exp (spectograms.py:33-39)
        linear = inverse_mel_scale(torch.exp(mel_out), fb)
        stages["inv_mel"].append(time.time() - t0)

        t0 = time.time()
        with torch.no_grad():
            wav = griffin_lim(linear)
        stages["griffin_lim"].append(time.time() - t0)
        assert torch.isfinite(wav).all()

    med = {k: float(np.median(v)) for k, v in stages.items()}
    total = sum(med.values())
    print(
        json.dumps(
            {
                "reference_cpu_clips_per_sec": round(b / total, 3),
                "batch": b,
                "seconds_per_batch": round(total, 2),
                "breakdown_sec": {k: round(v, 2) for k, v in med.items()},
                "host_cpus": os.cpu_count(),
                "torch": torch.__version__,
            }
        )
    )


if __name__ == "__main__":
    main()
