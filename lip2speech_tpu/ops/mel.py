"""Mel-scale ops: filterbank, mel spectrogram, log compression.

TPU-native replacement for the reference's torchaudio ``T.MelSpectrogram``
(``/root/reference/datasets/spectograms.py:42-61``) and the
``spectral_normalize``/``spectral_de_normalize`` pair (``:33-39``).

The filterbank follows torchaudio conventions exactly (HTK mel scale,
``norm=None``, triangular filters over ``linspace(0, sr/2, n_freqs)``) so
that mels produced here are numerically interchangeable with the
reference's training targets.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import AudioConfig
from lip2speech_tpu.ops import stft as stft_ops


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    fmin: float,
    fmax: float,
) -> np.ndarray:
    """Triangular HTK filterbank, shape ``(n_freqs, n_mels)``.

    Matches ``torchaudio.functional.melscale_fbanks(..., mel_scale='htk',
    norm=None)``.
    """
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    f_pts = mel_to_hz(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def log_compress(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """``spectral_normalize``: log(clamp(x, min=clip_val))."""
    return jnp.log(jnp.maximum(x, clip_val))


def log_decompress(x: jnp.ndarray) -> jnp.ndarray:
    """``spectral_de_normalize``: exp(x)."""
    return jnp.exp(x)


def melspectrogram(
    waveform: jnp.ndarray,
    cfg: AudioConfig = AudioConfig(),
    log: bool = True,
) -> jnp.ndarray:
    """Waveform ``(..., n_samples)`` -> log-mel ``(..., n_mels, T)``.

    Pipeline (all MXU/VPU, no host round trips): frame -> windowed DFT
    matmul -> power -> mel matmul -> log clamp. XLA fuses the elementwise
    stages into the matmuls.
    """
    power = stft_ops.spectrogram(
        waveform, cfg.n_fft, cfg.hop_length, cfg.win_length, power=2.0
    )
    fb = jnp.asarray(
        mel_filterbank(cfg.n_freqs, cfg.n_mels, cfg.sample_rate, cfg.fmin, cfg.fmax)
    )
    # (..., n_freqs, T) x (n_freqs, n_mels) -> (..., n_mels, T)
    mel = jnp.einsum("...ft,fm->...mt", power, fb)
    if log:
        mel = log_compress(mel, cfg.clip_val)
    return mel


def mel_to_linear(
    mel_power: jnp.ndarray,
    cfg: AudioConfig = AudioConfig(),
    n_nnls_iters: int = 16,
) -> jnp.ndarray:
    """Invert the mel projection: ``(..., n_mels, T)`` -> ``(..., n_freqs, T)``.

    TPU-native replacement for torchaudio's SGD-based ``InverseMelScale``
    (reference spectograms.py:80-85, 256 SGD iterations). We solve the
    nonnegative least-squares problem with a pseudo-inverse warm start
    followed by multiplicative NNLS updates — every step is a dense matmul,
    so the whole inversion stays on the MXU and is ~2 orders of magnitude
    faster than per-bin SGD while meeting ESTOI-level fidelity.
    """
    fb = mel_filterbank(cfg.n_freqs, cfg.n_mels, cfg.sample_rate, cfg.fmin, cfg.fmax)
    pinv = jnp.asarray(np.linalg.pinv(fb))  # (n_mels, n_freqs)
    fb = jnp.asarray(fb)

    x = jnp.einsum("mf,...mt->...ft", pinv, mel_power)
    x = jnp.maximum(x, 0.0)

    eps = 1e-10
    # Multiplicative updates for || fb^T x - mel ||^2 s.t. x >= 0:
    #   x <- x * (fb @ mel) / (fb @ fb^T @ x)
    num = jnp.einsum("fm,...mt->...ft", fb, mel_power)
    gram = fb @ fb.T  # (n_freqs, n_freqs)
    for _ in range(n_nnls_iters):
        denom = jnp.einsum("fg,...gt->...ft", gram, x)
        x = x * (num + eps) / (denom + eps)
    return x
