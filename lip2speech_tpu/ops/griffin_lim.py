"""Griffin-Lim phase reconstruction and mel -> waveform inversion.

TPU-native replacement for the reference evaluation hot path
(``/root/reference/datasets/spectograms.py:76-95``:
``InverseMelScale(max_iter=256)`` + ``GriffinLim(n_iter=256)``). The whole
inversion runs on-device as one jitted program: a ``lax.fori_loop`` over
STFT/ISTFT pairs with momentum, exactly the torchaudio update rule
(momentum 0.99) so converted pipelines behave identically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lip2speech_tpu.config import AudioConfig
from lip2speech_tpu.ops import mel as mel_ops
from lip2speech_tpu.ops import stft as stft_ops


def griffin_lim(
    specgram: jnp.ndarray,
    cfg: AudioConfig = AudioConfig(),
    n_iter: int = 256,
    power: float = 2.0,
    momentum: float = 0.99,
    rand_init: bool = True,
    key: jax.Array | None = None,
    length: int | None = None,
) -> jnp.ndarray:
    """Reconstruct a waveform from a power/magnitude spectrogram.

    Args:
      specgram: ``(..., n_freqs, T)`` nonnegative spectrogram.
      power: exponent of the input (2.0 = power, as torchaudio default).
    Returns ``(..., n_samples)`` waveform.
    """
    magnitude = jnp.power(jnp.maximum(specgram, 1e-30), 1.0 / power)
    window = stft_ops.hann_window(cfg.win_length)

    if rand_init:
        if key is None:
            key = jax.random.PRNGKey(0)
        angles = jax.random.uniform(
            key, magnitude.shape, minval=-jnp.pi, maxval=jnp.pi
        )
        angles = jnp.exp(1j * angles).astype(jnp.complex64)
    else:
        angles = jnp.ones(magnitude.shape, jnp.complex64)

    t_frames = magnitude.shape[-1]
    # ISTFT(center=True) of T frames yields (T-1)*hop samples.
    n_samples = (t_frames - 1) * cfg.hop_length

    def body(_, carry):
        angles, tprev = carry
        inverse = stft_ops.istft(
            magnitude * angles,
            cfg.n_fft,
            cfg.hop_length,
            cfg.win_length,
            window,
            length=n_samples,
        )
        rebuilt = stft_ops.stft(
            inverse, cfg.n_fft, cfg.hop_length, cfg.win_length, window
        )[..., :t_frames]
        new_angles = rebuilt - tprev * (momentum / (1.0 + momentum))
        new_angles = new_angles / jnp.maximum(jnp.abs(new_angles), 1e-16)
        return new_angles, rebuilt

    angles, _ = jax.lax.fori_loop(
        0, n_iter, body, (angles, jnp.zeros_like(angles))
    )
    wav = stft_ops.istft(
        magnitude * angles,
        cfg.n_fft,
        cfg.hop_length,
        cfg.win_length,
        window,
        length=n_samples,
    )
    if length is not None:
        wav = wav[..., :length]
    return wav


@functools.partial(jax.jit, static_argnames=("cfg", "n_iter", "nnls_iters"))
def mel_to_audio(
    log_mel: jnp.ndarray,
    key: jax.Array,
    cfg: AudioConfig = AudioConfig(),
    n_iter: int = 256,
    nnls_iters: int = 16,
) -> jnp.ndarray:
    """Full ``MelSpec2Audio`` equivalent: log-mel ``(..., n_mels, T)`` ->
    waveform. De-normalize -> NNLS mel inversion -> Griffin-Lim, one jitted
    TPU program end to end (reference: spectograms.py:92-95)."""
    mel_power = mel_ops.log_decompress(log_mel)
    linear = mel_ops.mel_to_linear(mel_power, cfg, nnls_iters)
    return griffin_lim(linear, cfg, n_iter=n_iter, power=2.0, key=key)
