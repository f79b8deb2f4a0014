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
    compute_dtype=None,
) -> jnp.ndarray:
    """Reconstruct a waveform from a power/magnitude spectrogram.

    Complex-free implementation: phases live as (cos, sin) pairs and every
    STFT/ISTFT is a real DFT matmul on the MXU (XLA's TPU FFT lowering is
    far slower than the systolic array for n_fft=1024). Same momentum
    update rule as torchaudio GriffinLim.

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
        theta = jax.random.uniform(
            key, magnitude.shape, minval=-jnp.pi, maxval=jnp.pi
        )
        ang_re, ang_im = jnp.cos(theta), jnp.sin(theta)
    else:
        ang_re = jnp.ones_like(magnitude)
        ang_im = jnp.zeros_like(magnitude)

    t_frames = magnitude.shape[-1]
    # ISTFT(center=True) of T frames yields (T-1)*hop samples.
    n_samples = (t_frames - 1) * cfg.hop_length
    mom = momentum / (1.0 + momentum)

    def body(_, carry):
        ang_re, ang_im, tp_re, tp_im = carry
        inverse = stft_ops.istft_matmul(
            magnitude * ang_re,
            magnitude * ang_im,
            cfg.n_fft,
            cfg.hop_length,
            cfg.win_length,
            window,
            length=n_samples,
            compute_dtype=compute_dtype,
        )
        rb_re, rb_im = stft_ops.stft_matmul(
            inverse, cfg.n_fft, cfg.hop_length, cfg.win_length, window,
            compute_dtype=compute_dtype,
        )
        rb_re = rb_re[..., :t_frames]
        rb_im = rb_im[..., :t_frames]
        new_re = rb_re - tp_re * mom
        new_im = rb_im - tp_im * mom
        norm = jnp.maximum(jnp.sqrt(new_re**2 + new_im**2), 1e-16)
        return new_re / norm, new_im / norm, rb_re, rb_im

    z = jnp.zeros_like(magnitude)
    ang_re, ang_im, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (ang_re, ang_im, z, z)
    )
    wav = stft_ops.istft_matmul(
        magnitude * ang_re,
        magnitude * ang_im,
        cfg.n_fft,
        cfg.hop_length,
        cfg.win_length,
        window,
        length=n_samples,
    )
    if length is not None:
        wav = wav[..., :length]
    return wav


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_iter", "nnls_iters", "compute_dtype")
)
def mel_to_audio(
    log_mel: jnp.ndarray,
    key: jax.Array,
    cfg: AudioConfig = AudioConfig(),
    n_iter: int = 256,
    nnls_iters: int = 16,
    compute_dtype=None,
) -> jnp.ndarray:
    """Full ``MelSpec2Audio`` equivalent: log-mel ``(..., n_mels, T)`` ->
    waveform. De-normalize -> NNLS mel inversion -> Griffin-Lim, one jitted
    TPU program end to end (reference: spectograms.py:92-95).
    ``compute_dtype=bfloat16`` runs the GL DFT matmuls at the bf16 MXU rate
    (quality measured in tools/sweep_gl_quality.py; see README)."""
    mel_power = mel_ops.log_decompress(log_mel)
    linear = mel_ops.mel_to_linear(mel_power, cfg, nnls_iters)
    return griffin_lim(
        linear, cfg, n_iter=n_iter, power=2.0, key=key,
        compute_dtype=compute_dtype,
    )
