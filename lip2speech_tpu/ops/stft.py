"""STFT / ISTFT primitives, TPU-native.

Replaces the torchaudio C++ kernels used by the reference
(``/root/reference/datasets/spectograms.py:42-95``). Everything here is pure
``jax.numpy``: jittable, batchable, differentiable, and static-shape.

Conventions match ``torch.stft`` defaults used by torchaudio transforms:
center=True with reflect padding, periodic Hann window, no normalization,
onesided. Spectrogram layout is ``(..., n_freqs, n_frames)``.

Two STFT paths:
  * ``stft`` — framing + ``jnp.fft.rfft`` (XLA FFT).
  * ``stft_matmul`` — framed signal times a real DFT matrix; this maps the
    whole transform onto the MXU and is the fast path for short n_fft on TPU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches ``torch.hann_window(periodic=True)``)."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return jnp.asarray(w, dtype=dtype)


def _pad_window(window: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    win_length = window.shape[0]
    if win_length == n_fft:
        return window
    left = (n_fft - win_length) // 2
    return jnp.pad(window, (left, n_fft - win_length - left))


def frame_signal(
    x: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True
) -> jnp.ndarray:
    """Slice ``x (..., n_samples)`` into overlapping frames ``(..., T, n_fft)``."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
            mode="reflect",
        )
    n_samples = x.shape[-1]
    t = (n_samples - n_fft) // hop_length + 1
    span = (t - 1) * hop_length + n_fft  # samples actually framed
    if n_fft % hop_length == 0:
        # hop | n_fft (our 1024/256 case): framing is a reshape into hop-
        # sized rows plus k shifted slices — no generalized gather in the
        # Griffin-Lim inner loop, just views the VPU streams through.
        k = n_fft // hop_length
        c = x[..., :span].reshape(*x.shape[:-1], t + k - 1, hop_length)
        return jnp.concatenate([c[..., i : i + t, :] for i in range(k)], axis=-1)
    # Generic path: static index matrix (XLA lowers to a strided gather).
    idx = np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT of ``x (..., n_samples)`` -> ``(..., n_freqs, T)``."""
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, x.dtype)
    window = _pad_window(window, n_fft)
    frames = frame_signal(x, n_fft, hop_length, center) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases, shape (n_fft, n_freqs)."""
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _flat_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``x (..., K) @ w (K, N)`` with the leading dims flattened into M.

    A batched matmul with M = n_frames (~81) per batch element under-fills
    the 128-row MXU tile; collapsing (batch, frames) into one M dimension
    turns the whole DFT into a single large GEMM.
    """
    lead = x.shape[:-1]
    out = jnp.matmul(
        x.reshape(-1, x.shape[-1]), w, preferred_element_type=jnp.float32
    )
    return out.reshape(*lead, w.shape[-1])


def stft_matmul(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    compute_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MXU-path STFT: returns (real, imag), each ``(..., n_freqs, T)``.

    The (n_fft x n_freqs) DFT matmul runs on the systolic array; for the
    80-mel pipeline the mel projection fuses right behind it.
    ``compute_dtype=bfloat16`` runs the matmul inputs at the MXU's 2x bf16
    rate with f32 accumulation (outputs stay f32).
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, x.dtype)
    window = _pad_window(window, n_fft)
    frames = frame_signal(x, n_fft, hop_length, center) * window
    cos, sin = _dft_matrices(n_fft)
    # one GEMM producing [re | im] (N = 2*n_freqs) instead of two
    cs = jnp.asarray(np.concatenate([cos, sin], axis=1))
    if compute_dtype is not None:
        frames = frames.astype(compute_dtype)
        cs = cs.astype(compute_dtype)
    n_freqs = n_fft // 2 + 1
    both = _flat_matmul(frames, cs)
    re, im = both[..., :n_freqs], both[..., n_freqs:]
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def spectrogram(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    power: float = 2.0,
    center: bool = True,
) -> jnp.ndarray:
    """Power (or magnitude) spectrogram, ``(..., n_freqs, T)``."""
    re, im = stft_matmul(x, n_fft, hop_length, win_length, center=center)
    p = re * re + im * im
    if power == 2.0:
        return p
    if power == 1.0:
        return jnp.sqrt(jnp.maximum(p, 1e-30))
    return jnp.power(jnp.maximum(p, 1e-30), power / 2.0)


def _overlap_add(frames: jnp.ndarray, hop_length: int, n_fft: int) -> jnp.ndarray:
    """Overlap-add ``(..., T, n_fft)`` -> ``(..., (T-1)*hop + n_fft)``.

    When ``n_fft % hop == 0`` (our 1024/256 case) OLA decomposes into
    ``n_fft // hop`` shifted adds of reshaped chunks — no scatter, pure
    vector adds, so it vectorizes cleanly on the VPU.
    """
    *batch, t, _ = frames.shape
    out_len = (t - 1) * hop_length + n_fft
    if n_fft % hop_length == 0:
        k = n_fft // hop_length
        # (..., T, k, hop): piece j of frame i lands at offset (i + j) * hop.
        chunks = frames.reshape(*batch, t, k, hop_length)
        out = jnp.zeros((*batch, t + k - 1, hop_length), frames.dtype)
        for j in range(k):
            out = out.at[..., j : j + t, :].add(chunks[..., :, j, :])
        return out.reshape(*batch, (t + k - 1) * hop_length)[..., :out_len]
    # Generic scatter path.
    idx = np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]
    out = jnp.zeros((*batch, out_len), frames.dtype)
    return out.at[..., idx.reshape(-1)].add(frames.reshape(*batch, -1))


@functools.lru_cache(maxsize=8)
def _idft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT bases, (n_freqs, n_fft): time = re @ C + im @ S."""
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_freqs)[:, None]
    t = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * t / n_fft
    w = np.full((n_freqs, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    c = (w * np.cos(ang) / n_fft).astype(np.float32)
    s = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return c, s


def istft_matmul(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    length: int | None = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """MXU-path inverse STFT on (real, imag) pairs ``(..., n_freqs, T)``.

    Keeps the whole Griffin-Lim loop complex-free and on the systolic
    array (TPU FFT lowering is slow; two (T x n_freqs)(n_freqs x n_fft)
    matmuls per frame batch are not). ``compute_dtype=bfloat16`` runs the
    matmuls at the bf16 MXU rate with f32 accumulation.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, jnp.float32)
    window = _pad_window(window, n_fft)

    c, s = _idft_matrices(n_fft)
    # one GEMM: [re | im] (K = 2*n_freqs) @ [[C],[S]] instead of two
    cs = jnp.asarray(np.concatenate([c, s], axis=0))
    re_t = jnp.swapaxes(re, -1, -2)  # (..., T, n_freqs)
    im_t = jnp.swapaxes(im, -1, -2)
    both = jnp.concatenate([re_t, im_t], axis=-1)
    if compute_dtype is not None:
        both = both.astype(compute_dtype)
        cs = cs.astype(compute_dtype)
    frames = _flat_matmul(both, cs)
    frames = frames * window
    y = _overlap_add(frames, hop_length, n_fft)

    t = re.shape[-1]
    wsq = jnp.tile(window * window, (t, 1))
    norm = _overlap_add(wsq, hop_length, n_fft)
    y = y / jnp.maximum(norm, 1e-11)

    if center:
        pad = n_fft // 2
        y = y[..., pad:]
        if length is None:
            y = y[..., : y.shape[-1] - pad]
    if length is not None:
        y = y[..., :length]
    return y


def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT of complex ``(..., n_freqs, T)`` with window-square OLA
    normalization (matches ``torch.istft`` semantics)."""
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, jnp.float32)
    window = _pad_window(window, n_fft)

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window
    y = _overlap_add(frames, hop_length, n_fft)

    t = spec.shape[-1]
    wsq = jnp.tile(window * window, (t, 1))
    norm = _overlap_add(wsq, hop_length, n_fft)
    y = y / jnp.maximum(norm, 1e-11)

    if center:
        pad = n_fft // 2
        y = y[..., pad:]
        if length is None:
            y = y[..., : y.shape[-1] - pad]
    if length is not None:
        y = y[..., :length]
    return y
