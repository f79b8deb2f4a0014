"""Golden tests for DSP ops against independent torch/numpy references.

torchaudio is not installed, so the goldens re-derive its semantics from
``torch.stft`` (the exact kernel torchaudio wraps) plus a numpy HTK mel
filterbank implemented straight from the definition. This keeps the golden
path independent of the JAX implementation under test.
"""

import numpy as np
import torch

from lip2speech_tpu.config import AudioConfig
from lip2speech_tpu.ops import griffin_lim as gl_ops
from lip2speech_tpu.ops import mel as mel_ops
from lip2speech_tpu.ops import stft as stft_ops

import jax
import jax.numpy as jnp

CFG = AudioConfig()


def _torch_stft(x: np.ndarray) -> np.ndarray:
    xt = torch.from_numpy(x.astype(np.float32))
    spec = torch.stft(
        xt,
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        window=torch.hann_window(CFG.win_length, periodic=True),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec.numpy()


def _rand_wav(n=19456, batch=()):
    rng = np.random.RandomState(0)
    return rng.randn(*batch, n).astype(np.float32) * 0.1


def test_hann_window_matches_torch():
    ours = np.asarray(stft_ops.hann_window(1024))
    theirs = torch.hann_window(1024, periodic=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_matches_torch():
    x = _rand_wav()
    ours = np.asarray(stft_ops.stft(jnp.asarray(x)))
    theirs = _torch_stft(x)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours.real, theirs.real, atol=2e-3)
    np.testing.assert_allclose(ours.imag, theirs.imag, atol=2e-3)


def test_stft_matmul_matches_fft():
    x = _rand_wav(batch=(2,))
    re, im = stft_ops.stft_matmul(jnp.asarray(x))
    ref = np.asarray(stft_ops.stft(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-2)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-2)


def test_istft_roundtrip():
    x = _rand_wav()
    spec = stft_ops.stft(jnp.asarray(x))
    y = np.asarray(stft_ops.istft(spec, length=x.shape[-1]))
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_istft_matches_torch():
    x = _rand_wav()
    spec = _torch_stft(x)
    theirs = torch.istft(
        torch.from_numpy(spec),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        window=torch.hann_window(CFG.win_length, periodic=True),
        center=True,
        length=x.shape[-1],
    ).numpy()
    ours = np.asarray(stft_ops.istft(jnp.asarray(spec), length=x.shape[-1]))
    np.testing.assert_allclose(ours, theirs, atol=1e-3)


def _numpy_htk_fbank():
    """Independent HTK filterbank from the definition."""
    n_freqs, n_mels = CFG.n_freqs, CFG.n_mels
    freqs = np.linspace(0, CFG.sample_rate / 2, n_freqs)
    mel = lambda f: 2595.0 * np.log10(1 + f / 700.0)
    imel = lambda m: 700.0 * (10 ** (m / 2595.0) - 1)
    pts = imel(np.linspace(mel(CFG.fmin), mel(CFG.fmax), n_mels + 2))
    fb = np.zeros((n_freqs, n_mels))
    for j in range(n_mels):
        lo, ctr, hi = pts[j], pts[j + 1], pts[j + 2]
        up = (freqs - lo) / (ctr - lo)
        down = (hi - freqs) / (hi - ctr)
        fb[:, j] = np.maximum(0, np.minimum(up, down))
    return fb.astype(np.float32)


def test_mel_filterbank_matches_numpy_reference():
    ours = mel_ops.mel_filterbank(
        CFG.n_freqs, CFG.n_mels, CFG.sample_rate, CFG.fmin, CFG.fmax
    )
    np.testing.assert_allclose(ours, _numpy_htk_fbank(), atol=1e-5)


def test_melspectrogram_matches_torch_pipeline():
    x = _rand_wav()
    spec = np.abs(_torch_stft(x)) ** 2
    golden = np.log(np.maximum(_numpy_htk_fbank().T @ spec, 1e-5))
    ours = np.asarray(mel_ops.melspectrogram(jnp.asarray(x), CFG))
    assert ours.shape == golden.shape == (80, 77)
    np.testing.assert_allclose(ours, golden, atol=5e-3)


def test_mel_to_linear_reconstruction():
    x = _rand_wav()
    spec = np.asarray(stft_ops.spectrogram(jnp.asarray(x)))
    fb = mel_ops.mel_filterbank(
        CFG.n_freqs, CFG.n_mels, CFG.sample_rate, CFG.fmin, CFG.fmax
    )
    mel_power = jnp.einsum("ft,fm->mt", jnp.asarray(spec), jnp.asarray(fb))
    recon = np.asarray(mel_ops.mel_to_linear(mel_power, CFG, n_nnls_iters=32))
    # Re-project: fb^T @ recon should match the mel almost exactly.
    remel = fb.T @ recon
    err = np.abs(remel - np.asarray(mel_power)).mean() / (
        np.abs(np.asarray(mel_power)).mean() + 1e-9
    )
    assert err < 0.02, err


def test_griffin_lim_reconstructs_audio():
    # A clean tone must round-trip through mel->linear->griffin_lim with high
    # spectral fidelity (the parity anchor for the evaluation path).
    sr = CFG.sample_rate
    t = np.arange(19456) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 880 * t)).astype(
        np.float32
    )
    log_mel = mel_ops.melspectrogram(jnp.asarray(x), CFG)
    wav = np.asarray(
        gl_ops.mel_to_audio(log_mel, jax.random.PRNGKey(0), CFG, n_iter=64)
    )
    assert wav.shape[-1] >= 19000
    # Compare log-mel of reconstruction vs original on valid frames.
    mel2 = np.asarray(mel_ops.melspectrogram(jnp.asarray(wav[: x.shape[-1]]), CFG))
    m1 = np.asarray(log_mel)[:, 2:70]
    m2 = mel2[:, 2:70]
    corr = np.corrcoef(m1.ravel(), m2.ravel())[0, 1]
    assert corr > 0.95, corr


def test_ops_are_jittable_and_batched():
    x = jnp.asarray(_rand_wav(batch=(3,)))
    fn = jax.jit(lambda w: mel_ops.melspectrogram(w, CFG))
    out = fn(x)
    assert out.shape == (3, 80, 77)
    assert np.isfinite(np.asarray(out)).all()


def test_istft_matmul_matches_istft():
    x = _rand_wav()
    spec = stft_ops.stft(jnp.asarray(x))
    re, im = jnp.real(spec), jnp.imag(spec)
    a = np.asarray(stft_ops.istft_matmul(re, im, length=x.shape[-1]))
    b = np.asarray(stft_ops.istft(spec, length=x.shape[-1]))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_speaker_mel_matches_torch_pipeline():
    """The voice-encoder front end (n_fft 400 / hop 160 / 40 mels,
    audio.py:124) must match the torch stft + HTK fbank convention too."""
    from lip2speech_tpu.models.speaker import SPEAKER_AUDIO_CFG
    from lip2speech_tpu.ops.mel import melspectrogram, mel_filterbank

    cfg = SPEAKER_AUDIO_CFG
    x = _rand_wav(16000)
    xt = torch.from_numpy(x)
    spec = torch.stft(
        xt, n_fft=cfg.n_fft, hop_length=cfg.hop_length, win_length=cfg.win_length,
        window=torch.hann_window(cfg.win_length, periodic=True),
        center=True, pad_mode="reflect", onesided=True, return_complex=True,
    ).numpy()
    power = np.abs(spec) ** 2
    fb = mel_filterbank(cfg.n_freqs, cfg.n_mels, cfg.sample_rate, cfg.fmin, cfg.fmax)
    golden = fb.T @ power
    ours = np.asarray(melspectrogram(jnp.asarray(x), cfg, log=False))
    assert ours.shape == golden.shape == (40, 101)
    np.testing.assert_allclose(ours, golden, atol=5e-3, rtol=1e-3)
