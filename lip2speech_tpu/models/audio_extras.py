"""Auxiliary audio encoders kept for capability parity.

The reference ships two modules that no entry point uses
(``/root/reference/model/modules/audio.py``, SURVEY.md §2.5):

* ``AudioExtractor`` (audio.py:19-55) — a fairseq wav2vec feature
  extractor + identity projection. fairseq and the wav2vec checkpoint are
  unavailable here; :class:`Wav2VecFeatureExtractor` rebuilds the wav2vec
  *feature-encoder* conv stack (the part the reference actually calls) in
  flax so converted weights drop in when present.
* ``SpecEncoder`` (audio.py:58-107) — a Conv1d pyramid projecting a linear
  spectrogram to a 512-d embedding. The reference version contains a
  latent crash (bare ``ReLU`` name, audio.py:99) proving it never ran;
  rebuilt here in working form.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lip2speech_tpu.models.layers import batch_norm

# wav2vec-large feature encoder: (kernel, stride, dim) per conv layer
WAV2VEC_CONV_LAYERS = [(10, 5, 512), (8, 4, 512), (4, 2, 512), (4, 2, 512), (4, 2, 512)]


class Wav2VecFeatureExtractor(nn.Module):
    """(B, n_samples) -> (B, T', 512) conv features (wav2vec stack)."""

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = wav[..., None]  # (B, S, 1)
        for i, (k, s, d) in enumerate(WAV2VEC_CONV_LAYERS):
            x = nn.Conv(d, (k,), strides=(s,), padding="VALID", name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=1, name=f"gn_{i}")(x) if i == 0 else x
            x = nn.gelu(x)
        return x


class AudioExtractor(nn.Module):
    """wav2vec features + identity projection (audio.py:19-55)."""

    @nn.compact
    def __call__(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = Wav2VecFeatureExtractor(name="wav2vec")(wav, train)
        return nn.Dense(512, name="projection")(feats)


class SpecEncoder(nn.Module):
    """(B, n_freqs, T) linear spectrogram -> (B, 512) embedding
    (audio.py:58-107, with the dead-code activation bug fixed)."""

    @nn.compact
    def __call__(self, spec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.swapaxes(spec, 1, 2)  # (B, T, F)
        for i, ch in enumerate((64, 128, 256, 512)):
            x = nn.Conv(ch, (3,), strides=(2,), padding=[(1, 1)], name=f"conv_{i}")(x)
            x = batch_norm(train, name=f"bn_{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=1)
        return nn.Dense(512, name="fc")(x)
