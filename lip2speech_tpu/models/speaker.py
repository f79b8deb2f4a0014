"""GE2E-style voice speaker encoder (flax).

TPU-native rebuild of ``/root/reference/model/modules/audio.py:110-150``:
MelSpectrogram(n_fft 400, hop 160, 40 mels) -> 3-layer LSTM(40 -> 256) ->
Linear(256 -> 256); ``inference`` = relu + L2-norm. The reference loads
frozen Real-Time-Voice-Cloning weights; here weights come from the
checkpoint converter and the train step simply never updates them.
"""

from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from lip2speech_tpu.config import AudioConfig, ModelConfig
from lip2speech_tpu.ops import mel as mel_ops
from lip2speech_tpu.models.layers import LSTM


SPEAKER_AUDIO_CFG = AudioConfig(
    sample_rate=16000, n_fft=400, win_length=400, hop_length=160, n_mels=40,
    fmin=0.0, fmax=8000.0,
)


class SpeakerEncoder(nn.Module):
    """(B, n_samples) waveform -> (B, 256) voice embedding."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        # torchaudio MelSpectrogram(400/160/40) with default fmax=sr/2
        # (audio.py:124, encoded in SPEAKER_AUDIO_CFG); power mel, NO log
        # compression in the reference.
        mels = mel_ops.melspectrogram(waveform, SPEAKER_AUDIO_CFG, log=False)
        mels = jnp.swapaxes(mels, 1, 2)  # (B, T, 40)

        out, (hidden, _) = LSTM(
            self.cfg.speaker_lstm_dim,
            num_layers=self.cfg.speaker_lstm_layers,
            name="lstm",
        )(mels)
        # embedding from the last layer's final hidden state (audio.py:138)
        return nn.Dense(self.cfg.speaker_lstm_dim, name="linear")(hidden[-1])

    def inference(self, waveform: jnp.ndarray) -> jnp.ndarray:
        emb = nn.relu(self(waveform))
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb / jnp.maximum(norm, 1e-12)
