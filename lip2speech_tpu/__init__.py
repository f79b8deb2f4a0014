"""lip2speech_tpu — a TPU-native (JAX/XLA/Pallas/pjit) lip-to-speech framework.

Re-design of the capabilities of Chris10M/Lip2Speech (silent talking-face
video -> mel spectrogram -> waveform) for TPU hardware: functional models,
one jitted train step over a device mesh, on-device DSP (mel extraction,
Griffin-Lim inversion, ESTOI), and static-shape data pipelines.
"""

from lip2speech_tpu.config import Config, default_config

__version__ = "0.1.0"
