"""DSP / numeric ops (all jittable, static-shape, TPU-first).

Submodules keep their names as package attributes (``ops.stft``,
``ops.mel``, ``ops.griffin_lim``); only non-colliding convenience names are
re-exported here.
"""

from lip2speech_tpu.ops import stft, mel, griffin_lim  # noqa: F401
from lip2speech_tpu.ops.stft import hann_window, istft, spectrogram, frame_signal  # noqa: F401
from lip2speech_tpu.ops.mel import (  # noqa: F401
    mel_filterbank,
    melspectrogram,
    log_compress,
    log_decompress,
    mel_to_linear,
)
from lip2speech_tpu.ops.griffin_lim import mel_to_audio  # noqa: F401
