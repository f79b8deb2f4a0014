"""Long-video synthesis by chunking (the reference paper's inference
setting, Report.pdf §4.2: split the silent video into fixed windows,
decode each window, concatenate the predicted mels, and run Griffin-Lim
ONCE over the concatenation so chunk boundaries share a consistent
phase).

The reference repo itself only handles ~1 s clips; this module is the
TPU-native implementation of the paper's recipe: chunks are BATCHED into
one jitted decode (the AR loop is batch-flat, so a 60 s video costs
roughly one chunk's latency plus the final inversion), per-chunk speech
length comes from the gate (first crossing), and the host assembles the
variable-length mel segments before a single `mel_to_audio` call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.config import Config
from lip2speech_tpu.ops import griffin_lim as gl_ops


def chunk_video(video: np.ndarray, chunk_frames: int) -> tuple[np.ndarray, int]:
    """(T, H, W, 3) -> (n_chunks, chunk_frames, H, W, 3); the tail chunk is
    edge-padded to the static window (its mel tail is dropped again after
    decoding, pro-rata). Returns (chunks, n_valid_tail_frames)."""
    t = video.shape[0]
    n_chunks = max(1, -(-t // chunk_frames))
    pad = n_chunks * chunk_frames - t
    if pad:
        video = np.concatenate([video, np.repeat(video[-1:], pad, axis=0)])
    tail_valid = chunk_frames - pad
    return video.reshape(n_chunks, chunk_frames, *video.shape[1:]), tail_valid


def chunk_mel_counts(
    n_chunks: int, chunk_frames: int, tail_valid: int, sample_rate: int,
    hop_length: int, fps: float = 25.0,
) -> list[int]:
    """Per-chunk mel frame counts from ROUNDED CUMULATIVE boundaries.

    A 29-frame window at 25 fps / hop 256 @ 16 kHz is exactly 72.5 mel
    frames; rounding each chunk independently (72) would shorten the audio
    ~0.7% and drift ~0.4 s over a 60 s video. Cumulative rounding
    (m_i = round((i+1)*rate) - round(i*rate)) keeps the running total
    within half a frame of exact at every boundary.
    """
    rate = chunk_frames * sample_rate / fps / hop_length
    frame_rate = sample_rate / fps / hop_length
    total_exact = ((n_chunks - 1) * chunk_frames + tail_valid) * frame_rate
    counts = []
    for i in range(n_chunks):
        end = (i + 1) * rate if i < n_chunks - 1 else total_exact
        counts.append(max(1, int(round(end)) - int(round(i * rate))))
    return counts


def synthesize_long_video(
    model,
    variables,
    video: np.ndarray,  # (T, H, W, 3) normalized mouth frames, any T
    faces: np.ndarray,  # (n_crops, Hf, Wf, 3) identity crops
    cfg: Config,
    key: jax.Array,
    n_gl_iters: int = 32,
    speaker_embedding: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Synthesize a waveform for a video of arbitrary length.

    Returns (waveform, mel): the assembled log-mel (n_mels, M_total) and
    its single-pass Griffin-Lim inversion.
    """
    chunk_frames = cfg.data.max_video_frames
    chunks, tail_valid = chunk_video(np.asarray(video), chunk_frames)
    n = chunks.shape[0]
    faces_b = jnp.tile(jnp.asarray(faces)[None], (n, 1, 1, 1, 1))
    spk = (
        jnp.tile(jnp.asarray(speaker_embedding)[None], (n, 1))
        if speaker_embedding is not None
        else None
    )

    @jax.jit
    def decode(vars_, video_b, faces_b, spk):
        out = model.apply(
            vars_, video_b, faces_b, None, 1.0, spk,
            {"gumbel": jax.random.PRNGKey(0)}, train=False,
        )
        return out["mel_postnet"].astype(jnp.float32)

    mels = np.asarray(decode(variables, jnp.asarray(chunks), faces_b, spk))

    # Fixed-rate assembly keeps audio/video time alignment: each window
    # contributes its pro-rata mel frames (25 fps video, hop 256 @ 16 kHz
    # -> 2.5 mel frames per video frame), exactly the paper's
    # fixed-window concatenation; gate-based early stop is a single-clip
    # demo concern, not a chunking one. See chunk_mel_counts for why the
    # per-chunk counts use cumulative rounding.
    counts = chunk_mel_counts(
        n, chunk_frames, tail_valid, cfg.audio.sample_rate,
        cfg.audio.hop_length,
    )
    segs = [mels[i, :, :m] for i, m in enumerate(counts)]
    mel_cat = np.concatenate(segs, axis=1)  # (n_mels, M_total)

    wav = gl_ops.mel_to_audio(
        jnp.asarray(mel_cat)[None], key, cfg.audio, n_iter=n_gl_iters,
        compute_dtype=jnp.bfloat16,
    )
    return np.asarray(wav)[0], mel_cat
