"""Frozen configuration for the lip2speech_tpu framework.

Replaces the reference's scattered ``create_hparams()`` calls
(``/root/reference/hparams.py:1-102``) with one immutable, hashable config
object that is threaded explicitly through every module — required for JAX,
where configs participate in ``jax.jit`` static arguments.

Values mirror the reference defaults so converted checkpoints line up.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """DSP parameters (reference hparams.py:32-38)."""

    sample_rate: int = 16000
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 256
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    # log-compression clip value; log(1e-5) = -11.5129 is also the mel pad
    # value used by the reference collate (datasets/__init__.py:16).
    clip_val: float = 1e-5

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def log_pad_value(self) -> float:
        import math

        return math.log(self.clip_val)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model dimensions (reference hparams.py:46-73 + module constants)."""

    # Video encoder (model/modules/video.py:53-74)
    frontend_channels: int = 24
    shufflenet_width: float = 1.0
    video_feature_dim: int = 768  # ShuffleNetV2 1.0x trunk output (1024-256)
    # Face / speaker embedding (model/modules/vgg_face.py:22-26)
    face_embedding_dim: int = 256
    facenet_embedding_dim: int = 512
    # Encoder = video features + tiled face embedding (model/model.py:36)
    encoder_embedding_dim: int = 1024
    # Decoder (model/modules/decoder.py:274-318)
    n_mels: int = 80
    ffn_hidden_dim: int = 512
    n_decoder_layers: int = 2
    max_decoder_steps: int = 300
    gate_threshold: float = 0.5
    prenet_dropout: float = 0.2
    decoder_rnn_dropout: float = 0.1
    attention_dropout: float = 0.1
    encoder_feature_dropout: float = 0.1
    # Content quantizer (decoder.py:199-237)
    content_vocab_size: int = 501
    content_latent_dim: int = 256
    gumbel_tau: float = 0.1
    # Postnet (hparams.py:71-73)
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5
    postnet_dropout: float = 0.5
    # Positional tables (decoder.py:33,318)
    max_encoder_positions: int = 200
    # Long-horizon AR training stabilizer (no reference counterpart): when
    # > 0, each AR-scan step clips the carry's *gradient* to this L2 norm
    # (layers.clip_grad_norm) so BPTT through the recurrence cannot
    # compound into overflow. Forward semantics unchanged; default off
    # preserves reference-parity gradients.
    scan_grad_clip: float = 0.0
    # Companion stabilizer for the OTHER explosion channel (measured:
    # runs/overfit_r5a — KLD climbing 0.1->4 preceded every 1e8-1e16 grad
    # spike): when > 0, clips the cotangent reaching the content
    # quantizer logits (the tau=0.1 gumbel-softmax scales logits grads by
    # 1/tau through every AR attention read). Forward identical; opt-in.
    content_grad_clip: float = 0.0
    # Discriminator (model/modules/discriminator.py:43-97)
    discriminator_patch: int = 32  # static upper bound of the 7..31 patch
    # Speaker (voice) encoder (model/modules/audio.py:110-129)
    speaker_mel_bins: int = 40
    speaker_lstm_dim: int = 256
    speaker_lstm_layers: int = 3


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Static-shape data pipeline parameters.

    The reference pads dynamically to the batch max (datasets/__init__.py:7-46);
    XLA needs static shapes, so we bucket to fixed sizes. LRW clips are 29
    frames / ~77 mel steps (1.216 s @ 16 kHz), so the defaults cover LRW
    exactly with minimal padding.
    """

    max_video_frames: int = 29
    max_mel_frames: int = 80
    # 79 * 256 hops -> exactly max_mel_frames (=80) STFT frames (center=True)
    max_audio_samples: int = 20224
    mouth_size: Tuple[int, int] = (96, 96)
    face_size: Tuple[int, int] = (160, 160)
    n_face_crops: int = 2
    mel_pad_value: float = -11.5129  # log(1e-5), datasets/__init__.py:16
    # ImageNet mouth normalization (datasets/lrw/dataset.py:83-86)
    mouth_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    mouth_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization (reference hparams.py:77-85, train.py:88-160)."""

    learning_rate: float = 1e-4
    weight_decay: float = 1e-6
    grad_clip: float = 1.0
    batch_size: int = 64
    seed: int = 1234
    max_iters: int = 6_400_000
    eval_interval: int = 2000
    log_interval: int = 50
    tf_ratio_start: float = 0.1
    tf_ratio_step: float = 0.1  # +=0.1 every 10 epochs (train.py:159-160)
    tf_ratio_epochs: int = 10
    postnet_loss_weight: float = 10.0
    # Weight on the content-quantizer KLD-to-uniform term. 1.0 is the
    # reference's (implicit, unweighted) value, train_utils/losses.py:72.
    # Raising it is the pressure-side stabilizer for gumbel posterior
    # collapse: fixture-overfit campaigns (runs/overfit_r5b/r5d) showed
    # memorization sharpens the posterior to exact one-hot (KLD pinned at
    # log 501) over thousands of steps even with the cotangent clips on —
    # an absorbing state that ends learning. The clips bound per-step
    # gradients; this bounds the drift.
    kld_weight: float = 1.0
    # bf16 activations on TPU replace apex AMP O2 (train.py:106-107)
    bf16: bool = True
    # False (default) reproduces the reference exactly: MSE averaged over
    # padded mel frames too (train_utils/losses.py:35-40 has no mask).
    # True restricts mel/postnet MSE to valid frames — correct behavior,
    # opt-in via --override train.masked_loss=True so converted-checkpoint
    # loss values stay comparable to the reference by default.
    masked_loss: bool = False
    # Skip optimizer updates whose gradients contain non-finite values —
    # the TPU-native duty of apex AMP's overflow-skip (reference
    # train.py:188-196). Without it one NaN gradient poisons
    # clip_by_global_norm and corrupts the params permanently (observed
    # in a long bf16 overfit run).
    skip_nonfinite_updates: bool = True
    # Retained for override compatibility; since round 5 the skip wrapper
    # (train_step.skip_if_not_finite) NEVER gives up and applies a
    # non-finite update — optax.apply_if_finite's accept-after-N behavior
    # would NaN params and Adam moments permanently. Persistent stalls are
    # escaped by the training loop's --rewind_on_stall instead.
    max_consecutive_nonfinite: int = 100
    # Reject (skip, exactly like a nonfinite step) any update whose
    # pre-clip global gradient norm exceeds this value. 0 = off
    # (reference parity: torch clip_grad_norm_ rescales huge-but-finite
    # gradients to norm grad_clip and APPLIES them, train.py:187-191).
    # Observed on hardware (runs/overfit_r4d/e): healthy fixture-overfit
    # norms stay <= ~5e3; sporadic spikes of 1e5..5e8 — finite, so
    # apply_if_finite passes them — get clipped to norm 1.0 but keep the
    # garbage *direction*, and a handful of them collapses the content
    # branch irrecoverably (KLD pins at ln(501)). Rejection keeps params
    # and BN stats at last-good instead. Implies apply_if_finite.
    reject_grad_norm_above: float = 0.0
    # WGAN adversarial mode (--override train.adversarial=True): each
    # iteration updates the mel-patch critic (rmsprop + weight clamp) and
    # adds the generator terms (-D(fake) + 10x L1 feature matching) to the
    # model loss — the reference implements this pair
    # (train_utils/losses.py:83-136) but never wires it into train.py; off
    # by default to match.
    adversarial: bool = False
    adversarial_critic_lr: float = 5e-5  # standard WGAN critic rmsprop lr


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for pjit/shard_map.

    The reference is single-GPU (SURVEY.md §2.10); its vestigial
    ``dist_backend='nccl'`` flags map to XLA collectives over ICI here.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 = all remaining devices on the data axis
    data_parallel: int = -1
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def default_config() -> Config:
    return Config()


def config_with_overrides(*overrides: str) -> Config:
    """Build a Config with dotted-path overrides, e.g.
    ``config_with_overrides("train.learning_rate=3e-4", "model.ffn_hidden_dim=256")``.

    The reference's string-parse path was dead code (hparams.py:95-97);
    this is the working equivalent for CLIs and sweeps.
    """
    import ast

    cfg = Config()
    groups: dict[str, dict] = {}
    for ov in overrides:
        path, _, raw = ov.partition("=")
        section, _, field_name = path.partition(".")
        if not field_name or not hasattr(cfg, section):
            raise ValueError(f"bad override {ov!r}")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        groups.setdefault(section, {})[field_name] = value

    kw = {}
    for section, fields in groups.items():
        kw[section] = dataclasses.replace(getattr(cfg, section), **fields)
    return dataclasses.replace(cfg, **kw)
