"""Numerical parity against the ACTUAL reference torch modules.

The reference's VideoExtractor and Decoder import only torch + hparams, so
we can instantiate them (read-only, /root/reference on sys.path), export
their randomly-initialized state dicts, convert through our checkpoint
converter, and require our flax modules to reproduce their outputs on the
same inputs. This validates the converter's layout/semantics end to end —
the real guarantee that released reference checkpoints load correctly.

Stochasticity control: eval mode kills dropout; tf_ratio=1 disables
teacher forcing by the reference's own rule; the Content codebook's
gumbel sampling is neutralized by zeroing ``word_embeddings`` (its value
contribution becomes 0 on both sides) so the mel path is deterministic.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")), reason="reference absent"
)


def _import_ref():
    import importlib

    for p in (REF, os.path.join(REF, "model", "modules")):
        if p not in sys.path:
            sys.path.insert(0, p)
    video_mod = importlib.import_module("video")
    decoder_mod = importlib.import_module("decoder")
    return video_mod, decoder_mod


def test_video_extractor_matches_reference():
    import torch

    video_mod, _ = _import_ref()
    torch.manual_seed(0)
    ref = video_mod.VideoExtractor().eval()

    sd = {f"encoder.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}

    from lip2speech_tpu.config import ModelConfig
    from lip2speech_tpu.models import VideoExtractor
    from lip2speech_tpu.train import checkpoint as ckpt

    converted = ckpt.torch_to_flax(sd, ModelConfig(), strict=False)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 7, 96, 96).astype(np.float32)  # (B, C, T, H, W)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (B, T, 768)

    ours = VideoExtractor()
    got = ours.apply(
        {
            "params": converted["params"]["encoder"],
            "batch_stats": converted["batch_stats"]["encoder"],
        },
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),  # NHWC
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_decoder_matches_reference():
    import torch

    _, decoder_mod = _import_ref()
    torch.manual_seed(0)
    ref = decoder_mod.Decoder().eval()
    # neutralize the gumbel-sampled content VALUE path on both sides
    with torch.no_grad():
        ref.content.word_embeddings.zero_()

    sd = {f"decoder.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}

    from lip2speech_tpu.config import ModelConfig
    from lip2speech_tpu.models import Decoder
    from lip2speech_tpu.train import checkpoint as ckpt

    cfg = ModelConfig()
    converted = ckpt.torch_to_flax(sd, cfg, strict=False)

    B, T, M = 2, 12, 20
    rng = np.random.RandomState(1)
    visual = rng.randn(B, T, cfg.encoder_embedding_dim).astype(np.float32) * 0.5
    face = rng.randn(B, 256).astype(np.float32) * 0.5
    mels = rng.randn(B, 80, M).astype(np.float32) - 5.0

    with torch.no_grad():
        face_tiled = torch.from_numpy(face)[:, None, :].repeat(1, T, 1)
        out_ref = ref(
            torch.from_numpy(visual),
            face_tiled,
            torch.from_numpy(mels),
            torch.full((B,), T, dtype=torch.long),
            torch.full((B,), M, dtype=torch.long),
            1.0,  # tf_ratio=1 -> reference never consumes teacher frames
        )
    want_mel, want_post, want_stop = (
        out_ref[0].numpy(),
        out_ref[1].numpy(),
        out_ref[2].numpy(),
    )

    ours = Decoder(cfg)
    variables = {
        "params": converted["params"]["decoder"],
        "batch_stats": converted["batch_stats"]["decoder"],
    }
    got = ours.apply(
        variables,
        jnp.asarray(visual),
        jnp.asarray(face),
        jnp.asarray(mels),
        1.0,
        {"gumbel": jax.random.PRNGKey(0),
         "teacher": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        train=False,
    )

    np.testing.assert_allclose(
        np.asarray(got["mel"]), want_mel, atol=5e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(got["mel_postnet"]), want_post, atol=5e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(got["gate"]), want_stop, atol=5e-3, rtol=1e-2
    )


def test_lstm_layer_matches_torch():
    """Generic LSTM parity incl. the two-bias fold and bidirectional
    ordering — the convention every converted checkpoint relies on."""
    import torch

    torch.manual_seed(3)
    B, T, I, H = 3, 11, 24, 32
    for layers, bidir in ((1, False), (3, False), (1, True), (2, True)):
        ref = torch.nn.LSTM(I, H, layers, bidirectional=bidir, batch_first=True).eval()

        from lip2speech_tpu.models.layers import LSTM

        params = {}
        d = 2 if bidir else 1
        for l in range(layers):
            for di, suff in enumerate(("", "_reverse") if bidir else ("",)):
                name = f"l{l}_{'bwd' if suff else 'fwd'}"
                params[name] = {
                    "wx": getattr(ref, f"weight_ih_l{l}{suff}").detach().numpy().T,
                    "wh": getattr(ref, f"weight_hh_l{l}{suff}").detach().numpy().T,
                    "b": (
                        getattr(ref, f"bias_ih_l{l}{suff}")
                        + getattr(ref, f"bias_hh_l{l}{suff}")
                    ).detach().numpy(),
                }

        x = np.random.RandomState(0).randn(B, T, I).astype(np.float32)
        with torch.no_grad():
            want, (want_h, want_c) = ref(torch.from_numpy(x))

        ours = LSTM(H, num_layers=layers, bidirectional=bidir)
        got, (got_h, got_c) = ours.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got_h), want_h.numpy(), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(), atol=2e-5, rtol=1e-4)


def test_contrastive_loss_matches_reference():
    import importlib

    import torch

    sys.path.insert(0, os.path.join(REF, "speaker_encoder"))
    # the reference file imports torchvision (absent here) only for its
    # unused VGG perceptual loss; stub it to import the module
    import types

    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    try:
        ref_losses = importlib.import_module("losses")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference speaker losses unimportable: {e}")

    torch.manual_seed(0)
    crit = ref_losses.MiniBatchConstrastiveLoss(t=7.0)
    rng = np.random.RandomState(0)
    speech = rng.randn(8, 256).astype(np.float32)
    face = rng.randn(8, 256).astype(np.float32)
    want = crit([torch.from_numpy(speech), torch.from_numpy(face)])

    from lip2speech_tpu.speaker import contrastive_loss

    got = contrastive_loss(jnp.asarray(speech), jnp.asarray(face), jnp.float32(7.0))
    np.testing.assert_allclose(
        float(got["c_loss"]), float(want["c_loss"]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(got["l2_loss"]), float(want["l2_loss"]), atol=1e-5, rtol=1e-4
    )
