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


@pytest.mark.slow
def test_full_inference_300_steps_matches_reference():
    """VERDICT r2 item 4: FREE-RUNNING parity over the full inference
    horizon — encoder + decoder end to end (the reference Lip2Speech
    minus its facenet, wired exactly as model/model.py:43-58 with an
    injected speaker embedding), all ``max_decoder_steps``=300 AR steps
    on converted random weights. The strongest offline substitute for
    checkpoint parity while the released .pth is not downloadable.

    Asserts the mel trajectory within a measured tolerance and the
    first-gate-crossing lengths within one step (the divergence numbers
    are recorded in PARITY.md)."""
    import torch

    video_mod, decoder_mod = _import_ref()
    torch.manual_seed(0)
    ref_enc = video_mod.VideoExtractor().eval()
    ref_dec = decoder_mod.Decoder().eval()
    with torch.no_grad():
        ref_dec.content.word_embeddings.zero_()  # neutralize gumbel VALUE path
        # bias the stop token negative so the first gate>0.5 crossing
        # happens mid-trajectory (a per-row data-dependent index) instead
        # of at step 1 — a real test of the free-running stop tracking
        ref_dec.stop_token_layer.linear_layer.bias.fill_(-0.05)

    sd = {f"encoder.{k}": v.detach().numpy() for k, v in ref_enc.state_dict().items()}
    sd.update(
        {f"decoder.{k}": v.detach().numpy() for k, v in ref_dec.state_dict().items()}
    )

    from lip2speech_tpu.config import ModelConfig
    from lip2speech_tpu.models import Decoder, VideoExtractor
    from lip2speech_tpu.train import checkpoint as ckpt

    cfg = ModelConfig()
    assert cfg.max_decoder_steps == 300  # the reference horizon
    converted = ckpt.torch_to_flax(sd, cfg, strict=False)

    B, T = 2, 29  # full LRW clip length
    rng = np.random.RandomState(0)
    video = rng.randn(B, 3, T, 96, 96).astype(np.float32) * 0.3
    speaker = rng.randn(B, 256).astype(np.float32)
    speaker /= np.linalg.norm(speaker, axis=-1, keepdims=True)

    # ---- reference free-run (model.py:43-58 wiring, facenet replaced by
    # the injected embedding; decoder.inference runs the fixed 300 steps
    # recording the first gate>0.5 per row, decoder.py:412-435)
    with torch.no_grad():
        feats = ref_enc(torch.from_numpy(video))  # (B, T, 768)
        face_tiled = torch.from_numpy(speaker)[:, None, :].repeat(1, feats.shape[1], 1)
        visual = torch.cat([feats, face_tiled], dim=2)
        # inference returns (postnet-added mel (B, 80, 300), first-gate
        # crossing lengths) — decoder.py:437-443
        want_post, want_len = (o.numpy() for o in ref_dec.inference(visual, face_tiled))

    # ---- ours: the same composition via the flax modules
    enc_vars = {
        "params": converted["params"]["encoder"],
        "batch_stats": converted["batch_stats"]["encoder"],
    }
    feats_j = VideoExtractor().apply(
        enc_vars, jnp.asarray(video.transpose(0, 2, 3, 4, 1)), train=False
    )
    visual_j = jnp.concatenate(
        [feats_j, jnp.tile(jnp.asarray(speaker)[:, None, :], (1, T, 1))], axis=-1
    )
    dec_vars = {
        "params": converted["params"]["decoder"],
        "batch_stats": converted["batch_stats"]["decoder"],
    }
    got = Decoder(cfg).apply(
        dec_vars,
        visual_j,
        jnp.asarray(speaker),
        None,  # mels=None -> free-running inference
        1.0,
        {"gumbel": jax.random.PRNGKey(0)},
        train=False,
    )

    got_post = np.asarray(got["mel_postnet"], np.float32)
    got_len = np.asarray(got["lengths"])
    assert got_post.shape == want_post.shape == (B, 80, 300)

    # free-running drift over 300 dependent steps: measured max|mel| gap
    # documented in PARITY.md; the trajectory must stay pointwise close
    post_gap = np.abs(got_post - want_post).max()
    assert post_gap < 5e-2, post_gap
    # stop decision: first gate>0.5 index within one step per row
    assert np.abs(got_len.astype(int) - want_len.astype(int)).max() <= 1, (
        got_len, want_len,
    )
    print(f"300-step free-run: postnet mel gap {post_gap:.2e}, "
          f"lengths ours={got_len} ref={want_len}")
