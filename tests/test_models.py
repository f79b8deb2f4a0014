"""Shape/jit tests for the model zoo on tiny inputs (CPU).

Mirrors the reference's smoke-main contracts (SURVEY.md §4): random tensors
through each module, asserting the documented shapes. Tiny spatial sizes
keep CPU runtime low; full-size shapes are covered by the TPU bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lip2speech_tpu.config import ModelConfig
from lip2speech_tpu.models import (
    Decoder,
    Discriminator,
    FaceRecognizer,
    Lip2Speech,
    SpeakerEncoder,
    VideoExtractor,
    sample_patch,
)

CFG = ModelConfig()


def test_video_extractor_shapes():
    model = VideoExtractor()
    video = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 96, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), video, train=False)
    out = model.apply(vars_, video, train=False)
    assert out.shape == (2, 5, 768)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)  # L2-normalized


def test_face_recognizer_shapes():
    model = FaceRecognizer()
    x = jnp.zeros((2, 160, 160, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out.shape == (2, 256)
    emb = model.apply(vars_, x, method=FaceRecognizer.inference)
    assert emb.shape == (2, 256)
    n = np.linalg.norm(np.asarray(emb), axis=-1)
    assert ((n < 1e-6) | (np.abs(n - 1) < 1e-4)).all()


def test_speaker_encoder_shapes():
    model = SpeakerEncoder(CFG)
    wav = jnp.zeros((2, 16000))
    vars_ = model.init(jax.random.PRNGKey(0), wav)
    emb = model.apply(vars_, wav, method=SpeakerEncoder.inference)
    assert emb.shape == (2, 256)


@pytest.fixture(scope="module")
def decoder_vars():
    model = Decoder(CFG)
    enc = jnp.zeros((2, 9, CFG.encoder_embedding_dim))
    face = jnp.zeros((2, 256))
    mels = jnp.zeros((2, 80, 12))
    rngs = {
        "gumbel": jax.random.PRNGKey(1),
        "teacher": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
        "postnet_dropout": jax.random.PRNGKey(4),
    }
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0)},
        enc, face, mels, 0.5, rngs, train=False,
    )
    return model, vars_, enc, face, mels, rngs


def test_decoder_train_outputs(decoder_vars):
    model, vars_, enc, face, mels, rngs = decoder_vars
    out, updates = model.apply(
        vars_, enc, face, mels, 0.5, rngs, train=True, mutable=["batch_stats"]
    )
    assert out["mel"].shape == (2, 80, 12)
    assert out["mel_postnet"].shape == (2, 80, 12)
    assert out["gate"].shape == (2, 12, 1)
    assert out["attention"].shape == (2, 12, 9)
    # content: min_T = floor(9/7) = 1 slot
    assert out["content_dist"].shape == (2 * 1, CFG.content_vocab_size)
    assert "batch_stats" in updates
    assert np.isfinite(np.asarray(out["mel_postnet"])).all()


def test_decoder_inference(decoder_vars):
    model, vars_, enc, face, _, rngs = decoder_vars
    out = model.apply(vars_, enc, face, None, 1.0, rngs, train=False)
    assert out["mel_postnet"].shape == (2, 80, CFG.max_decoder_steps)
    assert out["lengths"].shape == (2,)
    assert (np.asarray(out["lengths"]) >= 1).all()
    assert (np.asarray(out["lengths"]) <= CFG.max_decoder_steps).all()


def test_discriminator_patch_extraction_matches_ragged_slice():
    """extract_patch must place mel[:, :, start:start+length] at positions
    [0, length) for EVERY reachable (start, length) — including start >
    T-P, where a bare dynamic_slice would clamp and misalign the mask."""
    from lip2speech_tpu.models.discriminator import extract_patch

    P = CFG.discriminator_patch
    T = 80
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, 80, T)).astype(np.float32))
    fn = jax.jit(extract_patch, static_argnums=3)
    for seed in range(50):
        start, length = sample_patch(jax.random.PRNGKey(seed), T, P)
        s, l = int(start), int(length)
        assert s + l <= T  # reference invariant (discriminator.py:93-95)
        got = np.asarray(fn(mel, start, length, P))
        want = np.zeros((2, P, 80), np.float32)
        want[:, :l] = np.swapaxes(np.asarray(mel)[:, :, s : s + l], 1, 2)
        np.testing.assert_array_equal(got, want)


def test_sample_patch_reaches_tail_frames():
    """The reference start distribution (max(0, 1+u-length)) can place the
    final mel frame inside the patch; the sampler must too."""
    P = CFG.discriminator_patch
    T = 80
    tail_hit = 0
    for seed in range(200):
        start, length = sample_patch(jax.random.PRNGKey(seed), T, P)
        if int(start) + int(length) == T:
            tail_hit += 1
    assert tail_hit > 0


def test_discriminator_shapes():
    model = Discriminator(CFG)
    mel = jnp.zeros((3, 80, 77))
    spk = jnp.zeros((3, 256))
    patch = sample_patch(jax.random.PRNGKey(0), 77, CFG.discriminator_patch)
    vars_ = model.init(jax.random.PRNGKey(0), mel, spk, patch, train=False)
    out = model.apply(vars_, mel, spk, patch, train=False)
    assert out.shape == (3,)
    out2, feats = model.apply(
        vars_, mel, spk, patch, train=False, return_features=True
    )
    assert len(feats) == 5


def test_lip2speech_end_to_end_tiny():
    cfg = CFG
    model = Lip2Speech(cfg)
    video = jnp.zeros((1, 5, 96, 96, 3))
    faces = jnp.zeros((1, 2, 160, 160, 3))
    mels = jnp.zeros((1, 80, 12))
    rngs = {
        "gumbel": jax.random.PRNGKey(1),
        "teacher": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0)},
        video, faces, mels, 0.5, None, rngs, train=False,
    )
    out, _ = model.apply(
        vars_, video, faces, mels, 0.5, None, rngs, train=True,
        mutable=["batch_stats"],
    )
    assert out["mel"].shape == (1, 80, 12)

    # inference with external speaker embedding (demo.py:81-84 contract)
    spk = jnp.zeros((1, 256))
    out_inf = model.apply(
        vars_, video, None, None, 1.0, spk, rngs, train=False
    )
    assert out_inf["mel_postnet"].shape == (1, 80, cfg.max_decoder_steps)


def test_clip_grad_norm_semantics():
    """layers.clip_grad_norm: identity forward; backward rescales only
    cotangents whose L2 norm exceeds the limit; nonfinite cotangents pass
    through for the optimizer-level guard to reject."""
    from lip2speech_tpu.models.layers import clip_grad_norm

    x = jnp.asarray(np.random.default_rng(0).normal(size=(16,)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(clip_grad_norm(x, 1.0)), np.asarray(x))

    def f(x, scale):
        return jnp.sum(clip_grad_norm(x, 1.0) * scale)

    # below the limit: untouched (grad = scale * ones, norm = 0.4)
    g_small = jax.grad(f)(x, jnp.float32(0.1))
    np.testing.assert_allclose(np.asarray(g_small), 0.1, rtol=1e-6)
    # above the limit: rescaled to exactly limit norm, direction kept
    g_big = jax.grad(f)(x, jnp.float32(100.0))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(g_big)), 1.0, rtol=1e-5)
    assert (np.asarray(g_big) > 0).all()
    # nonfinite norm: passes through untouched
    g_inf = jax.grad(f)(x, jnp.float32(np.inf))
    assert not np.isfinite(np.asarray(g_inf)).any()


def test_clip_grad_norm_bounds_scan_bptt():
    """Through an exploding recurrence (gain 3, 40 steps -> 3^40 ~ 1e19
    unclipped), the per-step carry clip keeps the BPTT gradient bounded.
    This is the stabilizer for the hardware-observed decoder-scan overflow
    (max|grad| 5.6 -> 3e34 in ~6 optimizer steps; tools/diagnose_nan.py)."""
    from lip2speech_tpu.models.layers import clip_grad_norm

    w = jnp.float32(1.5)

    def run(x0, clip):
        def step(c, _):
            if clip:
                c = clip_grad_norm(c, 1.0)
            return c * w, ()

        c, _ = jax.lax.scan(step, x0, None, length=40)
        return jnp.sum(c)

    x0 = jnp.full((4,), 1e-5, jnp.float32)
    g_unclipped = np.linalg.norm(np.asarray(jax.grad(run)(x0, False)))
    g_clipped = np.linalg.norm(np.asarray(jax.grad(run)(x0, True)))
    assert g_unclipped > 1e6  # w^40 ~ 1.1e7: explosive without the stabilizer
    assert g_clipped <= 1.0 + 1e-4  # the step-0 clip is the last backward op


def test_decoder_scan_grad_clip_forward_exact(decoder_vars):
    """scan_grad_clip must not change forward values at all (it only edits
    the backward): teacher-forced outputs are bit-identical on/off."""
    import dataclasses

    model, vars_, enc, face, mels, rngs = decoder_vars
    clipped = Decoder(dataclasses.replace(CFG, scan_grad_clip=1.0))
    out_off = model.apply(vars_, enc, face, mels, 0.5, rngs, train=False)
    out_on = clipped.apply(vars_, enc, face, mels, 0.5, rngs, train=False)
    for k in ("mel", "mel_postnet", "gate", "attention"):
        np.testing.assert_array_equal(np.asarray(out_off[k]), np.asarray(out_on[k]))


def test_decoder_content_grad_clip_forward_exact(decoder_vars):
    """content_grad_clip (round-5 stabilizer for the quantizer-logits
    explosion channel) must not change forward values at all: outputs are
    bit-identical on/off."""
    import dataclasses

    model, vars_, enc, face, mels, rngs = decoder_vars
    clipped = Decoder(dataclasses.replace(CFG, content_grad_clip=1.0))
    out_off = model.apply(vars_, enc, face, mels, 0.5, rngs, train=False)
    out_on = clipped.apply(vars_, enc, face, mels, 0.5, rngs, train=False)
    for k in ("mel", "mel_postnet", "gate", "attention"):
        np.testing.assert_array_equal(np.asarray(out_off[k]), np.asarray(out_on[k]))


def test_content_grad_clip_bounds_quantizer_grads():
    """With content_grad_clip on, the cotangent reaching the quantizer
    logits is bounded regardless of how large the downstream gradient is
    (the measured runs/overfit_r5a failure channel: KLD-term sharpening
    amplified by the 1/tau=10 gumbel-softmax scale)."""
    import dataclasses

    from lip2speech_tpu.models.decoder import ContentEncoder

    cfg_on = dataclasses.replace(CFG, content_grad_clip=1e-3)
    cfg_off = CFG
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64)) * 3.0
    key = jax.random.PRNGKey(1)

    def loss(params, cfg):
        enc = ContentEncoder(cfg)
        k, v, dist = enc.apply(params, x, key, train=False)
        # huge downstream scale to provoke a large logits cotangent
        return 1e6 * jnp.sum(jnp.square(v)) + 1e6 * jnp.sum(jnp.square(dist))

    params = ContentEncoder(cfg_off).init(
        {"params": jax.random.PRNGKey(2)}, x, key, train=False
    )
    g_off = jax.grad(loss)(params, cfg_off)
    g_on = jax.grad(loss)(params, cfg_on)
    # loc_2 produces the logits: its kernel grad flows only through `flat`
    n_off = float(optax_global_norm(g_off["params"]["loc_2"]))
    n_on = float(optax_global_norm(g_on["params"]["loc_2"]))
    assert n_off > 10 * n_on, (n_off, n_on)
    assert np.isfinite(n_on)


def optax_global_norm(tree):
    import optax

    return optax.global_norm(tree)
