"""ESTOI metric tests + end-to-end CLI smoke on synthetic fixtures (CPU).

The full-size model compiles slowly on CPU, so CLI smokes run with a
shrunken ModelConfig injected via Config; the real-size path is exercised
on TPU by bench.py and the verify drives.
"""

import os

import numpy as np
import pytest

import lip2speech_tpu.ops.estoi as estoi_ops
from lip2speech_tpu.config import Config, ModelConfig
from lip2speech_tpu.data import make_sample_lrw

TINY_MODEL = ModelConfig(
    ffn_hidden_dim=128,
    content_vocab_size=33,
    content_latent_dim=64,
    max_decoder_steps=24,
    postnet_embedding_dim=64,
    shufflenet_width=0.5,
)


def _speechlike(n=32000, seed=0):
    t = np.arange(n) / 16000
    x = sum(
        np.sin(2 * np.pi * f * t) * (0.5 + 0.5 * np.sin(2 * np.pi * (2 + f / 500) * t))
        for f in (200, 400, 800, 1600, 3200)
    )
    return x / np.abs(x).max()


def test_estoi_identity_and_ordering():
    x = _speechlike()
    rng = np.random.RandomState(0)
    assert estoi_ops.estoi(x, x) == pytest.approx(1.0, abs=1e-6)
    scores = []
    for snr in (10, 0, -10):
        n = rng.randn(len(x))
        n *= np.sqrt((x**2).mean() / 10 ** (snr / 10) / (n**2).mean())
        scores.append(estoi_ops.estoi(x, x + n))
    assert scores[0] > scores[1] > scores[2]
    assert scores[0] > 0.5


def test_estoi_jax_matches_numpy_on_nonsilent():

    x = _speechlike()
    rng = np.random.RandomState(1)
    y = x + 0.3 * rng.randn(len(x))
    got = np.asarray(estoi_ops.estoi_batch_jax(np.stack([x, x]), np.stack([x, y])))
    want = [estoi_ops.estoi(x, x), estoi_ops.estoi(x, y)]
    np.testing.assert_allclose(got, want, atol=0.05)


def test_estoi_silent_frames():
    # leading/trailing silence must not crash and must still score high for
    # an identical pair
    x = _speechlike()
    x[:4000] = 0
    x[-4000:] = 0
    assert estoi_ops.estoi(x, x) > 0.99


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lrw_cli"))
    make_sample_lrw(root, n_clips=3)
    return root


@pytest.mark.slow
def test_evaluate_net_smoke(synth_root):
    from lip2speech_tpu.cli.common import init_variables
    from lip2speech_tpu.data import get_dataset
    from lip2speech_tpu.eval.evaluate import evaluate_net
    from lip2speech_tpu.models import Lip2Speech

    cfg = Config(model=TINY_MODEL)
    ds = get_dataset("LRW", synth_root, mode="test", cfg=cfg.data)
    model = Lip2Speech(cfg.model)
    variables = init_variables(model, cfg, 3)
    score = evaluate_net(
        model, variables, ds, cfg, batch_size=3, n_gl_iters=4, max_batches=1
    )
    assert np.isfinite(score)
    assert -1.0 <= score <= 1.0
    # --metric stoi path (VERDICT r2 item 6)
    s2 = evaluate_net(
        model, variables, ds, cfg, batch_size=3, n_gl_iters=4, max_batches=1,
        metric="stoi",
    )
    assert np.isfinite(s2) and -1.0 <= s2 <= 1.0


def test_demo_cli_writes_artifacts(synth_root, tmp_path, monkeypatch):
    from lip2speech_tpu.cli import demo

    out = str(tmp_path / "demo_out")
    monkeypatch.setattr(
        "lip2speech_tpu.cli.demo.Config", lambda: Config(model=TINY_MODEL)
    )
    demo.main(
        [
            "--root", synth_root,
            "--n_clips", "1",
            "--out", out,
            "--gl_iters", "4",
        ]
    )
    files = os.listdir(out)
    assert "clip0_gt.wav" in files
    assert "clip0_pred.wav" in files
    assert any(f.startswith("alignment") for f in files)


@pytest.mark.slow
def test_evaluate_net_mesh_matches_single_device(tmp_path_factory):
    """DP-meshed evaluation must reproduce the single-device score: the
    mesh only changes placement, not math (VERDICT r2 item 3 extension)."""
    from lip2speech_tpu.cli.common import init_variables
    from lip2speech_tpu.data import get_dataset
    from lip2speech_tpu.eval.evaluate import evaluate_net
    from lip2speech_tpu.models import Lip2Speech
    from lip2speech_tpu.parallel import auto_mesh

    root = str(tmp_path_factory.mktemp("lrw_mesh_eval"))
    make_sample_lrw(root, n_clips=8)
    cfg = Config(model=TINY_MODEL)
    ds = get_dataset("LRW", root, mode="test", cfg=cfg.data)
    model = Lip2Speech(cfg.model)
    variables = init_variables(model, cfg, 8)

    base = evaluate_net(
        model, variables, ds, cfg, batch_size=8, n_gl_iters=4, max_batches=1
    )
    mesh = auto_mesh(batch_size=8, n_model=1)
    meshed = evaluate_net(
        model, variables, ds, cfg, batch_size=8, n_gl_iters=4, max_batches=1,
        mesh=mesh,
    )
    assert np.isfinite(base)
    # Not bitwise: per-device shard shapes change XLA CPU codegen (fp
    # rounding order), and the iterative GL phase recovery amplifies that
    # to ~3e-4 in ESTOI. The test guards placement SEMANTICS (sharded
    # eval computes the same quantity), not instruction-level rounding.
    np.testing.assert_allclose(meshed, base, rtol=0, atol=5e-3)
