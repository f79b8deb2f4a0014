"""Tests for auxiliary components: lr schedules, file logger, extra audio
encoders, offline prep tools (on synthetic video built from real fixture
faces), ffmpeg/network gating."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lip2speech_tpu.train.schedules import ReduceOnPlateau, polynomial_decay


def test_polynomial_decay():
    sched = polynomial_decay(1e-3, 100, 0.9)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(0.0)
    assert float(sched(50)) == pytest.approx(1e-3 * 0.5**0.9, rel=1e-5)


def test_reduce_on_plateau():
    r = ReduceOnPlateau(factor=0.5, patience=1)
    assert r.update(1.0) == 1.0
    assert r.update(0.9) == 1.0   # improved
    assert r.update(0.95) == 1.0  # 1 bad
    assert r.update(0.95) == 0.5  # patience exceeded


def test_setup_logger_dumps_source(tmp_path):
    from lip2speech_tpu.models import Lip2Speech
    from lip2speech_tpu.config import ModelConfig
    from lip2speech_tpu.utils import setup_logger

    model = Lip2Speech(ModelConfig())
    logger, mdir = setup_logger(model, base_dir=str(tmp_path))
    logger.info("hello")
    logs = [f for f in os.listdir(mdir) if f.endswith(".log")]
    assert len(logs) == 1
    text = open(os.path.join(mdir, logs[0])).read()
    assert "MODEL SOURCE" in text and "class Lip2Speech" in text
    for h in list(logger.handlers):
        logger.removeHandler(h)


def test_audio_extras_shapes():
    from lip2speech_tpu.models.audio_extras import AudioExtractor, SpecEncoder

    wav = jnp.zeros((2, 16000))
    m = AudioExtractor()
    v = m.init(jax.random.PRNGKey(0), wav)
    out = m.apply(v, wav)
    assert out.shape[0] == 2 and out.shape[-1] == 512

    spec = jnp.zeros((2, 513, 40))
    se = SpecEncoder()
    vs = se.init(jax.random.PRNGKey(0), spec, train=False)
    emb = se.apply(vs, spec, train=False)
    assert emb.shape == (2, 512)


def test_gating_errors():
    from lip2speech_tpu.prep.common import require_network
    from lip2speech_tpu.prep.avspeech_acquire import download_clip, VidInfo

    with pytest.raises(RuntimeError, match="network"):
        require_network("x")
    with pytest.raises(RuntimeError, match="network"):
        download_clip(VidInfo("abc", 0, 2), "/tmp")


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/datasets/wild/fast_detector/models"),
    reason="detector weights absent",
)
def test_face_extractor_on_synthetic_video(tmp_path):
    import bz2
    import pickle

    import cv2

    from lip2speech_tpu.prep.face_extractor import extract_faces_for_videos

    with bz2.BZ2File(
        "/root/reference/Datasets/SAMPLE_LRW/LRW_Faces/ABOUT/test/ABOUT_00001_face.npz",
        "r",
    ) as f:
        frames = [cv2.imdecode(b, cv2.IMREAD_COLOR) for b in pickle.load(f)[:6]]
    h, w = frames[0].shape[:2]
    video = str(tmp_path / "clip.avi")
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 25, (w, h))
    assert vw.isOpened()
    for fr in frames:
        vw.write(fr)
    vw.release()

    n = extract_faces_for_videos(str(tmp_path))
    assert n == 1
    sidecar = json.load(open(tmp_path / "clip.json"))
    assert len(sidecar) >= 4  # most frames have the face
    rec = next(iter(sidecar.values()))
    assert len(rec["landmarks"]) == 68
    # resumable second pass: nothing crashes, sidecar stable
    extract_faces_for_videos(str(tmp_path))


def test_config_overrides():
    from lip2speech_tpu.config import config_with_overrides

    c = config_with_overrides("train.learning_rate=3e-4", "model.max_decoder_steps=100")
    assert c.train.learning_rate == 3e-4
    assert c.model.max_decoder_steps == 100
    with pytest.raises(ValueError):
        config_with_overrides("nonsense")
    with pytest.raises(TypeError):
        config_with_overrides("train.not_a_field=1")


def test_metric_logger_tb_and_histograms(tmp_path):
    """TB event files + per-layer histograms (VERDICT r1 item 10; reference
    tensorboard_logger.py:13-58)."""
    import glob
    import json

    import jax.numpy as jnp
    import numpy as np

    from lip2speech_tpu.train.logging_utils import MetricLogger

    run_dir = str(tmp_path / "run")
    logger = MetricLogger(run_dir)
    logger.scalars(10, {"total": 1.5, "grad_norm": 0.3})
    params = {
        "encoder": {"w": jnp.arange(12.0).reshape(3, 4)},
        "decoder": {"b": jnp.ones((5,))},
    }
    grads = {"encoder": {"w": jnp.zeros((3, 4))}, "decoder": {"b": jnp.ones((5,))}}
    stats = logger.histograms(10, params, grads)
    assert stats["param/encoder/w"]["max"] == 11.0
    assert stats["grad/encoder/w"]["rms"] == 0.0
    logger.images(10, mel_pred=np.random.rand(80, 40))
    if logger.tb is not None:
        logger.tb.flush()
        assert glob.glob(os.path.join(run_dir, "tb", "events.out.tfevents.*"))
    with open(os.path.join(run_dir, "histograms.jsonl")) as f:
        rec = json.loads(f.readline())
    assert rec["step"] == 10 and "param/decoder/b" in rec["layers"]
