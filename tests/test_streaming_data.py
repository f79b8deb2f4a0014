"""GRID/AVSpeech streaming reader tests on a synthetic corpus: an MJPG
video built from real fixture faces + wav + landmark json sidecars."""

import bz2
import json
import os
import pickle

import numpy as np
import pytest

from lip2speech_tpu.config import DataConfig

FIXTURE = "/root/reference/Datasets/SAMPLE_LRW/LRW_Faces/ABOUT/test/ABOUT_00001_face.npz"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    import cv2

    from scipy.io import wavfile

    if not os.path.isfile(FIXTURE):
        pytest.skip("fixture absent")
    root = tmp_path_factory.mktemp("grid")
    with bz2.BZ2File(FIXTURE, "r") as f:
        frames = [cv2.imdecode(b, cv2.IMREAD_COLOR) for b in pickle.load(f)]
    # extend to ~2 s at 25 fps by cycling frames
    frames = (frames * 2)[:50]
    h, w = frames[0].shape[:2]
    video = str(root / "clip1.avi")
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 25, (w, h))
    for fr in frames:
        vw.write(fr)
    vw.release()

    sr = 16000
    t = np.arange(2 * sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wavfile.write(str(root / "clip1.wav"), sr, wav)

    # landmark sidecar: a centered face box + synthetic 68-pt landmarks
    box = [10, 10, w - 10, h - 10]
    lm = np.zeros((68, 2), int)
    lm[36:42] = [30, 50]
    lm[42:48] = [80, 50]
    lm[27:36] = [55, 70]
    lm[48:68] = [55, 95]
    info = {
        str(i): {"face_coords": box, "landmarks": lm.tolist()} for i in range(50)
    }
    with open(root / "clip1.json", "w") as f:
        json.dump(info, f)
    return str(root)


def test_grid_streaming_reader(corpus):
    from lip2speech_tpu.data.streaming import GRID

    ds = GRID(corpus, mode="train", cfg=DataConfig(), rng=np.random.default_rng(0))
    assert len(ds) == 1
    s = ds[0]
    assert s["mouth"].ndim == 4 and s["mouth"].shape[1:] == (96, 96, 3)
    assert s["faces"].shape == (2, 160, 160, 3)
    assert s["audio"].dtype == np.float32 and s["audio"].shape[-1] >= 8000
    # windowed cursor: successive items advance through the clip
    s2 = ds[0]
    assert s2["mouth"].shape[0] >= 1


def test_avspeech_reader_same_machinery(corpus):
    from lip2speech_tpu.data.streaming import AVSpeech

    ds = AVSpeech(corpus, mode="train", cfg=DataConfig(), rng=np.random.default_rng(1))
    assert len(ds) == 1
    s = ds[0]
    assert s["mouth"].shape[1:] == (96, 96, 3)


def test_wild_reader(corpus, tmp_path):
    import cv2

    from lip2speech_tpu.data.wild import WILD

    # add the precomputed artifacts WILD expects: _face.npz + mel .npz
    with bz2.BZ2File(FIXTURE, "r") as f:
        enc = pickle.load(f)[:8]
    with open(os.path.join(corpus, "clip1_face.npz"), "wb") as f:
        f.write(bz2.compress(pickle.dumps(enc)))
    np.savez(os.path.join(corpus, "clip1.npz"), data=np.zeros((1, 80, 100)))

    ds = WILD(corpus, mode="train", cfg=DataConfig(), rng=np.random.default_rng(0))
    assert len(ds) == 1
    s = ds[0]
    assert s["mouth"].shape == (8, 96, 96, 3)
    assert s["faces"].shape == (2, 160, 160, 3)
