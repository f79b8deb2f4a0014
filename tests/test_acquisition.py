"""Acquisition tools tested fully offline (VERDICT r2 item 2): request
construction, response parsing, ffmpeg arg lists, failure accounting, and
the genuine network gate — every transport/subprocess boundary mocked."""

import os
import pickle
import urllib.parse

import pytest

from lip2speech_tpu.prep import avspeech_acquire as av
from lip2speech_tpu.prep import wild_downloader as wild
from lip2speech_tpu.prep.common import require_network


# ---------------------------------------------------------------------------
# network gate
# ---------------------------------------------------------------------------


def test_require_network_is_a_genuine_probe():
    require_network("t", probe=lambda: True)  # reachable: no raise
    with pytest.raises(RuntimeError, match="probe"):
        require_network("t", probe=lambda: False)


# ---------------------------------------------------------------------------
# AVSpeech scraper
# ---------------------------------------------------------------------------


def _write_csv(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")


def test_read_avspeech_csv(tmp_path):
    p = str(tmp_path / "avspeech_train.csv")
    _write_csv(p, [
        ("idA", 1.0, 4.0, 0.5, 0.5),
        ("idB", 0.0, 3.0, 0.1, 0.9),
        ("idA", 2.0, 5.0, 0.2, 0.2),  # later row wins per id
    ])
    infos = av.read_avspeech_csv(p)
    assert set(infos) == {"idA", "idB"}
    assert infos["idA"].start_time == 2.0 and infos["idA"].end_time == 5.0
    assert infos["idB"].face_point == (0.1, 0.9)
    assert infos["idA"].stem() == "idA_2_5"


def test_build_videos_request_url():
    url = av.build_videos_request_url(["a1", "b2"], api_key="KEY")
    parsed = urllib.parse.urlparse(url)
    q = urllib.parse.parse_qs(parsed.query)
    assert parsed.scheme == "https"
    assert parsed.netloc == "www.googleapis.com"
    assert parsed.path == "/youtube/v3/videos"
    assert q == {"part": ["snippet"], "id": ["a1,b2"], "key": ["KEY"]}
    with pytest.raises(AssertionError):
        av.build_videos_request_url([f"v{i}" for i in range(51)], "KEY")


def test_parse_snippet_response_language_filter():
    resp = {"items": [
        {"id": "a", "snippet": {"defaultAudioLanguage": "en"}},
        {"id": "b", "snippet": {"defaultLanguage": "en-US"}},  # subtag match
        {"id": "c", "snippet": {"defaultAudioLanguage": "fr"}},
        {"id": "d", "snippet": {}},                  # undeclared: dropped
        {"id": "e", "snippet": {"defaultLanguage": "EN"}},  # case-insensitive
    ]}
    assert av.parse_snippet_response(resp) == ["a", "b", "e"]
    assert av.parse_snippet_response(resp, language="fr") == ["c"]
    assert av.parse_snippet_response({}) == []


def test_scrape_metadata_batches_filters_and_pickles(tmp_path):
    n = 120  # 3 API batches of 50/50/20
    csv = str(tmp_path / "avspeech_test.csv")
    _write_csv(csv, [(f"v{i:03d}", i, i + 3.0, 0.5, 0.5) for i in range(n)])
    out = str(tmp_path / "test.pickle")

    calls = []

    def fake_fetch(url):
        q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
        ids = q["id"][0].split(",")
        calls.append(len(ids))
        assert q["key"] == ["K"]
        # every 3rd video is English
        return {"items": [
            {"id": y, "snippet": {"defaultAudioLanguage": "en"}}
            for y in ids if int(y[1:]) % 3 == 0
        ]}

    kept = av.scrape_metadata(csv, "K", out, fetch_json=fake_fetch)
    assert calls == [50, 50, 20]
    assert len(kept) == 40
    assert all(int(v.yt_id[1:]) % 3 == 0 for v in kept)
    with open(out, "rb") as f:
        on_disk = pickle.load(f)
    assert [v.yt_id for v in on_disk] == [v.yt_id for v in kept]


# ---------------------------------------------------------------------------
# AVSpeech downloader
# ---------------------------------------------------------------------------


def test_resolve_stream_url_command_and_parse():
    seen = {}

    def fake_run(args):
        seen["args"] = args
        return "https://cdn.example/stream.mp4\n"

    url = av.resolve_stream_url("abc123", run=fake_run)
    assert url == "https://cdn.example/stream.mp4"
    a = seen["args"]
    assert "-g" in a and a[a.index("-f") + 1] == "22/18"
    assert a[-1].endswith("watch?v=abc123")

    with pytest.raises(RuntimeError, match="no stream url"):
        av.resolve_stream_url("abc123", run=lambda a: "ERROR: private video")


def test_ffmpeg_cut_args_recipe(tmp_path):
    info = av.VidInfo("vid", 12.5, 18.0)
    video, audio = av.ffmpeg_cut_args("http://u/s.mp4", info, str(tmp_path))
    # both cut the same [start, end] window of the remote stream
    for args in (video, audio):
        assert args[args.index("-ss") + 1] == "12.5"
        assert args[args.index("-to") + 1] == "18"
        assert args[args.index("-i") + 1] == "http://u/s.mp4"
    # video: 25 fps h264, reference quality knobs, no audio track
    assert video[video.index("-r") + 1] == "25"
    assert video[video.index("-c:v") + 1] == "libx264"
    assert video[video.index("-crf") + 1] == "18"
    assert video[video.index("-preset") + 1] == "veryfast"
    assert video[video.index("-pix_fmt") + 1] == "yuv420p"
    assert "-an" in video
    assert video[-1] == os.path.join(str(tmp_path), "vid_12.5_18.mp4")
    # audio: mono 16 kHz pcm_s16le, no video track
    assert audio[audio.index("-ac") + 1] == "1"
    assert audio[audio.index("-ar") + 1] == "16000"
    assert audio[audio.index("-c:a") + 1] == "pcm_s16le"
    assert "-vn" in audio
    assert audio[-1] == os.path.join(str(tmp_path), "vid_12.5_18.wav")


def test_download_clip_composition(tmp_path):
    ff_calls = []
    out = av.download_clip(
        av.VidInfo("x", 0.0, 2.0), str(tmp_path),
        resolver=lambda y: f"http://cdn/{y}",
        run_ff=ff_calls.append,
    )
    assert len(ff_calls) == 2  # one video cut + one audio demux
    assert out.endswith("x_0_2.mp4")
    assert ff_calls[0][ff_calls[0].index("-i") + 1] == "http://cdn/x"


def test_download_list_failure_accounting(tmp_path):
    infos = [av.VidInfo(f"v{i}", 0.0, 1.0) for i in range(5)]
    pkl = str(tmp_path / "list.pickle")
    with open(pkl, "wb") as f:
        pickle.dump(infos, f)

    def flaky(info, out_dir):
        if info.yt_id in ("v1", "v3"):
            raise RuntimeError("geo-blocked")

    failures = av.download_list(pkl, str(tmp_path / "out"), workers=2,
                                download=flaky)
    assert failures == ["v1", "v3"]
    assert os.path.isdir(tmp_path / "out")


# ---------------------------------------------------------------------------
# WILD downloader
# ---------------------------------------------------------------------------


def test_wild_vendored_id_list():
    ids = wild.read_id_file(wild.DEFAULT_IDS)
    # the reference corpus definition: 113 ids (youtube_downloader.py:3-117,
    # a 115-line triple-quoted block sliced [1:-1])
    assert len(ids) == 113
    assert all(" " not in y for y in ids)
    # every entry must look like a YouTube video id, not a stray code line
    assert all(len(y) == 11 and '"' not in y and "." not in y for y in ids)


def test_wild_ytdl_command():
    cmd = wild.ytdl_command(["abc", "def"], "/data/DL", ytdl_bin="youtube-dl")
    assert cmd[0] == "youtube-dl"
    assert cmd[cmd.index("-f") + 1] == "22/18"
    assert cmd[cmd.index("-o") + 1] == "/data/DL/%(title)s-%(id)s.%(ext)s"
    assert cmd[-2:] == [
        "https://www.youtube.com/watch?v=abc",
        "https://www.youtube.com/watch?v=def",
    ]


def test_wild_download_videos_mocked(tmp_path):
    id_file = str(tmp_path / "ids.txt")
    with open(id_file, "w") as f:
        f.write("one\n\ntwo\n")
    calls = []
    ids = wild.download_videos(id_file, str(tmp_path / "dl"), run=calls.append)
    assert ids == ["one", "two"]
    assert len(calls) == 1 and calls[0][-1].endswith("watch?v=two")
    assert os.path.isdir(tmp_path / "dl")
