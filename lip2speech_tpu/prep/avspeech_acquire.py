"""AVSpeech / WILD acquisition tools (network-gated).

Structure parity with the reference's scrapers/downloaders
(``/root/reference/datasets/avspeech/preprocess.py:28-69``,
``youtube_meta_scrapper.py:12-26``, ``avspeech/downloader.py:20-73``,
``wild/youtube_downloader.py``): the metadata container, the pickled
work-list format, the thread-pooled download loop and the 25 fps / 16 kHz
normalization recipe are all here; the actual network calls raise a clear
error in this egress-less environment (prep.common.require_network).
"""

from __future__ import annotations

import argparse
import os
import pickle
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from lip2speech_tpu.prep.common import require_network, run_ffmpeg


@dataclass
class VidInfo:
    """One scraped clip (avspeech/preprocess.py VidInfo equivalent)."""

    yt_id: str
    start_time: float
    end_time: float
    language: str = "en"
    out_path: str = ""


def scrape_metadata(query: str, api_key: str, out_pickle: str,
                    language: str = "en") -> list[VidInfo]:
    """YouTube Data API v3 snippet search, keeping defaultAudioLanguage ==
    language, pickled as a VidInfo list."""
    require_network("avspeech metadata scraper")


def download_clip(info: VidInfo, out_dir: str, fps: int = 25, sr: int = 16000):
    """youtube-dl stream fetch + ffmpeg cut to <fps> fps mp4 + mono <sr>
    wav (avspeech/downloader.py:20-73)."""
    require_network("avspeech downloader")


def normalize_local_clip(src: str, dst_mp4: str, dst_wav: str,
                         fps: int = 25, sr: int = 16000):
    """The ffmpeg normalization recipe applied to an already-downloaded
    file: re-encode at fps, demux mono 16 kHz audio."""
    run_ffmpeg(["-i", src, "-r", str(fps), "-an", dst_mp4])
    run_ffmpeg(["-i", src, "-ac", "1", "-ar", str(sr), dst_wav])


def download_list(pickle_path: str, out_dir: str, workers: int = 8):
    with open(pickle_path, "rb") as f:
        infos: list[VidInfo] = pickle.load(f)
    os.makedirs(out_dir, exist_ok=True)
    failures = []
    with ThreadPoolExecutor(workers) as pool:
        for info, ok in zip(
            infos, pool.map(lambda v: _safe_download(v, out_dir), infos)
        ):
            if not ok:
                failures.append(info.yt_id)
    print(f"{len(infos) - len(failures)}/{len(infos)} downloaded; "
          f"failures: {failures[:10]}")


def _safe_download(info: VidInfo, out_dir: str) -> bool:
    try:
        download_clip(info, out_dir)
        return True
    except Exception as e:  # per-video fault tolerance (downloader.py:31-57)
        print(f"{info.yt_id}: {e}")
        return False


def main(argv=None):
    p = argparse.ArgumentParser("avspeech acquisition")
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("scrape")
    s.add_argument("--query", required=True)
    s.add_argument("--api_key", required=True)
    s.add_argument("--out", required=True)
    d = sub.add_parser("download")
    d.add_argument("--list", required=True)
    d.add_argument("--out_dir", required=True)
    d.add_argument("--workers", type=int, default=8)
    args = p.parse_args(argv)
    if args.cmd == "scrape":
        scrape_metadata(args.query, args.api_key, args.out)
    else:
        download_list(args.list, args.out_dir, args.workers)


if __name__ == "__main__":
    main()
