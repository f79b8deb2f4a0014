"""Shared plumbing for offline tools."""

from __future__ import annotations

import shutil
import subprocess


def require_ffmpeg() -> str:
    path = shutil.which("ffmpeg")
    if path is None:
        raise RuntimeError(
            "this preprocessing step needs the ffmpeg binary (audio demux/"
            "segmenting); install ffmpeg or run it on a host that has it"
        )
    return path


def require_network(tool: str):
    raise RuntimeError(
        f"{tool} needs network access (YouTube APIs); this environment has "
        "no egress — run the acquisition tools on a connected host"
    )


def run_ffmpeg(args: list[str]):
    ff = require_ffmpeg()
    subprocess.run([ff, "-loglevel", "error", "-y", *args], check=True)


def extract_wav(video_path: str, wav_path: str, sr: int = 16000):
    """mp4/mov -> mono 16 kHz wav (lrw/preprocess.py:28-40 equivalent)."""
    run_ffmpeg(["-i", video_path, "-ac", "1", "-ar", str(sr), wav_path])
