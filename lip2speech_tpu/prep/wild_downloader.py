"""WILD corpus acquisition: download a list of long-form videos.

Structure parity with /root/reference/datasets/wild/youtube_downloader.py
(a hard-coded list of ~70 lecture video ids fed to youtube_dl): the id
list comes from a text file; network fetches are gated in this egress-less
environment (prep.common.require_network).
"""

from __future__ import annotations

import argparse

from lip2speech_tpu.prep.common import require_network


def download_videos(id_file: str, out_dir: str):
    with open(id_file) as f:
        ids = [l.strip() for l in f if l.strip()]
    print(f"{len(ids)} video ids")
    require_network("wild youtube downloader")


def main(argv=None):
    p = argparse.ArgumentParser("WILD downloader")
    p.add_argument("--ids", required=True, help="text file, one YouTube id/line")
    p.add_argument("--out_dir", required=True)
    args = p.parse_args(argv)
    download_videos(args.ids, args.out_dir)


if __name__ == "__main__":
    main()
