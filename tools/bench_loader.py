"""Host input-pipeline throughput: bz2+JPEG decode -> collate clips/sec.

The device side runs at ~635 clips/s inference / ~395 clips/s training on
one v5e chip; this measures whether the HOST side (threaded Loader +
native libjpeg decode) can keep up, and at what worker count. Production
TPU hosts have ~100+ cores; this image exposes few, so the printed
per-worker rate is the number to scale.

Run: python tools/bench_loader.py [--root /root/reference/Datasets/SAMPLE_LRW]
"""

from __future__ import annotations

import argparse
import json
import time

from lip2speech_tpu.config import DataConfig
from lip2speech_tpu.data import LRW, Loader


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/reference/Datasets/SAMPLE_LRW")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--batches", type=int, default=12)
    args = ap.parse_args()

    cfg = DataConfig()
    for cache_gb, label in ((0.0, "decode"), (4.0, "cached")):
        ds = LRW(args.root, mode="test", cfg=cfg,
                 cache_bytes=int(cache_gb * 2**30))
        for workers in (1, 2, 4):
            loader = Loader(
                ds, args.batch_size, cfg, shuffle=True, infinite=True,
                num_workers=workers, seed=0,
            )
            it = iter(loader)
            # warm the thread pool + page cache (+ the decoded cache on
            # the 'cached' row: steady state = epoch >= 2 of a working
            # set that fits the budget)
            for _ in range(2 if cache_gb else 1):
                next(it)
            t0 = time.time()
            for _ in range(args.batches):
                next(it)
            dt = time.time() - t0
            clips = args.batches * args.batch_size
            print(
                json.dumps(
                    {
                        "mode": label,
                        "workers": workers,
                        "clips_per_sec": round(clips / dt, 1),
                        "clips_per_sec_per_worker": round(clips / dt / workers, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
