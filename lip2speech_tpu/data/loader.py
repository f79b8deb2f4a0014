"""Threaded prefetching batch loader.

Replaces ``torch.utils.data.DataLoader`` (``/root/reference/train.py:94-100``)
for the host side: worker threads decode samples (bz2/JPEG release the GIL
inside cv2/bz2), batches are collated to static shapes and double-buffered
ahead of the accelerator. Device transfer + normalization + mel extraction
happen in ``collate.prepare_batch`` on the TPU.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from lip2speech_tpu.config import DataConfig
from lip2speech_tpu.data.collate import collate


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        cfg: DataConfig = DataConfig(),
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        seed: int = 0,
        infinite: bool = False,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        """``batch_size`` is the GLOBAL batch size. With ``shard_count`` > 1
        (multi-host: pass jax.process_index()/jax.process_count()) every
        process shuffles with the same seed and yields its contiguous
        ``batch_size // shard_count`` slice of each global batch, so the
        per-process batches assemble into exactly the single-process global
        batch (parallel.distribute_batch does the assembly)."""
        assert batch_size % shard_count == 0, (batch_size, shard_count)
        assert 0 <= shard_index < shard_count
        self.ds = dataset
        self.batch_size = batch_size
        self.local_batch_size = batch_size // shard_count
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.cfg = cfg
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.infinite = infinite

    def __len__(self) -> int:
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        nb = -(-n // self.batch_size)
        # a ragged tail smaller than shard_count is skipped in lockstep by
        # every process (see __iter__) — don't count it
        tail = n % self.batch_size
        if self.shard_count > 1 and 0 < tail < self.shard_count:
            nb -= 1
        return nb

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # interruptible q.put: a consumer that breaks out of the loop
            # early (eval with max_batches, demo) sets `stop`, and a
            # producer blocked on a full prefetch queue must notice — an
            # unconditional q.put() would leak this thread + its pool
            # (~9 threads and several collated batches) on every early exit
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    while True:
                        idx = self._epoch_indices()
                        nb = len(idx) // self.batch_size if self.drop_last else -(
                            -len(idx) // self.batch_size
                        )
                        for b in range(nb):
                            if stop.is_set():
                                return
                            chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
                            if len(chunk) == self.batch_size:
                                lo = self.shard_index * self.local_batch_size
                                chunk = chunk[lo : lo + self.local_batch_size]
                            else:
                                # ragged tail (drop_last=False): slice pro-rata
                                # on the actual chunk length so every process
                                # gets a near-equal (possibly empty-on-all-or-
                                # none) share and multi-host batch assembly
                                # stays consistent
                                edges = np.linspace(0, len(chunk), self.shard_count + 1)
                                edges = edges.round().astype(int)
                                if (np.diff(edges) == 0).any():
                                    # some process would get nothing: every
                                    # process sees the same edges (same seed),
                                    # so ALL skip this tail batch in lockstep
                                    # (__len__ accounts for this)
                                    logging.getLogger(__name__).warning(
                                        "skipping %d-clip tail batch (< %d "
                                        "processes)", len(chunk), self.shard_count,
                                    )
                                    continue
                                chunk = chunk[
                                    edges[self.shard_index] : edges[self.shard_index + 1]
                                ]
                            samples = list(pool.map(self.ds.__getitem__, chunk))
                            if not put(("batch", collate(samples, self.cfg))):
                                return
                        if not self.infinite:
                            put(("end", None))
                            return
            except BaseException as e:  # noqa: BLE001 — surfaced to consumer
                # a failing __getitem__ must raise in the training loop, not
                # kill this thread silently and leave q.get() blocked forever
                put(("error", e))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "end":
                    return
                if kind == "error":
                    raise RuntimeError("Loader worker failed") from payload
                yield payload
        finally:
            stop.set()
            # unblock a producer mid-put so it can exit promptly
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
