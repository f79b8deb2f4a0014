"""Thread-safe RNG for datasets.

``Loader`` maps ``dataset.__getitem__`` over a ThreadPoolExecutor, so any
per-dataset ``np.random.Generator`` is hit from many threads at once —
and numpy documents ``Generator`` as NOT thread-safe: concurrent draws
race on the PCG64 state update, producing duplicated "random" crops/flip
decisions and non-reproducible augmentation even with a fixed seed.
``LockedRng`` serializes every method call on the wrapped generator.
(The reference sidesteps this with DataLoader worker *processes*,
train.py:94-100; the threaded loader must lock instead.)
"""

from __future__ import annotations

import threading

import numpy as np


class LockedRng:
    """Proxy around ``np.random.Generator`` that guards every call."""

    def __init__(self, gen: np.random.Generator | None = None):
        self._gen = gen if gen is not None else np.random.default_rng(0)
        self._lock = threading.Lock()

    def __getattr__(self, name: str):
        attr = getattr(self._gen, name)
        if not callable(attr):
            return attr

        def locked(*args, **kwargs):
            with self._lock:
                return attr(*args, **kwargs)

        return locked
