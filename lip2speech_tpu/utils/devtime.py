"""Device-true timing through the remote-TPU tunnel.

The TPU in this environment is reached through an RPC tunnel with a
~30-36 ms round trip, and ``jax.block_until_ready`` does NOT actually
synchronize through it — per-call timing or dispatch-pipelined loops
measure the tunnel, not the chip. The only trustworthy protocol is to
chain N iterations inside ONE jitted ``fori_loop`` (a scalar derived
from each output perturbs the next input, forcing serial on-device
execution) and read a single scalar back on the host.

Used by tools/bench_stages.py, tools/bench_frontend_conv.py, and
tools/profile_inference.py; bench.py uses the equivalent in-program
data-dependent-scalar form.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def device_time(fn, *args, n: int = 10, repeats: int = 3) -> float:
    """Median seconds per call of ``fn(*args)``, measured on-device.

    ``fn``'s first argument must be a float array (it receives a tiny
    data-dependent perturbation each iteration — one broadcast-add,
    ~0.1-0.3 ms at B=64, negligible at the ms scale ranked here); the
    output may be any pytree (the first leaf provides the chaining
    scalar).
    """

    @jax.jit
    def loop(*a):
        def body(i, c):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            leaf = leaf if hasattr(leaf, "reshape") else jnp.asarray(leaf)
            return leaf.reshape(-1)[0].astype(jnp.float32) * 1e-12

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(loop(*args))  # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        float(loop(*args))
        ts.append(time.time() - t0)
    return float(np.median(ts)) / n
