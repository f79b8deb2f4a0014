"""Device-true timing through the remote-TPU tunnel.

The TPU in this environment is reached through an RPC tunnel with a
~30-36 ms round trip, and ``jax.block_until_ready`` does NOT actually
synchronize through it — per-call timing or dispatch-pipelined loops
measure the tunnel, not the chip. Chaining N iterations inside ONE
jitted loop (a scalar derived from each output perturbs the next input,
forcing serial on-device execution) removes the per-iteration tunnel
cost, but a single loop still pays one RTT per host read: at N=10 that
is ~3 ms/call of phantom cost — enough to make every small op in a
sweep measure a flat ~2.4-3 ms (this exact artifact produced round 3's
wrong "flat per-pass cost" trunk conclusion, DESIGN.md).

The protocol here cancels the fixed cost exactly: the loop takes its
trip count as a *traced* scalar (one compile serves every N), the same
program is timed at N and 2N, and the per-call time is the difference
quotient (t_2N - t_N) / N. Everything constant per host read — tunnel
RTT, dispatch, the final scalar transfer — subtracts out; only the
marginal on-device iteration cost remains.

Used by tools/bench_stages.py, tools/bench_frontend_conv.py,
tools/bench_trunk_ops.py and tools/profile_inference.py; bench.py uses
whole-batch wall time over many pipelined dispatches instead (there the
RTT is amortized by design and represents real serving overhead).
"""

from __future__ import annotations

import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np


def device_time(fn, *args, n: int = 20, repeats: int = 7) -> float:
    """Median seconds per call of ``fn(*args)``, measured on-device.

    ``fn``'s first argument must be a float array (it receives a tiny
    data-dependent perturbation each iteration). The perturbation is a
    broadcast-add over the whole input — a full read+write memory pass —
    because anything cheaper (single-element update) still materializes
    a copy of the loop-invariant input, and leaving the input unperturbed
    lets XLA's while-loop invariant code motion hoist ``fn`` out of the
    loop entirely. The chaining scalar is the SUM over every float leaf
    of the output — consuming only one element instead lets XLA dead-code
    the rest of the op (computing a conv/GEMM's [0] element needs almost
    none of it: an early revision of this protocol read the 139-GFLOP
    front-end conv at 0.01 ms, 70x above the chip's peak, because only
    out[0] survived DCE). Interpretation rule: every measurement carries
    up to ~+1 memory pass over the input (perturb) and ~+1 over the
    output (reduce-sum), so for single-pass bandwidth-bound ops (e.g. a
    plain concat used as a floor) the absolute number can be inflated up
    to ~2-3x; *rankings among variants of the same input/output shapes*
    are unaffected because the bias is identical.

    Returns the RTT-free marginal cost: the loop runs with a dynamic
    trip count and each repeat times N and 2N back to back, so the
    fixed per-read cost (tunnel round trip, dispatch, transfer) cancels
    in the (t_2N - t_N) / N quotient. When the median difference comes
    out non-positive (noise-dominated sub-resolution op) the function
    warns and returns 0.0 rather than silently reporting a clamp.
    """

    @jax.jit
    def loop(trips, *a):
        def body(i, c):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            # consume EVERY float leaf fully: a full reduction defeats
            # XLA's dead-code/slice-fusion shrinking of the measured op
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                leaf = leaf if hasattr(leaf, "dtype") else jnp.asarray(leaf)
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    s = s + jnp.sum(leaf, dtype=jnp.float32)
            return s * 1e-12

        return jax.lax.fori_loop(0, trips, body, jnp.float32(0.0))

    n1 = jnp.int32(n)
    n2 = jnp.int32(2 * n)
    float(loop(n2, *args))  # compile + warm (same executable for any N)

    def timed(trips):
        t0 = time.perf_counter()
        float(loop(trips, *args))
        return time.perf_counter() - t0

    ts = []
    for _ in range(repeats):
        t_n = timed(n1)
        t_2n = timed(n2)
        ts.append((t_2n - t_n) / n)
    med = float(np.median(ts))
    if med <= 0.0:
        warnings.warn(
            f"device_time: non-positive median difference ({med:.3e}s over "
            f"{repeats} N/2N pairs, spread {min(ts):.3e}..{max(ts):.3e}) — "
            "op is below measurement resolution; returning 0.0",
            stacklevel=2,
        )
        return 0.0
    return med
