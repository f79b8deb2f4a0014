"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding (pjit /
shard_map over a Mesh) is exercised without TPU hardware — the standard
JAX pattern for testing distributed code (SURVEY.md §4).
"""

import os

# Force CPU: the session default (JAX_PLATFORMS=axon) points at the single
# real TPU chip; tests want the 8-device virtual CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; the config flag wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: XLA's in-process CPU communicator has a rendezvous race under
# heavy thread oversubscription (8 device threads on this 1-core host):
# with collectives INSIDE a scan/while loop, devices can land in
# different loop iterations of a collective whose rendezvous key doesn't
# include the iteration, and the runtime SIGABRTs after its 40 s stuck
# timeout. Tests therefore never *execute* long in-loop-collective
# programs (tensor-parallel LSTM scans) on the virtual mesh — they
# verify TP sharding application + compilation deterministically and
# leave long TP executions to short-loop configs (test_train_step) and
# real TPU meshes, where collectives are hardware-ordered.
