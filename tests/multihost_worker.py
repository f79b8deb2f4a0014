"""Worker process for the 2-process multi-host integration test.

Launched by tests/test_multihost.py: each worker owns 4 virtual CPU
devices, joins a 2-process jax.distributed cluster (gloo collectives),
builds ITS SLICE of a deterministic global batch, assembles global arrays
with parallel.distribute_batch, and runs one full sharded train step.
Prints the resulting loss for the parent to compare across processes and
against the single-process value.
"""

import json
import os
import sys


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=num_processes, process_id=process_id
    )

    import numpy as np

    from tests.multihost_common import (
        build_global_batch,
        make_setup,
        run_one_step,
    )

    assert len(jax.devices()) == 4 * num_processes
    assert len(jax.local_devices()) == 4

    from lip2speech_tpu.parallel import create_mesh, distribute_batch

    mesh = create_mesh(n_data=4 * num_processes, n_model=1)
    cfg, model, variables = make_setup()
    batch = build_global_batch()
    # this process's contiguous slice of the global batch (what the sharded
    # Loader would produce)
    b = batch["video"].shape[0]
    local = b // num_processes
    lo = process_id * local
    local_batch = {k: np.asarray(v[lo : lo + local]) for k, v in batch.items()}

    sharded = distribute_batch(local_batch, mesh)
    loss = run_one_step(cfg, model, variables, sharded, mesh)
    print(json.dumps({"process": process_id, "loss": loss}), flush=True)


if __name__ == "__main__":
    main()
