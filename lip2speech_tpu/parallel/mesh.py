"""Device mesh + sharding rules (pjit/GSPMD).

The reference is single-GPU with vestigial NCCL flags
(``/root/reference/hparams.py:13-15``, never read — SURVEY.md §2.10). Here
parallelism is first-class: a named ``Mesh`` with ``data`` and ``model``
axes; batches shard over ``data`` (gradients psum over ICI automatically
under jit), and the large decoder/encoder matmul weights optionally shard
over ``model`` for tensor parallelism. XLA GSPMD inserts the collectives.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def auto_mesh(batch_size: int, n_model: int = 1) -> Mesh:
    """Largest data axis that divides both the batch and the device count
    (the single-chip and tiny-batch cases degrade gracefully)."""
    avail = len(jax.devices()) // n_model
    n_data = 1
    for d in range(1, avail + 1):
        if batch_size % d == 0 and (avail % d == 0 or d == avail):
            n_data = max(n_data, d)
    return create_mesh(n_data=n_data, n_model=n_model,
                       devices=jax.devices()[: n_data * n_model])


def create_mesh(
    n_data: int = -1,
    n_model: int = 1,
    devices: list | None = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    explicit = devices is not None
    devices = devices if explicit else jax.devices()
    n = len(devices)
    if n_data == -1:
        n_data = n // n_model
    want = n_data * n_model
    assert 0 < want <= n, (n_data, n_model, n)
    if not explicit and want != n:
        # A user-supplied (n_data, n_model) that underfills the machine is
        # almost always a typo or a stale script — it would silently idle
        # n-want chips. Callers that genuinely want a submesh must pass the
        # device subset explicitly (as auto_mesh does).
        raise ValueError(
            f"mesh {n_data}x{n_model} uses {want} of {n} available devices; "
            f"pass devices=jax.devices()[:{want}] explicitly to run a submesh"
        )
    grid = np.asarray(devices[:want]).reshape(n_data, n_model)
    return Mesh(grid, (data_axis, model_axis))


# Tensor-parallel rules: param-path regex -> PartitionSpec.
#
# ONLY time-batched (non-scan) matmuls shard over 'model'. A weight that
# lives inside a lax.scan body and is sharded on its output dim forces a
# collective (all-gather of the carried activation) EVERY scan step —
# for the 300-step AR decoder that is 300+ serial ICI latencies per
# forward, each amortizing a (B, F/N) matmul far too small to care
# (round-3 rules sharded prenet/Q/attention_proj/content_Q/fc_out and
# both decoder_rnn layers this way; tools/audit_tp_hlo.py counts the
# resulting in-loop collectives, and the regression test pins the fixed
# rules to ZERO inside the AR while-loop). The conv banks and conv_last
# batch over all frames in one GEMM, so their single all-reduce
# amortizes over B*T rows — those stay sharded. At this model size
# (265 MB) TP is never FLOP-motivated (SURVEY §2.10); it exists for
# memory relief and for wider variants, so it must at least never make
# the serial path worse.
TP_RULES: list[tuple[str, P]] = [
    (r"decoder/(K_bank|V_bank)/.*(conv_k\d+|bottleneck)/kernel$", P(None, None, "model")),
    (r"encoder/trunk/conv_last_conv/kernel$", P(None, None, None, "model")),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def partition_params(params: Any, mesh: Mesh, tensor_parallel: bool) -> Any:
    """PartitionSpec pytree for the param tree. With ``tensor_parallel``
    off (or a 1-sized model axis) everything is replicated."""

    def spec_for(path, leaf):
        if tensor_parallel and mesh.shape.get("model", 1) > 1:
            p = _path_str(path)
            for pat, spec in TP_RULES:
                if re.search(pat, p):
                    # only shard if the sharded dim divides evenly
                    dims = [d for d in spec if d is not None]
                    if dims and leaf.shape[-1] % mesh.shape["model"] == 0:
                        return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_pytree(tree: Any, mesh: Mesh, specs: Any) -> Any:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays shard their leading dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def distribute_batch(batch: Any, mesh: Mesh, process_count: int | None = None):
    """Build batch-sharded global arrays from per-process local data.

    Single-process: plain ``device_put`` with the batch sharding. Multi-host
    (a real TPU pod slice): every process holds only its
    ``global_batch // process_count`` rows (see ``data.Loader`` shard args),
    and ``jax.make_array_from_process_local_data`` assembles the global
    array without shipping non-addressable shards — the fix for the
    round-1 gap where a full global batch was device_put from every
    process. The reference equivalent is DataLoader worker sharding
    (train.py:94-100) scaled out.
    """
    if process_count is None:
        process_count = jax.process_count()
    sharding = batch_sharding(mesh)
    if process_count == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _path_keys(path) -> tuple:
    return tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def opt_state_shardings(opt_abstract: Any, mesh: Mesh, param_specs: Any) -> Any:
    """Shardings for an (abstract) optax state pytree: moment buffers that
    mirror a param (adam mu/nu/nu_max nest the full params dict inside the
    optax NamedTuples) get that param's spec, matched by path SUFFIX;
    everything else (counts, flags) replicates."""
    spec_map: dict[tuple, P] = {}
    for path, spec in jax.tree_util.tree_flatten_with_path(
        param_specs, is_leaf=lambda x: isinstance(x, P)
    )[0]:
        spec_map[_path_keys(path)] = spec

    def sharding_for(path, leaf):
        keys = _path_keys(path)
        for i in range(len(keys)):
            spec = spec_map.get(keys[i:])
            if spec is not None and len(spec) <= len(leaf.shape):
                return NamedSharding(mesh, spec)
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(sharding_for, opt_abstract)


def shard_train_state(state, mesh: Mesh, specs: Any, tx):
    """Place a TrainState on the mesh with tensor-parallel param specs.

    Params go to their ``specs`` shardings; batch_stats and counters
    replicate; the optimizer state is (re)initialized under jit with
    explicit ``out_shardings`` from :func:`opt_state_shardings` (the init
    output has no data dependence on its inputs, so GSPMD propagation
    alone would leave it on the default device). Call before any update
    (or re-shard a restored payload with :func:`shard_like`)."""
    params = shard_pytree(state.params, mesh, specs)
    out_sh = opt_state_shardings(jax.eval_shape(tx.init, params), mesh, specs)
    opt_state = jax.jit(tx.init, out_shardings=out_sh)(params)
    return state._replace(
        step=jax.device_put(state.step, replicated(mesh)),
        params=params,
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
        opt_state=opt_state,
    )


def shard_like(tree: Any, reference: Any) -> Any:
    """device_put every leaf of ``tree`` (e.g. a numpy checkpoint payload)
    with the sharding of the corresponding leaf in ``reference`` — restores
    checkpoints INTO the live TP/DP shardings."""
    return jax.tree.map(
        lambda x, ref: jax.device_put(x, ref.sharding), tree, reference
    )
