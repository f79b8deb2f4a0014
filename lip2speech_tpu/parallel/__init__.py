from lip2speech_tpu.parallel.mesh import (
    auto_mesh,  # noqa: F401
    create_mesh,
    distribute_batch,
    partition_params,
    shard_pytree,
    batch_sharding,
    replicated,
    shard_like,
    shard_train_state,
    TP_RULES,
)
