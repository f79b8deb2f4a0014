from lip2speech_tpu.train.losses import (  # noqa: F401
    lip2speech_loss,
    generator_loss,
    discriminator_loss,
    clamp_discriminator_params,
    gradient_penalty,
)
from lip2speech_tpu.train.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    train_step,
    trainable_mask,
)
