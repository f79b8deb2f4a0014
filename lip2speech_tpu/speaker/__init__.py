from lip2speech_tpu.speaker.models import (  # noqa: F401
    FaceDecoder,
    FaceRecognizer,
    SpeakerDecoder,
    SpeakerEncoder,
    get_network,
)
from lip2speech_tpu.speaker.losses import (  # noqa: F401
    contrastive_loss,
    reconstruction_loss,
    style_loss,
)
from lip2speech_tpu.speaker.dataset import AVSpeechFace, collate_speaker  # noqa: F401
from lip2speech_tpu.speaker.train_loop import (  # noqa: F401
    SpeakerTrainState,
    init_speaker_training,
    make_speaker_optimizer,
    make_speaker_train_step,
)
