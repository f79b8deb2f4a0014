from lip2speech_tpu.models import layers  # noqa: F401
from lip2speech_tpu.models.video import VideoExtractor  # noqa: F401
from lip2speech_tpu.models.shufflenet import ShuffleNetV2Trunk  # noqa: F401
from lip2speech_tpu.models.face import FaceRecognizer, InceptionResnetV1  # noqa: F401
from lip2speech_tpu.models.decoder import Decoder, Postnet, MultiHopConv, ContentEncoder  # noqa: F401
from lip2speech_tpu.models.discriminator import Discriminator, sample_patch  # noqa: F401
from lip2speech_tpu.models.speaker import SpeakerEncoder  # noqa: F401
from lip2speech_tpu.models.lip2speech import Lip2Speech, get_network  # noqa: F401
