from lip2speech_tpu.detect.face_detector import FaceDetector, hard_nms, nms_jax, iou_matrix  # noqa: F401
from lip2speech_tpu.detect.onnx_jax import make_runner as make_onnx_runner  # noqa: F401
from lip2speech_tpu.detect.openvino_jax import make_ir_runner  # noqa: F401
