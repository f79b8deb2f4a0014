from lip2speech_tpu.utils.logger import setup_logger, model_hash  # noqa: F401
