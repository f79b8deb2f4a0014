from lip2speech_tpu.data.collate import collate, prepare_batch  # noqa: F401
from lip2speech_tpu.data.lrw import LRW, load_jpeg_stack  # noqa: F401
from lip2speech_tpu.data.loader import Loader  # noqa: F401
from lip2speech_tpu.data.augmentation import FaceAugmentation  # noqa: F401
from lip2speech_tpu.data.fixtures import make_sample_lrw  # noqa: F401


def get_dataset(name: str, root: str, mode: str = "train", cfg=None, **kw):
    """Dataset registry mirroring the reference's four corpus names
    (arg_parser.py:6-57: LRW | GRID | AVSpeech | WILD)."""
    from lip2speech_tpu.config import DataConfig

    cfg = cfg or DataConfig()
    name = name.upper()
    if name == "LRW":
        return LRW(root, mode=mode, cfg=cfg, **kw)
    if name == "WILD":
        from lip2speech_tpu.data.wild import WILD

        return WILD(root, mode=mode, cfg=cfg, **kw)
    if name == "GRID":
        from lip2speech_tpu.data.streaming import GRID

        return GRID(root, mode=mode, cfg=cfg, **kw)
    if name == "AVSPEECH":
        from lip2speech_tpu.data.streaming import AVSpeech

        return AVSpeech(root, mode=mode, cfg=cfg, **kw)
    raise ValueError(f"unknown dataset {name}")
