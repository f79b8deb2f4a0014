"""Offline acquisition / preprocessing tools (L3, SURVEY.md §2.4).

Host-side, run once per corpus. Video decode uses cv2 (ffmpeg-backed);
steps that strictly need the ffmpeg *binary* (audio demux, stream
segmenting) are gated behind :func:`require_ffmpeg` with a clear error,
and network acquisition tools (YouTube scraping/downloading) are gated
behind :func:`require_network` — this image has neither ffmpeg nor
egress.
"""

from lip2speech_tpu.prep.common import require_ffmpeg, require_network  # noqa: F401
from lip2speech_tpu.prep.face_extractor import extract_faces_for_videos  # noqa: F401
from lip2speech_tpu.prep.resample import convert_sampling_rate  # noqa: F401
from lip2speech_tpu.prep.wild_preprocess import write_segment  # noqa: F401
from lip2speech_tpu.prep.speaker_preprocess import video_to_frames  # noqa: F401
