"""Offline acquisition / preprocessing tools (L3, SURVEY.md §2.4).

Host-side, run once per corpus. Video decode uses cv2 (ffmpeg-backed);
steps that strictly need the ffmpeg *binary* (audio demux, stream
segmenting) are gated behind :func:`require_ffmpeg`, and the live
network boundaries of the acquisition tools (YouTube API scrape, stream
download) behind a genuine TCP reachability probe
(:func:`common.network_available`). The acquisition LOGIC — API request
construction, response parsing, the ffmpeg cut recipe, failure
accounting — is fully implemented and unit-tested offline with mocked
transports (tests/test_acquisition.py).
"""

from lip2speech_tpu.prep.common import require_ffmpeg, require_network  # noqa: F401
from lip2speech_tpu.prep.face_extractor import extract_faces_for_videos  # noqa: F401
from lip2speech_tpu.prep.resample import convert_sampling_rate  # noqa: F401
from lip2speech_tpu.prep.wild_preprocess import write_segment  # noqa: F401
from lip2speech_tpu.prep.speaker_preprocess import video_to_frames  # noqa: F401
