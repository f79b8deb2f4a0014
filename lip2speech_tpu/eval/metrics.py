"""Quality-metric registry: every Report.pdf Table 2 row has a hook.

The reference computes only ESTOI (``/root/reference/evaluate.py:44-47``)
but its paper baseline (BASELINE.md, Report.pdf Table 2) also reports
STOI, PESQ and WER. ESTOI/STOI are implemented natively (``ops/estoi``,
oracle-validated). PESQ and the ASR step of WER cannot be *validated* in
an egress-less image (no ``pesq`` wheel, no pretrained ASR weights), so
instead of an unvalidatable reimplementation this module makes the gap
future-closing (VERDICT r3 item 5):

  * ``get_waveform_metric(name)`` returns a ``f(clean, pred, fs) -> float``
    for estoi/stoi (built-in) and pesq (real ``pesq`` wheel the moment it
    is installed), raising :class:`MetricUnavailable` with the exact
    install command otherwise — "awaiting wheel", never silently absent.
  * ``word_error_rate`` is a complete, offline-testable Levenshtein WER;
    ``make_transcriber`` adapts any local HuggingFace ASR checkpoint
    (``transformers`` is in the image; point ``LIP2SPEECH_ASR_MODEL`` or
    the ``model_path`` argument at downloaded weights) into the
    transcript function WER needs.
  * ``registry()`` reports per-metric availability so tools and docs can
    show live status instead of a stale scope note.

``tools/validate_metrics.py`` turns this into a one-command validation:
it cross-checks ``ops/estoi`` against genuine pystoi and sanity-checks
pesq whenever those wheels import, and fails loudly with instructions
when they don't.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
from typing import Callable, Sequence

import numpy as np


class MetricUnavailable(RuntimeError):
    """A metric whose implementation/oracle is not installed in this
    environment. The message carries the exact command to close the gap."""


_INSTALL = {
    "pesq": "pip install pesq  # ITU-T P.862 reference wrapper",
    "pystoi": "pip install pystoi==0.3.3  # the reference's pinned version",
    "asr": (
        "download a CTC ASR checkpoint (e.g. facebook/wav2vec2-base-960h) "
        "and set LIP2SPEECH_ASR_MODEL=/path/to/it"
    ),
}


def _has(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


def _asr_model_path(model_path: str | None = None) -> str | None:
    p = model_path or os.environ.get("LIP2SPEECH_ASR_MODEL")
    return p if p and os.path.exists(p) else None


def registry(asr_model_path: str | None = None) -> dict[str, dict]:
    """Per-metric status: {name: {available, via, note}}."""
    asr = _asr_model_path(asr_model_path)
    return {
        "estoi": {
            "available": True,
            "via": "lip2speech_tpu.ops.estoi (native; oracle-validated)",
            "note": "validate against pystoi with tools/validate_metrics.py",
        },
        "stoi": {
            "available": True,
            "via": "lip2speech_tpu.ops.estoi (native; oracle-validated)",
            "note": "validate against pystoi with tools/validate_metrics.py",
        },
        "pesq": {
            "available": _has("pesq"),
            "via": "pesq wheel (ITU-T P.862)" if _has("pesq") else None,
            "note": None if _has("pesq") else f"awaiting wheel: {_INSTALL['pesq']}",
        },
        "wer": {
            "available": asr is not None,
            "via": f"edit-distance WER + local ASR at {asr}" if asr else None,
            "note": (
                "word_error_rate() itself is built-in and tested; "
                f"transcription is awaiting weights: {_INSTALL['asr']}"
            )
            if asr is None
            else None,
        },
    }


# ---------------------------------------------------------------------------
# Waveform metrics
# ---------------------------------------------------------------------------


def compute_pesq(clean: np.ndarray, pred: np.ndarray, fs: int = 16000) -> float:
    """PESQ via the reference ``pesq`` wheel (wide-band at 16 kHz, the
    Report.pdf Table 2 condition; narrow-band at 8 kHz)."""
    try:
        from pesq import pesq as _pesq
    except ImportError as e:
        raise MetricUnavailable(
            f"PESQ needs the ITU reference wrapper: {_INSTALL['pesq']}"
        ) from e
    mode = "wb" if fs == 16000 else "nb"
    return float(_pesq(fs, np.asarray(clean, np.float64),
                       np.asarray(pred, np.float64), mode))


def get_waveform_metric(name: str) -> Callable[[np.ndarray, np.ndarray, int], float]:
    """``f(clean, pred, fs) -> float`` for 'estoi' | 'stoi' | 'pesq'.

    Raises :class:`MetricUnavailable` (with install instructions) rather
    than returning a stub when the metric's oracle is absent.
    """
    if name in ("estoi", "stoi"):
        from lip2speech_tpu.ops import estoi as estoi_ops

        return getattr(estoi_ops, name)
    if name == "pesq":
        if not _has("pesq"):
            raise MetricUnavailable(
                f"PESQ is awaiting its wheel: {_INSTALL['pesq']}"
            )
        return compute_pesq
    raise KeyError(f"unknown waveform metric {name!r}")


# ---------------------------------------------------------------------------
# WER
# ---------------------------------------------------------------------------


def _tokens(x: str | Sequence[str]) -> list[str]:
    return x.split() if isinstance(x, str) else list(x)


def word_error_rate(reference: str | Sequence[str], hypothesis: str | Sequence[str]) -> float:
    """Levenshtein WER: (S + D + I) / len(reference words).

    Pure Python, offline-testable (Report.pdf Table 2's WER row is this
    statistic over ASR transcripts of predicted vs ground-truth audio).
    An empty reference scores 0.0 for an empty hypothesis, else 1.0 per
    inserted word normalized by 1 (the jiwer convention would divide by
    zero; we follow NIST sclite and treat each insertion as one error
    against a length-1 floor).
    """
    ref, hyp = _tokens(reference), _tokens(hypothesis)
    if not ref:
        return 0.0 if not hyp else float(len(hyp))
    # single-row DP over the hypothesis
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, start=1):
        cur = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, start=1):
            cur[j] = min(
                prev[j] + 1,  # deletion
                cur[j - 1] + 1,  # insertion
                prev[j - 1] + (r != h),  # substitution / match
            )
        prev = cur
    return prev[-1] / len(ref)


def make_transcriber(model_path: str | None = None,
                     fs: int = 16000) -> Callable[[np.ndarray], str]:
    """Adapt a *local* HuggingFace CTC ASR checkpoint into ``wav -> text``.

    ``transformers`` ships in this image; the weights do not. Point
    ``model_path`` (or $LIP2SPEECH_ASR_MODEL) at a downloaded checkpoint
    directory and WER becomes fully computable:

        transcribe = make_transcriber()
        score = word_error_rate(gt_text, transcribe(pred_wav))
    """
    path = _asr_model_path(model_path)
    if path is None:
        raise MetricUnavailable(f"WER transcription is {_INSTALL['asr']}")
    import torch  # baked in (cpu)
    from transformers import AutoModelForCTC, AutoProcessor

    processor = AutoProcessor.from_pretrained(path)
    model = AutoModelForCTC.from_pretrained(path)
    model.eval()

    def transcribe(wav: np.ndarray) -> str:
        inputs = processor(
            np.asarray(wav, np.float32), sampling_rate=fs, return_tensors="pt"
        )
        with torch.no_grad():
            logits = model(inputs.input_values).logits
        ids = logits.argmax(dim=-1)
        return processor.batch_decode(ids)[0].strip()

    return transcribe
