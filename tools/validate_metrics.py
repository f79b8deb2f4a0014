"""One-command quality-metric validation against external oracles.

VERDICT r3 item 5: the PESQ/WER Table-2 rows (BASELINE.md; the reference
computes only ESTOI, /root/reference/evaluate.py:44-47) were scoped out
because no oracle wheel exists in an egress-less image. This tool makes
those gaps future-closing instead of silently persistent:

  * estoi / stoi — cross-checked against genuine `pystoi` (the
    reference's pinned 0.3.3) on deterministic fixture speech the moment
    the wheel is importable; the in-repo oracle suite
    (tests/test_estoi_oracle.py) already pins the algorithm to 1e-8
    against embedded pystoi goldens, so this run is the *independent*
    confirmation.
  * pesq — sanity-checked via the ITU-T P.862 `pesq` wheel (identity
    signal must score near the 4.5 ceiling; noise-corrupted must score
    lower).
  * wer — word_error_rate() is pure Python and validated inline here
    (and in tests/test_metrics.py); the ASR transcription step reports
    its availability from the registry.

Exit status: 0 when every *importable* oracle validates; 1 when an
importable oracle disagrees (a real bug); 2 when requested metrics are
awaiting their wheel (prints the exact install command). Run with
--require to treat "awaiting wheel" as failure, e.g. in an environment
that is supposed to have the oracles.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lip2speech_tpu.eval.metrics import (
    MetricUnavailable,
    compute_pesq,
    registry,
    word_error_rate,
)
from lip2speech_tpu.ops import estoi as estoi_ops

FS = 16000


def _fixture_speech(seconds: float = 3.0, seed: int = 0):
    """Deterministic speech-like pair: modulated harmonics + noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * FS)) / FS
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3.1 * t)  # syllabic-rate envelope
    clean = env * (
        np.sin(2 * np.pi * 220 * t)
        + 0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.25 * np.sin(2 * np.pi * 880 * t)
    )
    degraded = clean + 0.3 * rng.standard_normal(clean.shape)
    return clean.astype(np.float64), degraded.astype(np.float64)


def validate_stoi_family(tol: float = 1e-6) -> list[str]:
    """Cross-check ops/estoi against an actually-installed pystoi."""
    try:
        from pystoi import stoi as pystoi_stoi
    except ImportError:
        raise MetricUnavailable(
            "pystoi is awaiting its wheel: pip install pystoi==0.3.3"
        )
    errs = []
    for seed in (0, 1, 2):
        clean, degraded = _fixture_speech(seed=seed)
        for name, extended in (("estoi", True), ("stoi", False)):
            ours = getattr(estoi_ops, name)(clean, degraded, FS)
            oracle = float(pystoi_stoi(clean, degraded, FS, extended=extended))
            if abs(ours - oracle) > tol:
                errs.append(
                    f"{name} seed={seed}: ours={ours:.9f} pystoi={oracle:.9f} "
                    f"diff={abs(ours - oracle):.2e} > {tol}"
                )
    return errs


def validate_pesq() -> list[str]:
    """Sanity-check the ITU wrapper: identity ~4.5 ceiling, noise lower."""
    clean, degraded = _fixture_speech()
    ident = compute_pesq(clean, clean, FS)  # raises MetricUnavailable w/o wheel
    noisy = compute_pesq(clean, degraded, FS)
    errs = []
    if not ident > 4.0:
        errs.append(f"pesq(clean, clean)={ident:.3f}, expected > 4.0")
    if not noisy < ident:
        errs.append(f"pesq(clean, noisy)={noisy:.3f} not below identity {ident:.3f}")
    return errs


def validate_wer() -> list[str]:
    """The DP itself is offline-validatable; known-answer checks."""
    cases = [
        (("a b c", "a b c"), 0.0),
        (("a b c", "a x c"), 1 / 3),
        (("a b c d", "a c d"), 1 / 4),  # one deletion
        (("a b", "a x b y"), 1.0),  # two insertions / 2 ref words
        (("", ""), 0.0),
    ]
    return [
        f"wer{args}={word_error_rate(*args):.4f}, expected {want:.4f}"
        for args, want in cases
        if abs(word_error_rate(*args) - want) > 1e-12
    ]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument(
        "--require",
        nargs="*",
        default=[],
        choices=("pystoi", "pesq", "wer"),
        help="treat these oracles' absence as failure, not 'awaiting wheel'",
    )
    args = p.parse_args(argv)

    failures: list[str] = []
    awaiting: list[str] = []

    for name, fn in (("pystoi", validate_stoi_family), ("pesq", validate_pesq)):
        try:
            errs = fn()
        except MetricUnavailable as e:
            print(f"[awaiting] {name}: {e}")
            awaiting.append(name)
            continue
        if errs:
            print(f"[FAIL] {name}:")
            for e in errs:
                print(f"    {e}")
            failures.extend(errs)
        else:
            print(f"[ok] {name}: oracle agrees")

    errs = validate_wer()
    if errs:
        print("[FAIL] wer:")
        for e in errs:
            print(f"    {e}")
        failures.extend(errs)
    else:
        print("[ok] wer: known-answer cases pass")

    print("\nregistry status:")
    for name, row in registry().items():
        status = "available" if row["available"] else f"awaiting — {row['note']}"
        print(f"  {name}: {status}")

    if failures:
        return 1
    missing_required = [m for m in args.require if m in awaiting or (
        m == "wer" and not registry()["wer"]["available"])]
    if missing_required:
        print(f"\nrequired oracles absent: {missing_required}")
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
