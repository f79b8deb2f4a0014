"""The fixture-overfit evidence run (VERDICT r3 item 2) must reproduce.

``artifacts/overfit_r5/`` holds the committed score trajectory of training
the real CLI on the reference's bundled 10-clip SAMPLE_LRW fixture
(``/root/reference/arg_parser.py:12-13`` — the reference's de-facto
integration fixture) with the overrides recorded in its MANIFEST. Two
guards:

- the committed trajectory itself shows the whole stack learning
  (total loss declining, free-running predicted-audio ESTOI rising per
  ``/root/reference/evaluate.py:22-51`` semantics), and
- a live 20-step rerun of the same CLI configuration starts from the
  same loss basin and declines — i.e. the committed curve is a property
  of the code, not of a lost one-off environment.
"""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts", "overfit_r5")
FIXTURE = "/root/reference/Datasets/SAMPLE_LRW"

needs_artifact = pytest.mark.skipif(
    not os.path.exists(os.path.join(ART, "metrics.jsonl")),
    reason="overfit artifact not committed yet",
)


def _rows(name="metrics.jsonl"):
    with open(os.path.join(ART, name)) as f:
        return [json.loads(l) for l in f if l.strip()]


@needs_artifact
def test_committed_trajectory_shows_learning():
    """The committed trajectory must show the whole stack learning: the
    loss descending to a trough well below its start and free-running
    predicted-audio ESTOI rising well above its first eval. Peak-based on
    purpose: the committed record is the FULL honest trajectory including
    the AR-instability regime the campaign documented (DESIGN.md round-5
    section), and the eval-gated best checkpoint — what `wav/` is
    rendered from — is taken at the peak, not at wall-clock end."""
    rows = _rows()
    totals = [(r["step"], r["total"]) for r in rows if "total" in r]
    assert len(totals) >= 5, "trajectory too short to mean anything"
    first, trough = totals[0][1], min(t for _, t in totals)
    assert trough < 0.75 * first, (first, trough)

    estoi = [(r["step"], r["eval/estoi"]) for r in rows if "eval/estoi" in r]
    assert len(estoi) >= 2, "no eval ticks in the committed trajectory"
    # "well above its start": at least doubled AND up by >= 0.05 absolute.
    # (A pure multiplicative bar is ill-posed when the first eval tick
    # already lands above noise — the r5d campaign's first eval was 0.051.)
    peak = max(v for _, v in estoi)
    assert peak > max(2 * estoi[0][1], estoi[0][1] + 0.05), estoi

    # and the MANIFEST's best-checkpoint pointer matches the peak eval
    with open(os.path.join(ART, "MANIFEST.json")) as f:
        manifest = json.load(f)
    assert abs(manifest["best_estoi"] - peak) < 1e-9


@needs_artifact
@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(FIXTURE), reason="reference fixture absent")
def test_overfit_run_reproduces(tmp_path):
    from lip2speech_tpu.cli import train as train_cli
    from lip2speech_tpu.config import config_with_overrides

    with open(os.path.join(ART, "MANIFEST.json")) as f:
        manifest = json.load(f)

    run_dir = str(tmp_path / "run")
    args = train_cli.parse_args(
        [
            "--dataset", "LRW",
            "--root", FIXTURE,
            "--train_split", "test",
            "--no_augment",
            "--batch_size", "10",
            "--max_iters", "20",
            "--eval_interval", "99999",
            "--log_interval", "1",
            "--cache_decoded_gb", "1",
            "--run_dir", run_dir,
            "--ckpt_dir", str(tmp_path / "ckpt"),
        ]
    )
    cfg = config_with_overrides(*manifest["overrides"])
    train_cli.train(args, cfg)

    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        live = [json.loads(l) for l in f if l.strip()]
    totals = [r["total"] for r in live if "total" in r]
    assert len(totals) == 20

    # same data + model + loss => the run starts in the same loss basin.
    # The anchor is the committed FROM-INIT probe (init_trajectory.jsonl /
    # MANIFEST init_total, 20 steps at log_interval=1), not the campaign's
    # first logged row — that lands at step log_interval (=100), long
    # after the steep initial descent.
    committed_first = manifest["init_total"]
    assert 0.5 * committed_first < totals[0] < 2.0 * committed_first, (
        totals[0],
        committed_first,
    )
    # and it learns: late window strictly below the early window
    early = sum(totals[:5]) / 5
    late = sum(totals[-5:]) / 5
    assert late < early - 0.5, (early, late)
