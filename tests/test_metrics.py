"""Quality-metric registry tests (eval/metrics.py).

The reference evaluates ESTOI only (/root/reference/evaluate.py:44-47);
its paper table also reports STOI/PESQ/WER (BASELINE.md). These tests
pin the future-closing behavior: built-in metrics resolve, absent
oracles raise MetricUnavailable with install instructions (never a
silent stub), and the offline-computable WER is exact.
"""

import numpy as np
import pytest

from lip2speech_tpu.eval.metrics import (
    MetricUnavailable,
    get_waveform_metric,
    registry,
    word_error_rate,
)


def test_registry_reports_every_table2_row():
    rows = registry()
    assert set(rows) == {"estoi", "stoi", "pesq", "wer"}
    # native metrics are always available
    assert rows["estoi"]["available"] and rows["stoi"]["available"]
    # absent oracles carry the exact closing instruction, not None-ness
    for name in ("pesq", "wer"):
        if not rows[name]["available"]:
            assert rows[name]["note"], name
            assert "pip install" in rows[name]["note"] or "download" in rows[name]["note"]


def test_builtin_metrics_resolve_and_score():
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    clean = np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    noisy = clean + 0.3 * rng.standard_normal(clean.shape)
    for name in ("estoi", "stoi"):
        fn = get_waveform_metric(name)
        ident = fn(clean, clean, 16000)
        degraded = fn(clean, noisy, 16000)
        assert ident > 0.99, (name, ident)
        assert degraded < ident, (name, degraded, ident)


def test_absent_oracle_raises_with_install_command():
    try:
        import pesq  # noqa: F401

        pytest.skip("pesq wheel present; absence path not exercisable")
    except ImportError:
        pass
    with pytest.raises(MetricUnavailable, match="pip install pesq"):
        get_waveform_metric("pesq")


def test_unknown_metric_is_keyerror():
    with pytest.raises(KeyError):
        get_waveform_metric("mos")


@pytest.mark.parametrize(
    "ref, hyp, want",
    [
        ("a b c", "a b c", 0.0),
        ("a b c", "a x c", 1 / 3),
        ("a b c d", "a c d", 1 / 4),  # deletion
        ("a c d", "a b c d", 1 / 3),  # insertion
        ("a b", "a x b y", 1.0),  # 2 insertions / 2 ref words
        ("a b", "x y", 1.0),  # full substitution
        ("", "", 0.0),
        ("", "a b", 2.0),  # insertions against empty ref (sclite floor)
        (["token", "list"], ["token", "list"], 0.0),  # pre-tokenized input
    ],
)
def test_word_error_rate_known_answers(ref, hyp, want):
    assert word_error_rate(ref, hyp) == pytest.approx(want, abs=1e-12)


def test_word_error_rate_is_symmetric_edit_distance_core():
    # S+D+I counts must match the classic Levenshtein distance on tokens
    ref, hyp = "the quick brown fox jumps", "the brown ox jumped over"
    errors = word_error_rate(ref, hyp) * len(ref.split())
    assert errors == pytest.approx(4.0)  # del 'quick', sub ox/fox, sub jumped/jumps, ins 'over'


def test_validate_metrics_tool_runs_offline():
    """The one-command validator exits 0 offline (oracles 'awaiting')."""
    from tools.validate_metrics import main

    assert main([]) == 0
    # --require escalates 'awaiting wheel' to exit 2
    try:
        import pystoi  # noqa: F401
    except ImportError:
        assert main(["--require", "pystoi"]) == 2


def test_evaluate_cli_rejects_pesq_on_device():
    from lip2speech_tpu.eval import evaluate as ev

    with pytest.raises(ValueError, match="device"):
        ev.evaluate_net(None, None, None, None, metric="pesq", device_estoi=True)
