"""Training observability.

Covers the reference's three channels (SURVEY.md §5 — per-model file log
with source dump, TensorBoard, PNG dumps to CWD;
``/root/reference/train_utils/tensorboard_logger.py``) with:
  * scalar metrics appended as JSONL (host-agnostic, greppable),
  * TensorBoard event files when ``tensorboard`` is importable — scalars,
    images, and per-layer parameter/gradient histograms at eval ticks
    (tensorboard_logger.py:13-58 parity),
  * console lines with step timing + ETA (train.py:223-239 equivalent),
  * mel / attention / gate PNG artifacts via matplotlib Agg,
  * optional ``jax.profiler`` trace capture around chosen steps.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _make_tb_writer(run_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(os.path.join(run_dir, "tb"))
    except Exception:  # pragma: no cover - tensorboard optional
        return None


class MetricLogger:
    def __init__(self, run_dir: str, tensorboard: bool = True):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self.tb = _make_tb_writer(run_dir) if tensorboard else None
        self._t0 = time.time()
        self._last = self._t0

    def scalars(self, step: int, values: dict, prefix: str = ""):
        now = time.time()
        rec = {
            "step": step,
            "time": now - self._t0,
            "step_time": now - self._last,
            **{f"{prefix}{k}": float(v) for k, v in values.items()},
        }
        self._last = now
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            for k, v in values.items():
                self.tb.add_scalar(f"{prefix}{k}", float(v), step)
        return rec

    def histograms(self, step: int, params, grads=None):
        """Per-layer weight (and optionally gradient) histograms at eval
        ticks — parity with the reference's validation histograms
        (tensorboard_logger.py:20-24). TB gets full histograms; the JSONL
        gets compact summary stats per layer either way."""
        import jax

        def flat(tree, tag):
            out = {}
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
                # multi-host TP: a leaf sharded across processes cannot be
                # fetched with np.asarray (spans non-addressable devices);
                # summarize this process' local shards instead of crashing
                # the run at the first logging tick
                if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
                    leaf = np.concatenate(
                        [np.asarray(s.data).ravel() for s in leaf.addressable_shards]
                    )
                name = "/".join(
                    str(getattr(k, "key", getattr(k, "idx", k))) for k in path
                )
                out[f"{tag}/{name}"] = np.asarray(leaf)
            return out

        tensors = flat(params, "param")
        if grads is not None:
            tensors.update(flat(grads, "grad"))

        stats = {}
        for name, arr in tensors.items():
            a = arr.astype(np.float64).ravel()
            finite = a[np.isfinite(a)]
            stats[name] = {
                "mean": float(a.mean()),
                "std": float(a.std()),
                "min": float(a.min()),
                "max": float(a.max()),
                "rms": float(np.sqrt(np.mean(a * a))),
                "nonfinite": int(a.size - finite.size),
            }
            # TB's make_histogram raises on tensors with no finite values
            # (seen when a run diverges) — log what's finite, never crash
            # the training loop from the logger
            if self.tb is not None and finite.size:
                self.tb.add_histogram(name, finite, step)
        with open(os.path.join(self.run_dir, "histograms.jsonl"), "a") as f:
            f.write(json.dumps({"step": step, "layers": stats}) + "\n")
        return stats

    def console(self, step: int, values: dict, total_steps: int | None = None):
        msg = f"[{step}] " + " ".join(f"{k}={float(v):.4f}" for k, v in values.items())
        if total_steps:
            rate = step / max(time.time() - self._t0, 1e-9)
            eta = (total_steps - step) / max(rate, 1e-9)
            msg += f" eta={eta / 3600:.1f}h"
        print(msg, flush=True)

    def images(self, step: int, mel_pred=None, mel_target=None, attention=None, gate=None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        def save(arr, name, **kw):
            fig, ax = plt.subplots(figsize=(8, 3))
            im = ax.imshow(np.asarray(arr), aspect="auto", origin="lower", **kw)
            fig.colorbar(im, ax=ax)
            fig.tight_layout()
            fig.savefig(os.path.join(self.run_dir, f"{name}_{step}.png"), dpi=80)
            plt.close(fig)

        def tb_image(arr, name):
            if self.tb is not None:
                a = np.asarray(arr, np.float32)
                a = (a - a.min()) / max(a.max() - a.min(), 1e-9)
                self.tb.add_image(name, a[None, ...], step)

        if mel_pred is not None:
            save(mel_pred, "mel_predicted")
            tb_image(mel_pred, "mel_predicted")
        if mel_target is not None:
            save(mel_target, "mel_target")
            tb_image(mel_target, "mel_target")
        if attention is not None:
            save(attention, "alignment", interpolation="nearest")
            tb_image(attention, "alignment")
        if gate is not None:
            fig, ax = plt.subplots(figsize=(8, 2))
            ax.plot(np.asarray(gate))
            fig.savefig(os.path.join(self.run_dir, f"gate_{step}.png"), dpi=80)
            plt.close(fig)


def profile_steps(log_dir: str):
    """Context manager capturing a jax profiler trace (SURVEY.md §5: the
    reference has no tracing; this is the TPU-native hook)."""
    import jax

    class _Ctx:
        def __enter__(self):
            jax.profiler.start_trace(log_dir)
            return self

        def __exit__(self, *exc):
            jax.profiler.stop_trace()

    return _Ctx()
