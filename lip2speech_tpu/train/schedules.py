"""Learning-rate schedules: parity with the reference's ``Optimzer``
wrapper (``/root/reference/train_utils/optimizer.py:5-66`` — polynomial
decay ``lr * (1 - it/max_iter)^0.9`` with warmup start and a
reduce-on-plateau multiplier; unused by the reference's train.py, provided
here as optax schedules for capability parity).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def polynomial_decay(base_lr: float, max_iter: int, power: float = 0.9):
    """lr(it) = base_lr * (1 - it/max_iter)^power."""

    def schedule(count):
        frac = jnp.clip(1.0 - count / max_iter, 0.0, 1.0)
        return base_lr * frac**power

    return schedule


class ReduceOnPlateau:
    """Multiplicative lr reduction when a monitored metric stalls
    (optimizer.py plateau multiplier). Host-side stateful helper; multiply
    its factor into an optax ``scale_by_schedule`` or inject via
    ``optax.inject_hyperparams``."""

    def __init__(self, factor: float = 0.5, patience: int = 3, mode: str = "min"):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.best = float("inf") if mode == "min" else -float("inf")
        self.bad = 0
        self.scale = 1.0

    def update(self, metric: float) -> float:
        improved = metric < self.best if self.mode == "min" else metric > self.best
        if improved:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale *= self.factor
                self.bad = 0
        return self.scale


def adam_poly(base_lr: float, max_iter: int, power: float = 0.9, **adam_kw):
    """Adam + polynomial decay — the reference wrapper's default pairing."""
    return optax.chain(
        optax.scale_by_adam(**adam_kw),
        optax.scale_by_schedule(lambda c: -polynomial_decay(base_lr, max_iter, power)(c)),
    )
