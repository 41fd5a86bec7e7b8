"""Optimizer factory: Adam with the reference's exact hyperparameters
(main.py:45: torch.optim.Adam(lr=1e-3) => betas (0.9, 0.999), eps 1e-8)."""

from __future__ import annotations

import optax


def adam(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8) -> optax.GradientTransformation:
    return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=eps)
