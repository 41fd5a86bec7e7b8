"""Determinism plumbing (replaces modules/seed.py:5-24).

On TPU there is no cudnn to disable: determinism = a single root
``jax.random.key`` threaded functionally + seeded host-side ``random.Random``
instances for data sampling.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int = 42) -> jax.Array:
    """Seed host RNGs (numpy + stdlib, for any legacy callers) and return the
    root JAX key all device randomness derives from."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
