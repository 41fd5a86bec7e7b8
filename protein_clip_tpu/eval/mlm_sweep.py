"""Masking-rate sweep (MLM_Testing.ipynb cells 7-9): for each masking
probability, measure the realised fraction of changed token ids."""

from __future__ import annotations

import random

import numpy as np

from ..data.tokenizer import EsmTokenizer
from ..models.mlm import changed_fraction, mask_sequence


def sweep(sequences: list[str], probs=(0.05, 0.1, 0.2, 0.3, 0.4, 0.5),
          mask_char: str = ".", seed: int = 42,
          tokenizer: EsmTokenizer | None = None) -> dict[float, list[float]]:
    """Returns {prob: [changed_fraction per sequence]} — the notebook's
    box-plot data."""
    tok = tokenizer or EsmTokenizer()
    rng = random.Random(seed)
    out: dict[float, list[float]] = {}
    for p in probs:
        fracs = []
        for seq in sequences:
            masked = mask_sequence(seq, p, mask_char, rng)
            a = tok.encode(seq)
            b = tok.encode(masked)
            fracs.append(changed_fraction(a, b, np.ones_like(a)))
        out[p] = fracs
    return out


def plot_sweep(base_path, result: dict[float, list[float]]) -> str:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..viz.plots import save_plot

    probs = sorted(result)
    plt.boxplot([result[p] for p in probs], labels=[str(p) for p in probs])
    plt.xlabel("Masking probability")
    plt.ylabel("Fraction of changed token ids")
    plt.title("MLM masking rate sweep")
    return save_plot(base_path)
