"""Post-hoc embedding analysis (notebooks/batchwise_pca.ipynb, N4).

2-component PCA scatter of pooled embeddings colored by retrieval rank and
by paired cosine similarity — implemented with a NumPy SVD (no sklearn).
"""

from __future__ import annotations

import numpy as np


def pca2(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, D) -> (N, 2) projection + explained-variance ratios."""
    x = np.asarray(x, dtype=np.float64)
    mu = x.mean(axis=0, keepdims=True)
    xc = x - mu
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    proj = xc @ vt[:2].T
    var = (s ** 2) / max(len(x) - 1, 1)
    ratio = var[:2] / var.sum()
    return proj, ratio


def paired_cosine(pep_emb: np.ndarray, rec_emb: np.ndarray) -> np.ndarray:
    """Cosine similarity of each (pep_i, rec_i) pair."""
    a = np.asarray(pep_emb, np.float64)
    b = np.asarray(rec_emb, np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-12)


def plot_embedding_pca(base_path, pep_emb, rec_emb, ranks) -> list[str]:
    """Two scatter figures: colored by top-k rank, by paired cosine sim."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..viz.plots import save_plot

    proj, ratio = pca2(np.asarray(pep_emb))
    paths = []
    for values, label in ((np.asarray(ranks), "retrieval rank"),
                          (paired_cosine(pep_emb, rec_emb),
                           "paired cosine similarity")):
        plt.figure(figsize=(6, 4))
        sc = plt.scatter(proj[:, 0], proj[:, 1], c=values, cmap="viridis",
                         s=12)
        plt.colorbar(sc, label=label)
        plt.xlabel(f"PC1 ({ratio[0]:.0%})")
        plt.ylabel(f"PC2 ({ratio[1]:.0%})")
        plt.title(f"Peptide embedding PCA by {label}")
        paths.append(save_plot(base_path))
    return paths
