"""Run-artifact visualizations — parity with modules/visualizations.py.

Same artifact contract: sequentially numbered ``figures/figure N.png`` inside
the run dir (visualizations.py:191-210), similarity heatmaps de-scaled to raw
cosine by exp(-temperature) (":38-52"), loss curves normalised by
-log(1/batch) (":108-130"), cluster-size and sequence-length histograms.
"""

from __future__ import annotations

import math
from pathlib import Path

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


# next "figure N.png" index per figures dir: the existing-file scan runs
# once per folder, later saves are O(1) (a long --epoch-figures run was
# O(N^2) in total stat calls before)
_NEXT_FIGURE_INDEX: dict[Path, int] = {}


def save_plot(base_path: str | Path) -> str:
    """Save the current figure as the next ``figures/figure N.png``."""
    folder = Path(base_path) / "figures"
    folder.mkdir(parents=True, exist_ok=True)
    n = _NEXT_FIGURE_INDEX.get(folder, 1)
    while (folder / f"figure {n}.png").exists():
        n += 1
    path = folder / f"figure {n}.png"
    plt.tight_layout()
    plt.savefig(path)
    # close (not clf): clf leaks the Figure object — multi-epoch runs with
    # --epoch-figures accumulated >20 open figures (matplotlib warning)
    plt.close()
    _NEXT_FIGURE_INDEX[folder] = n + 1
    return str(path)


def plot_similarity_matrix(base_path, title: str, matrix: np.ndarray) -> str:
    plt.figure(figsize=(6, 4))
    plt.imshow(np.asarray(matrix), cmap="ocean", vmin=-1, vmax=1)
    plt.colorbar()
    plt.title(title)
    plt.xlabel("Receptor Protein")
    plt.ylabel("Peptide")
    return save_plot(base_path)


def plot_embedding_cosine_similarities(base_path, title, loader, tokenizer,
                                       compute_fn) -> str:
    """First loader batch -> raw-cosine similarity heatmap.

    compute_fn(peps, recs) -> (B, B) raw cosine matrix (already de-scaled).
    """
    try:
        peps, recs = next(iter(loader))
    except StopIteration:
        print(f"[viz] skipping '{title}': loader is empty")
        return ""
    matrix = compute_fn(peps, recs)
    path = plot_similarity_matrix(base_path, title, matrix)
    if path:
        # raw matrix alongside the heatmap, for numerical parity checks
        np.save(Path(path).with_suffix(".npy"), np.asarray(matrix))
    return path


def plot_loss_curves(base_path, train_losses, val_losses,
                     train_batch_size: int, val_batch_size: int) -> str:
    norm_t = -math.log(1.0 / train_batch_size)
    norm_v = -math.log(1.0 / val_batch_size)
    plt.plot([l / norm_t for l in train_losses], label="Train Loss")
    plt.plot([l / norm_v for l in val_losses], label="Validation Loss")
    plt.title("Training and Validation Loss Relative to Random")
    plt.xlabel("Epochs")
    plt.ylabel("Loss Relative to Random")
    plt.legend()
    return save_plot(base_path)


def plot_clustering(base_path, data_dir, prefix: str = "protein2") -> str:
    tsv = Path(data_dir) / f"{prefix}DB_clustered.tsv"
    counts: dict[str, int] = {}
    n_rows = 0
    with open(tsv) as f:
        for line in f:
            if line.strip():
                rep = line.split("\t")[0]
                counts[rep] = counts.get(rep, 0) + 1
                n_rows += 1
    plt.hist(list(counts.values()), bins=50, log=True)
    plt.xlabel("Number of Protein-Protein Sequences in Cluster")
    plt.ylabel("Number of Clusters")
    plt.title(f"Clustering. NSeq={n_rows}, NClusters={len(counts)}")
    return save_plot(base_path)


def plot_protein_lengths(base_path, data_dir, prefix1: str = "protein1",
                         prefix2: str = "protein2") -> str:
    from ..data.fasta import parse_fasta
    lengths = []
    for prefix in (prefix1, prefix2):
        for _, seq in parse_fasta(Path(data_dir) / f"{prefix}.fasta"):
            lengths.append(len(seq))
    plt.hist(lengths, bins=50, log=True)
    plt.xlabel("Length of Protein Sequence")
    plt.ylabel("Number of Sequences")
    plt.title(f"Distribution of Protein Sequences Lengths in Dataset. "
              f"NSeq={len(lengths)}")
    return save_plot(base_path)
