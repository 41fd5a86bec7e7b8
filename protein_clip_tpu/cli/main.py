"""Peptide–receptor CLIP training entry (reference main.py).

Same run recipe with the same defaults: frozen ESM-2 t30 backbone, dual
128-d heads (h1=h2=2, dropout 0.1), Adam 1e-3, batch 16 x accumulation 16
= 256 global negatives, 25 epochs, best-val checkpointing, similarity
heatmaps + loss curves into runs/<timestamp>/.
"""

from __future__ import annotations

import argparse

from . import common
from ._clip_runner import run_clip_training


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    common.add_mesh_args(p)
    p.add_argument("--epochs", type=int, default=25)          # main.py:44
    p.add_argument("--accumulated-batches", type=int, default=16)
    p.add_argument("--no-gradcache", action="store_true",
                   help="plain per-batch training (main.py:46-49 switch)")
    p.add_argument("--epoch-figures", action="store_true",
                   help="per-epoch similarity heatmaps (heavy)")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    common.maybe_init_distributed(args)
    return run_clip_training(args, prefix_a="peptide", prefix_b="receptor")


if __name__ == "__main__":
    raise SystemExit(main())
