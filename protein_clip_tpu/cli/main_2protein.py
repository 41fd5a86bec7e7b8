"""Protein–protein CLIP training entry (reference main_2protein.py).

PDB two-chain pairs (protein1/protein2 FASTAs), ingest filter len<=2000
(data_utils_2protein.py:88), 20 epochs (main_2protein.py:45), cluster-size
histogram artifact, otherwise the main.py recipe.
"""

from __future__ import annotations

import argparse

from . import common
from ._clip_runner import run_clip_training


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    common.add_mesh_args(p)
    p.add_argument("--epochs", type=int, default=20)   # main_2protein.py:45
    p.add_argument("--accumulated-batches", type=int, default=16)
    p.add_argument("--no-gradcache", action="store_true")
    p.add_argument("--epoch-figures", action="store_true")
    p.add_argument("--max-sequence-length", type=int, default=2000)
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    common.maybe_init_distributed(args)
    return run_clip_training(
        args, prefix_a="protein1", prefix_b="protein2", plot_cluster=True,
        max_sequence_length=args.max_sequence_length)


if __name__ == "__main__":
    raise SystemExit(main())
