"""MLM masking-rate sweep entry (MLM_Testing.ipynb as a CLI).

Masks sequences at several probabilities with the '.' character (ESM vocab
id 29) and plots the realised fraction of changed token ids per probability.
"""

from __future__ import annotations

import argparse

from . import common
from ..data.fasta import sequences_only
from ..eval.mlm_sweep import plot_sweep, sweep
from ..utils import prng, rundir


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--prefix", default="peptide",
                   help="which FASTA to sample sequences from")
    p.add_argument("--n-sequences", type=int, default=200)
    p.add_argument("--probs", type=float, nargs="+",
                   default=[0.05, 0.1, 0.2, 0.3, 0.4, 0.5])
    p.add_argument("--mask-char", default=".")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    prng.set_seed(args.seed)
    run_dir = rundir.make_run_dir(args.runs_dir)
    data_dir = common.ensure_data(args, args.prefix, args.prefix)
    seqs = sequences_only(data_dir / f"{args.prefix}.fasta")[:args.n_sequences]
    result = sweep(seqs, probs=tuple(args.probs), mask_char=args.mask_char,
                   seed=args.seed)
    for p in sorted(result):
        import numpy as np
        fr = np.mean(result[p])
        print(f"p={p}: mean changed fraction {fr:.3f}")
    path = plot_sweep(run_dir, result)
    print(f"sweep plot saved to {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
