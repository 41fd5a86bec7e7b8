"""Top-k retrieval eval entry (reference topk.py).

Rank of the true partner among --n-candidates (256) for every query, plotted
as a cumulative top-k accuracy curve against the shuffled-random baseline.
The reference re-encodes all 256 candidates per query (10h SLURM walltime,
run-topk.sh); encoding each side once makes this a seconds-scale eval with
identical ranks (eval/retrieval.py).
"""

from __future__ import annotations

import argparse

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import jax

from . import common
from ..data.dataset import PairLoader, generate_datasets
from ..eval.retrieval import evaluate_retrieval
from ..models import clip
from ..utils import prng, rundir
from ..viz.plots import save_plot


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--n-candidates", type=int, default=256)
    p.add_argument("--filip", action="store_true",
                   help="late-interaction retrieval for a FILIP checkpoint "
                        "(token-level max-sim scores via the fused kernel; "
                        "the reference's topk.py only covers pooled CLIP)")
    # (--packed comes from the shared args: here it selects sequence-packed
    # candidate encoding — ~95% token fill, identical ranks)
    p.add_argument("--prefix-a", default="protein1")
    p.add_argument("--prefix-b", default="protein2")
    p.add_argument("--split", default="val", choices=["train", "val", "test"])
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    prng.set_seed(args.seed)
    run_dir = rundir.make_run_dir(args.runs_dir)
    print(f"All run info will be saved to {run_dir}")

    esm_cfg = common.esm_config(args.esm_config, args.esm_dtype,
                                fast_gelu=args.fast_gelu,
                                exact_gelu=args.exact_gelu)
    esm_params = common.load_esm(args, esm_cfg)
    tokenizer = common.make_tokenizer()
    mcfg = clip.CLIPConfig(
        input_dim=esm_cfg.hidden_size, embedding_dim=args.embedding_dim,
        h1=args.h1, h2=args.h2, dropout=args.dropout,
        activation=args.activation, esm=esm_cfg)
    params, esm_params = common.load_clip_checkpoint(args.checkpoint, mcfg,
                                                     esm_params)

    data_dir = common.ensure_data(args, args.prefix_a, args.prefix_b)
    datasets = dict(zip(
        ("train", "val", "test"),
        generate_datasets(data_dir, args.prefix_a, args.prefix_b,
                          seed=args.seed)))
    loader = PairLoader(datasets[args.split], args.batch_size, shuffle=False,
                        drop_last=True, seed=args.seed)

    if args.filip:
        from ..eval.retrieval import evaluate_filip_retrieval
        from ..models import filip

        fcfg = filip.FILIPConfig(
            input_dim=esm_cfg.hidden_size, embedding_dim=args.embedding_dim,
            h1=args.h1, h2=args.h2, dropout=args.dropout,
            activation=args.activation, esm=esm_cfg)
        result = evaluate_filip_retrieval(
            params, esm_params, loader, tokenizer, fcfg,
            n_candidates=args.n_candidates, num_chunks=args.num_chunks)
    else:
        result = evaluate_retrieval(params, esm_params, loader, tokenizer,
                                    mcfg, n_candidates=args.n_candidates,
                                    packed=args.packed)
    print(f"top-1 accuracy: {result.top1:.4f}")
    if args.n_candidates >= 10:
        print(f"top-10 accuracy: {result.accuracies[9]:.4f}")
    print(f"mean rank: {result.ranks.mean():.1f} / {args.n_candidates}")

    k_vals = np.linspace(0, args.n_candidates, args.n_candidates)
    plt.figure(figsize=(6, 4))
    plt.plot(k_vals, result.accuracies, label="Model Top-k accuracy",
             color="blue")
    plt.plot(k_vals, result.random_accuracies, label="Random Top-k accuracy",
             color="orange")
    plt.title("Top-k Val Accuracy")
    plt.ylabel("Accuracy")
    plt.xlabel("Top-k")
    plt.legend()
    path = save_plot(run_dir)
    print(f"Top-k Val Accuracy plot saved to {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
