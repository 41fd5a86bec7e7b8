"""Offline cosine-similarity eval (reference cosine_similarity.py).

Loads a saved best_model checkpoint and plots raw/trained similarity-matrix
heatmaps for the train and val loaders. The reference hard-codes its
checkpoint path (cosine_similarity.py:41); here it's --checkpoint.
"""

from __future__ import annotations

import argparse

import jax

from . import common
from ._clip_runner import similarity_fn
from ..data.dataset import PairLoader, generate_datasets
from ..models import clip
from ..utils import prng, rundir
from ..viz import plots


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--checkpoint", required=True,
                   help="best_model.npz from a training run")
    p.add_argument("--prefix-a", default="protein1")
    p.add_argument("--prefix-b", default="protein2")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    rng = prng.set_seed(args.seed)
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

    raw_params = clip.init_params(jax.random.key(0), mcfg)
    best_params, esm_params = common.load_clip_checkpoint(
        args.checkpoint, mcfg, esm_params)

    data_dir = common.ensure_data(args, args.prefix_a, args.prefix_b)
    train_ds, val_ds, _ = generate_datasets(
        data_dir, args.prefix_a, args.prefix_b, seed=args.seed)
    train_loader = PairLoader(train_ds, args.batch_size, shuffle=True,
                              drop_last=True, seed=args.seed)
    val_loader = PairLoader(val_ds, args.batch_size, shuffle=False,
                            drop_last=True, seed=args.seed)

    plots.plot_embedding_cosine_similarities(
        run_dir, "Raw Embedding Cosine Similarities", train_loader, tokenizer,
        similarity_fn(raw_params, esm_params, mcfg, tokenizer))
    plots.plot_embedding_cosine_similarities(
        run_dir, "Trained Embedding Cosine Similarities on Train Set",
        train_loader, tokenizer,
        similarity_fn(best_params, esm_params, mcfg, tokenizer))
    plots.plot_embedding_cosine_similarities(
        run_dir, "Trained Embedding Cosine Similarities on Val Set",
        val_loader, tokenizer,
        similarity_fn(best_params, esm_params, mcfg, tokenizer))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
