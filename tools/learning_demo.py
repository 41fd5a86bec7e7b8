"""End-to-end learning demonstration.

Trains the CLIP pipeline on a *correlated* synthetic corpus (each receptor
contains its peptide as a planted motif) and shows retrieval beating the
random baseline — evidence the whole stack (tokenize -> frozen backbone ->
heads -> global InfoNCE -> Adam -> retrieval) learns, without needing
pretrained ESM weights or network access.

Run: python tools/learning_demo.py [--epochs 40] [--platform cpu|tpu]
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--n-candidates", type=int, default=64)
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # "tpu": leave the ambient platform (the axon plugin registers under
    # its own name and auto-selects; forcing "tpu" fails on the tunnel)
    import numpy as np

    from protein_clip_tpu.data import synthetic
    from protein_clip_tpu.data.dataset import (ClusterPairDataset, PairLoader)
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.eval.retrieval import evaluate_retrieval
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.train import clip_engine, loop

    # correlated corpus: singleton clusters (one pair each) so train/eval
    # measure motif matching, not cluster memorisation
    peps, recs = synthetic.make_pair_corpus(
        n_families=256, members_per_family=(1, 1), correlated=True,
        receptor_len=(40, 80), peptide_len=(8, 16), seed=7)
    clusters = {f"c{i}": [(peps[i], recs[i])] for i in range(len(peps))}
    ids = list(clusters)
    train_ds = ClusterPairDataset(clusters, ids[:192], seed=0)
    val_ds = ClusterPairDataset(clusters, ids[192:], seed=1)
    train_loader = PairLoader(train_ds, 16, shuffle=True, drop_last=True,
                              seed=0)
    val_loader = PairLoader(val_ds, 16, shuffle=False, drop_last=True, seed=0)

    esm_cfg = esm2.ESM2Config(hidden_size=64, num_layers=2, num_heads=4,
                              intermediate_size=128)
    mcfg = clip.CLIPConfig(input_dim=64, embedding_dim=32, h1=2, h2=2,
                           dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = clip.init_params(jax.random.key(1), mcfg)
    tok = EsmTokenizer()

    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=16,
                                   accumulated_batches=4, num_chunks=4)

    before = evaluate_retrieval(params, esm_params, train_loader, tok, mcfg,
                                n_candidates=args.n_candidates, seed=0)
    with tempfile.TemporaryDirectory() as d:
        result = loop.fit(d, cfg, params, esm_params, train_loader,
                          val_loader, tok, args.epochs,
                          rng=jax.random.key(2), log=lambda s: None)
    after = evaluate_retrieval(result.best_params, esm_params, train_loader,
                               tok, mcfg, n_candidates=args.n_candidates,
                               seed=0)
    rand_top1 = 1.0 / args.n_candidates
    print(f"loss: {result.train_losses[0]:.3f} -> "
          f"{result.train_losses[-1]:.3f}")
    print(f"top-1 retrieval over {args.n_candidates}: "
          f"before {before.top1:.3f}, after {after.top1:.3f} "
          f"(random {rand_top1:.3f})")
    print(f"mean rank: before {before.ranks.mean():.1f}, "
          f"after {after.ranks.mean():.1f}")
    assert after.top1 > 5 * rand_top1, "model failed to learn"
    print("LEARNING DEMO OK")


if __name__ == "__main__":
    main()
