"""Embedding/serving entry: embed a FASTA through a trained checkpoint.

Writes <out>.npz with {'ids', 'embeddings'}; optionally answers top-k
nearest-partner queries against a second embedded FASTA.
"""

from __future__ import annotations

import argparse

import numpy as np
import jax

from . import common
from ..data.fasta import parse_fasta
from ..eval.embed import Embedder, nearest_partners
from ..models import clip
from ..train.checkpoint import load_npz


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--fasta", required=True)
    p.add_argument("--side", default="rec", choices=["pep", "rec"])
    p.add_argument("--out", required=True, help="output npz path")
    p.add_argument("--query-fasta", default=None,
                   help="embed with the other side and print top-k partners")
    p.add_argument("--top-k", type=int, default=5)
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    esm_cfg = common.esm_config(args.esm_config, args.esm_dtype)
    esm_params = common.load_esm(args, esm_cfg)
    mcfg = clip.CLIPConfig(
        input_dim=esm_cfg.hidden_size, embedding_dim=args.embedding_dim,
        h1=args.h1, h2=args.h2, dropout=args.dropout,
        activation=args.activation, esm=esm_cfg)
    params = load_npz(args.checkpoint,
                      clip.init_params(jax.random.key(0), mcfg))

    records = parse_fasta(args.fasta)
    ids = [r for r, _ in records]
    seqs = [s for _, s in records]
    embedder = Embedder(params, esm_params, mcfg, side=args.side,
                        batch_size=min(args.batch_size * 4, 64))
    emb = embedder(seqs)
    np.savez(args.out, ids=np.array(ids), embeddings=emb)
    print(f"embedded {len(seqs)} sequences -> {args.out}")

    if args.query_fasta:
        qrecords = parse_fasta(args.query_fasta)
        other = "pep" if args.side == "rec" else "rec"
        qembedder = Embedder(params, esm_params, mcfg, side=other,
                             batch_size=min(args.batch_size * 4, 64))
        qemb = qembedder([s for _, s in qrecords])
        idx, scores = nearest_partners(qemb, emb, k=args.top_k)
        for qi, (qid, _) in enumerate(qrecords):
            hits = ", ".join(f"{ids[j]}:{scores[qi, n]:.3f}"
                             for n, j in enumerate(idx[qi]))
            print(f"{qid} -> {hits}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
