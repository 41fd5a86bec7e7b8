"""Retrieval serving: query FASTA against a precomputed embedding index.

Completes the offline-serving loop the reference lacks (its topk.py
re-encodes all 256 candidates once per query, /root/reference/topk.py:48-50
— a 10h SLURM job): build the index once with ``cli.embed``, then answer
queries here by encoding only the queries and ranking with one device
matmul per query batch.

    python -m protein_clip_tpu.cli.embed --checkpoint runs/<ts>/best_model.npz \
        --fasta receptors.fasta --side rec --out index.npz
    python -m protein_clip_tpu.cli.retrieve --checkpoint runs/<ts>/best_model.npz \
        --index index.npz --queries peptides.fasta --side pep --k 10 \
        --out hits.tsv

Output TSV: ``query_id<TAB>rank<TAB>hit_id<TAB>score`` (score is the scaled
dot product the training loss ranks by; pass --raw-cosine at BOTH embed and
retrieve time for raw cosines).

FILIP checkpoints retrieve by late interaction: build the index with
``embed --filip`` (ragged token-level {ids, tokens, lengths}) and pass ``--filip``
here — scores are the direction-averaged token max-sim through the fused
kernel, the ColBERT-style pattern the pooled path cannot express.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from . import common
from .embed import embed_sequences
from ..data.fasta import parse_fasta
from ..eval.embed import nearest_partners
from ..models import clip
from ..utils import prng


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--checkpoint", required=True,
                   help="best_model.npz from a training run")
    p.add_argument("--index", required=True,
                   help="npz from cli.embed ({ids, embeddings})")
    p.add_argument("--queries", required=True, help="query FASTA")
    p.add_argument("--side", default="pep", choices=["pep", "rec"],
                   help="which trained head encodes the QUERIES (the index "
                        "should hold the other side)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--out", default="-",
                   help="output TSV path ('-' = stdout)")
    p.add_argument("--raw-cosine", action="store_true",
                   help="strip the exp(t/2) scale from query embeddings "
                        "(match an index built with --raw-cosine); with "
                        "--filip, multiplies the temperature back out so "
                        "scores are raw mean-max cosines")
    p.add_argument("--filip", action="store_true",
                   help="late-interaction retrieval against a token-level "
                        "index from `embed --filip` ({ids, tokens, lengths}); "
                        "scores are direction-averaged FILIP max-sim "
                        "through the fused kernel")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    prng.set_seed(args.seed)
    esm_cfg = common.esm_config(args.esm_config, args.esm_dtype,
                                fast_gelu=args.fast_gelu,
                                exact_gelu=args.exact_gelu)
    esm_params = common.load_esm(args, esm_cfg)
    tokenizer = common.make_tokenizer()
    mcfg = clip.CLIPConfig(
        input_dim=esm_cfg.hidden_size, embedding_dim=args.embedding_dim,
        h1=args.h1, h2=args.h2, dropout=args.dropout,
        activation=args.activation, esm=esm_cfg)
    # auto-detects heads-only vs finetuned {heads, esm} vs LoRA checkpoints
    params, esm_params = common.load_clip_checkpoint(args.checkpoint, mcfg,
                                                     esm_params)

    index = np.load(args.index, allow_pickle=False)
    corpus_ids = [str(i) for i in index["ids"]]
    records = parse_fasta(args.queries)
    qids = [r[0] for r in records]

    if args.filip:
        from .embed import embed_sequences_tokens
        from ..eval.retrieval import filip_score_matrix
        from ..models import filip

        if "tokens" not in index:
            raise ValueError("--filip needs a token-level index from "
                             "`embed --filip` ({ids, tokens, lengths}); "
                             "this index holds pooled embeddings")
        corpus_t = np.asarray(index["tokens"], np.float32)
        # ragged {tokens (sum_L, D), lengths} (what embed --filip writes)
        # or a legacy dense {tokens (N, T, D), mask} index
        corpus_lens = (np.asarray(index["lengths"], np.int32)
                       if "lengths" in index else None)
        corpus_m = (np.asarray(index["mask"], np.int32)
                    if "mask" in index else None)
        if corpus_lens is None and corpus_m is None:
            raise ValueError(
                "malformed FILIP index: has 'tokens' but neither 'lengths' "
                "(ragged, what `embed --filip` writes) nor 'mask' (legacy "
                "dense) — rebuild the index with `embed --filip`")
        if corpus_t.shape[-1] != mcfg.embedding_dim:
            raise ValueError(
                f"index token dim {corpus_t.shape[-1]} != model "
                f"--embedding-dim {mcfg.embedding_dim}")
        fcfg = filip.FILIPConfig(
            input_dim=esm_cfg.hidden_size, embedding_dim=args.embedding_dim,
            h1=args.h1, h2=args.h2, dropout=args.dropout,
            activation=args.activation, esm=esm_cfg)
        q_t, q_m = embed_sequences_tokens(
            params, esm_params, [r[1] for r in records], args.side, fcfg,
            tokenizer, batch_size=args.batch_size)
        if corpus_lens is not None:
            from ..eval.retrieval import filip_score_matrix_ragged

            sim = filip_score_matrix_ragged(q_t, q_m.astype(np.int32),
                                            corpus_t, corpus_lens,
                                            params["temperature"])
        else:
            sim = filip_score_matrix(q_t, q_m.astype(np.int32), corpus_t,
                                     corpus_m, params["temperature"])
        if args.raw_cosine:
            # multiply by the SAME clamped scalar the fused kernel divides
            # by (ops/filip_pallas.py): raw params["temperature"] would give
            # wrong sign/scale if training drove t <= 0
            from ..ops.filip_pallas import clamped_temperature

            sim = sim * clamped_temperature(params["temperature"])
        k = min(args.k, len(corpus_ids))
        idx = np.argsort(-sim, axis=1)[:, :k]
        scores = np.take_along_axis(sim, idx, axis=1)
    else:
        corpus = np.asarray(index["embeddings"], np.float32)
        if corpus.shape[1] != mcfg.embedding_dim:
            raise ValueError(
                f"index embedding dim {corpus.shape[1]} != model "
                f"--embedding-dim {mcfg.embedding_dim}")
        qemb = embed_sequences(params, esm_params, [r[1] for r in records],
                               args.side, mcfg, tokenizer,
                               batch_size=args.batch_size)
        if args.raw_cosine:
            qemb = qemb / np.exp(float(params["temperature"]) / 2.0)
        k = min(args.k, len(corpus_ids))
        idx, scores = nearest_partners(qemb, corpus, k=k)

    out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        out.write("query_id\trank\thit_id\tscore\n")
        for q, qid in enumerate(qids):
            for rank in range(k):
                out.write(f"{qid}\t{rank + 1}\t{corpus_ids[idx[q, rank]]}"
                          f"\t{scores[q, rank]:.6f}\n")
    finally:
        if out is not sys.stdout:
            out.close()
    if out is not sys.stdout:
        print(f"wrote top-{k} hits for {len(qids)} queries to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
