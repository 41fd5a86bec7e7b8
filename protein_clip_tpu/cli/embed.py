"""Bulk sequence embedding: FASTA in, embeddings out (serving path).

The reference has no offline-embedding story — every eval re-runs the
model end to end (topk.py re-encodes 256 candidates per query). This
entry encodes a FASTA once with a trained CLIP head and writes an npz of
{ids, embeddings} for downstream retrieval/indexing, batched at a static
bucket per length group so XLA compiles a handful of shapes.

    python -m protein_clip_tpu.cli.embed --checkpoint runs/<ts>/best_model.npz \
        --fasta data/protein1.fasta --side pep --out embeddings.npz
"""

from __future__ import annotations

import argparse

import numpy as np
import jax

from . import common
from ..data.fasta import parse_fasta
from ..models import clip
from ..utils import prng


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--checkpoint", required=True,
                   help="best_model.npz from a training run")
    p.add_argument("--fasta", required=True)
    p.add_argument("--side", default="pep", choices=["pep", "rec"],
                   help="which trained encoder head to apply")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--raw-cosine", action="store_true",
                   help="strip the exp(t/2) scale so dot products are raw "
                        "cosines (visualizations.py:38-52 de-scaling)")
    p.add_argument("--filip", action="store_true",
                   help="token-level index for a FILIP checkpoint: writes "
                        "a RAGGED {ids, tokens (sum_L, D), lengths (N,)} "
                        "npz (length-sorted rows, trimmed to true length) "
                        "for late-interaction retrieval (retrieve --filip)")
    return p


from functools import lru_cache


@lru_cache(maxsize=None)
def _encode_fn(side: str, mcfg):
    """jit'd encoder SHARED across embed_sequences calls (configs are
    frozen/hashable dataclasses). A fresh ``@jax.jit`` inside each call
    is a new cache key, so every call retraces — measured as the serving
    latency bug: 1.78 s p50 per single-sequence /embed request before
    hoisting (docs/PERF.md)."""
    import jax.numpy as jnp

    from ..data.tokenizer import PAD_ID
    from ..models import esm2 as esm2_mod

    @jax.jit
    def encode(params, esm_params, ids):
        ids = ids.astype(jnp.int32)
        mask = (ids != PAD_ID).astype(jnp.int32)
        hidden = esm2_mod.forward(esm_params, ids, mask, mcfg.esm)
        return clip.encode_side(params, side, hidden.astype(jnp.float32),
                                mask, mcfg, train=False)

    return encode


@lru_cache(maxsize=None)
def _encode_tokens_fn(side: str, fcfg):
    """jit'd FILIP token-level encoder, hoisted like ``_encode_fn`` (same
    retrace trap: a per-call @jax.jit is a fresh cache key)."""
    import jax.numpy as jnp

    from ..data.tokenizer import PAD_ID
    from ..models import esm2 as esm2_mod
    from ..models import filip as filip_mod

    @jax.jit
    def encode(params, esm_params, ids):
        ids = ids.astype(jnp.int32)
        mask = (ids != PAD_ID).astype(jnp.int32)
        hidden = esm2_mod.forward(esm_params, ids, mask, fcfg.esm)
        toks = filip_mod.encode_side_tokens(
            params, side, hidden.astype(jnp.float32), fcfg, train=False)
        return toks, mask

    return encode


def embed_sequences_tokens(params, esm_params, seqs, side, fcfg, tokenizer,
                           batch_size: int = 64, pad_batch: bool = False):
    """FILIP token-level encode: -> (tokens (N, T, D) float32 L2-normalised,
    mask (N, T) int8), T = the longest length bucket seen. Length-sorted
    bucket batches like ``embed_sequences``; rows return in input order,
    right-padded (zero tokens, zero mask) to the common T.

    pad_batch mirrors ``embed_sequences``: pow2 row counts with
    empty-sequence filler rows so serving-path group sizes hit a finite
    jit shape set (filler sliced off before returning).
    """
    order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
    encode = _encode_tokens_fn(side, fcfg)
    toks_by_idx: dict[int, np.ndarray] = {}
    mask_by_idx: dict[int, np.ndarray] = {}
    t_max = 0
    for start in range(0, len(order), batch_size):
        idx = order[start:start + batch_size]
        batch_seqs = [seqs[i] for i in idx]
        if pad_batch:
            n = 1
            while n < len(idx):
                n *= 2
            batch_seqs += [""] * (min(n, batch_size) - len(idx))
        enc = tokenizer(batch_seqs)
        import jax.numpy as jnp
        ids = jnp.asarray(enc["input_ids"].astype(np.int8))
        toks, mask = encode(params, esm_params, ids)
        toks = np.asarray(toks, np.float32)
        mask = np.asarray(mask, np.int8)
        t_max = max(t_max, toks.shape[1])
        for row, i in enumerate(idx):
            toks_by_idx[i] = toks[row]
            mask_by_idx[i] = mask[row]
    n, d = len(seqs), fcfg.embedding_dim
    out_t = np.zeros((n, t_max, d), np.float32)
    out_m = np.zeros((n, t_max), np.int8)
    for i in range(n):
        t = toks_by_idx[i].shape[0]
        out_t[i, :t] = toks_by_idx[i]
        out_m[i, :t] = mask_by_idx[i]
    return out_t, out_m


def embed_sequences_tokens_ragged(params, esm_params, seqs, side, fcfg,
                                  tokenizer, batch_size: int = 64):
    """FILIP token-level encode, RAGGED: -> (flat (sum_L, D) float32,
    lengths (N,) int32), rows trimmed to each sequence's true token length
    and concatenated in input order.

    This is the bulk-index path: the dense ``embed_sequences_tokens``
    materialises (N, T_max, D) on host, so ONE long outlier in a large
    FASTA pads every row to its length (1M seqs at T=512, D=128 is ~260 GB
    — ADVICE r3). Ragged storage is the true data size; consumers densify
    per column block (eval/retrieval.filip_score_matrix_ragged).
    """
    import jax.numpy as jnp

    order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
    encode = _encode_tokens_fn(side, fcfg)
    rows: list[np.ndarray | None] = [None] * len(seqs)
    lengths = np.zeros(len(seqs), np.int32)
    for start in range(0, len(order), batch_size):
        idx = order[start:start + batch_size]
        enc = tokenizer([seqs[i] for i in idx])
        ids = jnp.asarray(enc["input_ids"].astype(np.int8))
        toks, mask = encode(params, esm_params, ids)
        toks = np.asarray(toks, np.float32)
        mask = np.asarray(mask, np.int8)
        for row, i in enumerate(idx):
            true_len = int(mask[row].sum())
            rows[i] = toks[row, :true_len]
            lengths[i] = true_len
    flat = (np.concatenate(rows, axis=0) if rows
            else np.zeros((0, fcfg.embedding_dim), np.float32))
    return flat, lengths


def embed_sequences(params, esm_params, seqs, side, mcfg, tokenizer,
                    batch_size: int = 64, pad_batch: bool = False):
    """Encode sequences -> (N, D) float32, length-sorted internally so each
    jit shape is a (batch, bucket) pair; results return in input order.

    pad_batch: round each batch's ROW count up to the next power of two
    (capped at batch_size) with empty-sequence filler rows, so the jit
    shape set is {pow2 x bucket} instead of one program per exact request
    size. Offline bulk encodes don't care (full batches + one tail), but
    the serving path does: request/coalesced-group sizes vary freely, and
    on TPU every unseen row count would stall a cold compile mid-request.
    Filler rows are real (CLS, EOS) sequences — cheap, numerically inert,
    sliced off before returning — rather than all-PAD rows, which would
    hit the token-dropout true-length-0 division in the backbone.
    """
    import jax.numpy as jnp

    order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
    out = np.zeros((len(seqs), mcfg.embedding_dim), np.float32)
    encode = _encode_fn(side, mcfg)

    for start in range(0, len(order), batch_size):
        idx = order[start:start + batch_size]
        batch_seqs = [seqs[i] for i in idx]
        if pad_batch:
            n = 1
            while n < len(idx):
                n *= 2
            batch_seqs += [""] * (min(n, batch_size) - len(idx))
        enc = tokenizer(batch_seqs)
        ids = jnp.asarray(enc["input_ids"].astype(np.int8))
        emb = np.asarray(encode(params, esm_params, ids), np.float32)
        out[idx] = emb[: len(idx)]
    return out


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
    # (the head pytree is structure-identical for CLIP and FILIP)
    params, esm_params = common.load_clip_checkpoint(args.checkpoint, mcfg,
                                                     esm_params)

    records = parse_fasta(args.fasta)
    ids = [r[0] for r in records]
    seqs = [r[1] for r in records]
    if args.filip:
        from ..models import filip

        fcfg = filip.FILIPConfig(
            input_dim=esm_cfg.hidden_size, embedding_dim=args.embedding_dim,
            h1=args.h1, h2=args.h2, dropout=args.dropout,
            activation=args.activation, esm=esm_cfg)
        # Ragged index: rows trimmed to true length (host RAM = data size,
        # not N x global-max — ADVICE r3), stored length-sorted so the
        # scorer's densified column blocks stay tight and few-shaped.
        order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
        ids = [ids[i] for i in order]
        seqs = [seqs[i] for i in order]
        flat, lengths = embed_sequences_tokens_ragged(
            params, esm_params, seqs, args.side, fcfg, tokenizer,
            batch_size=args.batch_size)
        np.savez(args.out, ids=np.asarray(ids), tokens=flat,
                 lengths=lengths)
        print(f"wrote {len(ids)} ragged token embeddings "
              f"({flat.shape[0]} x {flat.shape[1]} total) to {args.out}")
        return 0
    emb = embed_sequences(params, esm_params, seqs, args.side, mcfg,
                          tokenizer, batch_size=args.batch_size)
    if args.raw_cosine:
        emb = emb / np.exp(float(params["temperature"]) / 2.0)
    np.savez(args.out, ids=np.asarray(ids), embeddings=emb)
    print(f"wrote {len(ids)} x {emb.shape[1]} embeddings to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
