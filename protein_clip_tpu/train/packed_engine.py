"""Packed-row CLIP train step: ~95% token fill vs ~80% for length groups.

Both sides of the global batch are packed (data/packing.py) into fixed-width
rows; the backbone runs segment-masked with per-segment RoPE restart, and
per-sequence pooled sums come from a flat segment scatter-add
(``jax.ops.segment_sum``) instead of a one-hot matmul. Embeddings emerge in
original pair order, so the InfoNCE diagonal is untouched.

Row counts are rounded to a multiple of 16, so compiled shapes repeat
across batches like the length-group compositions do.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.packing import pack_sequences
from ..data.tokenizer import EsmTokenizer
from ..models import esm2, heads
from .clip_engine import EngineConfig, default_loss_fn

Params = dict[str, Any]


def tokenize_packed(tokenizer: EsmTokenizer, peps: list[str],
                    recs: list[str], pep_row_len: int = 128,
                    rec_row_len: int = 512) -> dict[str, jnp.ndarray]:
    """Pack both sides. Sequences longer than the row length are truncated
    by the tokenizer's bucket clamp (matching the single-bucket behavior)."""
    out: dict[str, jnp.ndarray] = {}
    for side, seqs, row_len in (("pep", peps, pep_row_len),
                                ("rec", recs, rec_row_len)):
        encs = []
        for s in seqs:
            e = tokenizer.encode(s)
            if len(e) > row_len:  # clamp like bucket truncation (keep eos)
                e = np.concatenate((e[: row_len - 1], [2]))
            encs.append(e)
        packed = pack_sequences(encs, row_len, row_multiple=16)
        n = packed.n_sequences
        # owner index per token: sequence id, or n for gaps
        owner = np.full(packed.ids.shape, n, np.int32)
        for i in range(n):
            r = packed.owner_row[i]
            owner[r][packed.segment_ids[r] == packed.owner_seg[i]] = i
        out[f"{side}_ids"] = jnp.asarray(packed.ids)
        out[f"{side}_seg"] = jnp.asarray(packed.segment_ids)
        out[f"{side}_pos"] = jnp.asarray(packed.positions)
        out[f"{side}_owner"] = jnp.asarray(owner)
    return out


def _encode_packed_chunked(esm_params, ids, seg, pos, cfg: esm2.ESM2Config,
                           rows_per_chunk: int, remat: bool):
    R, L = ids.shape
    n_chunks = max(1, R // rows_per_chunk)
    ids_c = ids.reshape(n_chunks, R // n_chunks, L)
    seg_c = seg.reshape(n_chunks, R // n_chunks, L)
    pos_c = pos.reshape(n_chunks, R // n_chunks, L)

    def body(_, x):
        i, s, p = x
        mask = (s > 0).astype(jnp.int32)
        h = esm2.forward(esm_params, i, mask, cfg, remat=remat,
                         segment_ids=s, positions=p)
        return None, h

    _, h = jax.lax.scan(body, None, (ids_c, seg_c, pos_c))
    return jax.lax.stop_gradient(h.reshape(R, L, -1))


def _pool_packed(head_params, hidden, seg, owner, n_seqs: int, temperature,
                 *, dropout_rate, train, rng, activation):
    """Per-sequence scaled embeddings from packed hidden states."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    proj = head_params["projection"]
    x = (jnp.einsum("rlh,hd->rld", hidden, proj["w"],
                    preferred_element_type=jnp.float32).astype(hidden.dtype)
         + proj["b"])
    x = heads.apply_ffn(head_params["aa_ffn"], x, dropout_rate=dropout_rate,
                        train=train, rng=r1, activation=activation)
    R, L, D = x.shape
    flat = x.reshape(R * L, D)
    flat_owner = owner.reshape(R * L)
    valid = (seg.reshape(R * L) > 0)[:, None].astype(flat.dtype)
    sums = jax.ops.segment_sum(flat * valid, flat_owner,
                               num_segments=n_seqs + 1)[:n_seqs]
    cnt = jax.ops.segment_sum(valid[:, 0], flat_owner,
                              num_segments=n_seqs + 1)[:n_seqs]
    pooled = sums / jnp.clip(cnt, 1.0, None)[:, None]
    pooled = heads.apply_ffn(head_params["emb_ffn"], pooled,
                             dropout_rate=dropout_rate, train=train, rng=r2,
                             activation=activation)
    normed = pooled * jax.lax.rsqrt(
        jnp.sum(jnp.square(pooled.astype(jnp.float32)), axis=-1,
                keepdims=True).astype(pooled.dtype)
        + jnp.finfo(jnp.float32).tiny)
    return normed * jnp.exp(temperature.astype(normed.dtype) / 2.0)


def make_train_step_packed(cfg: EngineConfig,
                           optimizer: optax.GradientTransformation,
                           loss_fn: Callable | None = None,
                           rows_per_chunk: int = 16):
    loss_fn = loss_fn or default_loss_fn()
    mcfg = cfg.model
    n_seqs = cfg.global_batch

    def head_loss(params, hp, hr, batch, rng):
        rp, rr = jax.random.split(rng)
        pep = _pool_packed(params["pep"], hp, batch["pep_seg"],
                           batch["pep_owner"], n_seqs, params["temperature"],
                           dropout_rate=mcfg.dropout, train=True, rng=rp,
                           activation=mcfg.activation)
        rec = _pool_packed(params["rec"], hr, batch["rec_seg"],
                           batch["rec_owner"], n_seqs, params["temperature"],
                           dropout_rate=mcfg.dropout, train=True, rng=rr,
                           activation=mcfg.activation)
        return loss_fn(pep, rec)

    @jax.jit
    def step(params, opt_state, esm_params, batch, rng):
        if "pep_seg" not in batch:
            raise ValueError(
                "packed step needs tokenize_packed batches (cfg.packed=True "
                "pairs with the packed tokenizer; got a plain batch)")
        hp = _encode_packed_chunked(esm_params, batch["pep_ids"],
                                    batch["pep_seg"], batch["pep_pos"],
                                    mcfg.esm, rows_per_chunk, cfg.remat)
        hr = _encode_packed_chunked(esm_params, batch["rec_ids"],
                                    batch["rec_seg"], batch["rec_pos"],
                                    mcfg.esm, rows_per_chunk, cfg.remat)
        loss, grads = jax.value_and_grad(head_loss)(
            params, hp.astype(jnp.float32), hr.astype(jnp.float32),
            batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
