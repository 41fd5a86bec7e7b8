"""Packed-row FILIP training: the backbone runs at ~95% token fill.

The FILIP step is ~95% frozen-backbone work (docs/PERF.md trace), so padding
waste in the backbone IS the FILIP throughput problem. This path reuses the
CLIP packed machinery (train/packed_engine.py: compact int8 wire, on-device
segment/position/owner maps, segment-masked attention with per-segment RoPE
restart) and adds the one FILIP-specific step: after the per-token head runs
on packed rows, tokens scatter back into per-sequence (B, T, D) tensors for
the fused max-similarity kernel (ops/filip_pallas.py), which needs aligned
token axes per pair. T is the packed row length — the batch max sequence
length rounded to 128 (train/packed_engine._row_len_for), i.e. exactly the
tight bucket.

Token embeddings are L2-normalised BEFORE the scatter so empty slots stay
exact zeros (normalising after would divide 0/0); zero vectors are masked
out of the similarity by the kernel's pad mask.

Reference: main_2protein_filip.py runs batch 10 unpacked (models.py:332
materialises the (B,B,TA,TB) tensor); this path trains batch 128+ packed.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models import filip, heads
from ..ops.infonce import filip_loss
from .clip_engine import EngineConfig
from .filip_engine import default_similarity_fn
from .packed_engine import (_encode_packed_chunked, expand_packed_batch,
                            packed_side_count, tokenize_packed)

Params = dict[str, Any]

__all__ = ["tokenize_packed", "make_train_step_packed_filip",
           "make_eval_step_packed_filip", "filip_sim_packed"]


def _scatter_tokens_into(out, mask, x, seg, pos, owner, n_seqs: int):
    """Scatter one pack's tokens (R, L, D) into the shared per-sequence
    buffers out (n_seqs+1, T, D) / mask (n_seqs+1, T) with L <= T. Gap/pad
    tokens route to a dump row (owner == n_seqs, the expand_packed_batch
    sentinel) that is sliced off; tiers own disjoint sequences, so
    sequential scatters never collide."""
    R, L, D = x.shape
    flat = x.reshape(R * L, D)
    valid = seg.reshape(R * L) > 0
    # pos counts from <cls>=0, matching the unpacked layout exactly: the
    # reference's FILIP mask keeps <cls>/<eos> tokens in the similarity
    # (models.py:333-335 uses the attention mask), so packed must too.
    o = jnp.where(valid, owner.reshape(R * L), n_seqs)
    p = jnp.where(valid, pos.reshape(R * L), 0)
    out = out.at[o, p].set(flat.astype(out.dtype))
    mask = mask.at[o, p].set(valid.astype(jnp.int32))
    return out, mask


def _scatter_by_tiers(x, pk, stiers, n_seqs: int, emb_dim: int):
    """Scatter one flat pack's normalised tokens into per-length-tier
    buffers. stiers: tuple of {"operm": (B_t,) global indices, "wmark":
    (W_t,) shape-only width marker} from tokenize_packed(scatter_tiers>1).

    Returns [(tokens (B_t, W_t, D), mask (B_t, W_t), operm (B_t,)), ...]
    for the tier-pair block assembly. Every token lands in exactly one
    tier (its sequence's narrowest fitting width), so total scatter bytes
    SHRINK vs the flat (n_seqs, L, D) buffer while the backbone pack —
    and its ~95% fill — is untouched.
    """
    # global index -> (tier, local slot), built from the tier operms
    g2t = jnp.zeros((n_seqs,), jnp.int32)
    g2l = jnp.zeros((n_seqs,), jnp.int32)
    for t, st in enumerate(stiers):
        op = st["operm"]
        g2t = g2t.at[op].set(t)
        g2l = g2l.at[op].set(jnp.arange(op.shape[0], dtype=jnp.int32))

    owner = pk["owner"]                       # (R, L), n_seqs = dump
    seg = pk["seg"]
    pos = pk["pos"]
    R, L, D = x.shape
    flat = x.reshape(R * L, D)
    own_f = owner.reshape(R * L)
    pos_f = pos.reshape(R * L)
    valid = (seg.reshape(R * L) > 0) & (own_f < n_seqs)
    own_c = jnp.clip(own_f, 0, n_seqs - 1)
    tok_tier = jnp.where(valid, g2t[own_c], -1)
    tok_local = g2l[own_c]

    tiers = []
    for t, st in enumerate(stiers):
        b_t = st["operm"].shape[0]
        w_t = st["wmark"].shape[0]
        in_t = tok_tier == t
        o = jnp.where(in_t, tok_local, b_t)
        p = jnp.where(in_t, pos_f, 0)         # in-tier pos < len <= W_t
        out = jnp.zeros((b_t + 1, w_t, D), jnp.float32)
        mask = jnp.zeros((b_t + 1, w_t), jnp.int32)
        out = out.at[o, p].set(flat.astype(out.dtype))
        mask = mask.at[o, p].set(in_t.astype(jnp.int32))
        tiers.append((out[:b_t], mask[:b_t], st["operm"]))
    return tiers


def _side_packs(batch, side: str) -> list[dict]:
    if f"{side}_packs" in batch:
        return list(batch[f"{side}_packs"])
    return [{k: batch[f"{side}_{k}"] for k in ("ids", "seg", "pos", "owner")}]


def _l2_normalize_tokens(x):
    """L2-normalise token embeddings BEFORE any scatter so empty slots stay
    exact zeros (normalising after would divide 0/0)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)),
                            axis=-1, keepdims=True)
                    + jnp.finfo(jnp.float32).tiny)
    return (x.astype(jnp.float32) / norm).astype(x.dtype)


def _scatter_side(x, pk, stiers, n_seqs: int, emb_dim: int):
    """One flat pack's normalised tokens -> tier list for _sim_from_tiers:
    per-length-tier buffers when stiers is set, else one global
    (n_seqs, L, D) buffer."""
    if stiers:
        return _scatter_by_tiers(x, pk, stiers, n_seqs, emb_dim)
    L = pk["ids"].shape[1]
    out = jnp.zeros((n_seqs + 1, L, emb_dim), jnp.float32)
    mask = jnp.zeros((n_seqs + 1, L), jnp.int32)
    out, mask = _scatter_tokens_into(out, mask, x, pk["seg"], pk["pos"],
                                     pk["owner"], n_seqs)
    return [(out[:n_seqs], mask[:n_seqs], None)]


def _sim_from_tiers(tiers_pep, tiers_rec, t, sim_fn, n_seqs: int):
    """(sim_a, sim_b) (n_seqs, n_seqs) from per-side tier lists of
    (tokens (B_t, W_t, D), mask (B_t, W_t), operm-or-None)."""
    if (len(tiers_pep) == 1 and len(tiers_rec) == 1
            and tiers_pep[0][2] is None and tiers_rec[0][2] is None):
        # flat path only: a single SCATTER tier still carries an operm
        # whose count pads to a multiple of 8 with the sentinel n_seqs —
        # its raw (B_t, B_t) matrix holds permuted rows plus phantom
        # all-masked rows, so it must go through the assembly below
        # (caught by the batch-4 CLI mesh parity test: the shortcut
        # returned an (8, 8) loss for a 4-pair batch)
        (ha, mask_a, _), (hb, mask_b, _) = tiers_pep[0], tiers_rec[0]
        return sim_fn(ha, hb, mask_a, mask_b, t)
    # Assemble into an (n+1, n+1) buffer and slice: scatter-tier operms pad
    # to shape-stable counts with the sentinel index n_seqs, and the DUMP
    # row/col keeps those writes IN BOUNDS. An out-of-bounds scatter would
    # drop them on the forward — but its transpose is a gather whose
    # out-of-bounds FILL is NaN, and the fused kernel's hand-written
    # backward multiplies (not selects) by the pad mask, so NaN * 0 = NaN
    # poisoned every gradient (bench params went NaN after one step; the
    # lax path hid it because jnp.where's select blocks NaN).
    sim_a = jnp.zeros((n_seqs + 1, n_seqs + 1), jnp.float32)
    sim_b = jnp.zeros((n_seqs + 1, n_seqs + 1), jnp.float32)
    for ha, mask_a, ixa in tiers_pep:
        ia = jnp.arange(n_seqs) if ixa is None else ixa
        for hb, mask_b, ixb in tiers_rec:
            ib = jnp.arange(n_seqs) if ixb is None else ixb
            sa, sb = sim_fn(ha, hb, mask_a, mask_b, t)
            sim_a = sim_a.at[ia[:, None], ib[None, :]].set(sa)
            sim_b = sim_b.at[ia[:, None], ib[None, :]].set(sb)
    return sim_a[:n_seqs, :n_seqs], sim_b[:n_seqs, :n_seqs]


def filip_sim_packed(params: Params, esm_params: Params, batch,
                     cfg: filip.FILIPConfig, n_seqs: int, *,
                     rows_per_chunk: int = 16, remat: bool = True,
                     train: bool = False, rng=None, similarity_fn=None):
    """(sim_a, sim_b) from an expanded packed batch (flat or width-tiered).

    A flat side scatters all tokens into one (n_seqs, T, D) tensor (global
    owners). A tiered side keeps PER-TIER (B_t, T_t, D) tensors at each
    tier's own width (local owners) and the (n_seqs, n_seqs) similarity
    assembles from tier-pair kernel blocks — the max-sim kernel already
    takes rectangular (Ba, TA) x (Bb, TB) grids, so a 2048-token tail tier
    never inflates the score work of the 512-token bulk (a scatter into one
    (n_seqs, T_max, D) buffer measured a wash on the longtail profile: the
    kernel cost at T_max swamped the backbone savings — docs/PERF.md).

    Token embeddings L2-normalise BEFORE the scatter so empty slots stay
    exact zeros; the kernel's pad mask ignores them.
    """
    sim_fn = similarity_fn or default_similarity_fn()
    rp = rr = None
    if rng is not None:
        rp, rr = jax.random.split(rng)
    # bf16 token heads measured a wash (359.4 vs 359.1 pairs/s): the head
    # pass is bandwidth/scatter-bound, not matmul-bound — keep f32
    # (docs/PERF.md round 4 negative results).
    sides = {}
    for side, r in (("pep", rp), ("rec", rr)):
        packs = _side_packs(batch, side)
        stiers = batch.get(f"{side}_stiers")
        t_out = max(p["ids"].shape[1] for p in packs)
        tiers = []
        for k, pk in enumerate(packs):
            # constant tokens per chunk across tiers (see packed_engine)
            h = _encode_packed_chunked(
                esm_params, pk["ids"], pk["seg"], pk["pos"], cfg.esm,
                rows_per_chunk * (t_out // pk["ids"].shape[1]), remat)
            rk = (jax.random.fold_in(r, k)
                  if r is not None and len(packs) > 1 else r)
            x = heads.encode_tokens(params[side], h.astype(jnp.float32),
                                    dropout_rate=cfg.dropout, train=train,
                                    rng=rk, activation=cfg.activation)
            x = _l2_normalize_tokens(x)
            if len(packs) == 1:
                # scatter-tier path (VERDICT r2 #2) when stiers is set: ONE
                # flat backbone pack at full fill, but tokens scatter into
                # per-length-tier (B_t, W_t, D) buffers — the (B, B) score
                # then assembles from tier-pair kernel blocks whose work
                # tracks true lengths, not the global row width.
                tiers = _scatter_side(x, pk, stiers, n_seqs,
                                      cfg.embedding_dim)
                break
            n_t = pk["operm"].shape[0]
            L = pk["ids"].shape[1]
            out = jnp.zeros((n_t + 1, L, cfg.embedding_dim), jnp.float32)
            mask = jnp.zeros((n_t + 1, L), jnp.int32)
            out, mask = _scatter_tokens_into(out, mask, x, pk["seg"],
                                             pk["pos"], pk["local_owner"],
                                             n_t)
            tiers.append((out[:n_t], mask[:n_t], pk["operm"]))
        sides[side] = tiers
    return _sim_from_tiers(sides["pep"], sides["rec"], params["temperature"],
                           sim_fn, n_seqs)


def make_eval_step_packed_filip(cfg: EngineConfig,
                                similarity_fn: Callable | None = None,
                                use_dcl: bool | None = None,
                                rows_per_chunk: int | None = None):
    """Packed FILIP eval: the train step's packed similarity without grads
    or dropout; batch size inferred from the batch's operm shapes (val
    loaders yield cfg.batch_size pairs)."""
    if rows_per_chunk is None:
        rows_per_chunk = int(os.environ.get("PCT_ROWS_PER_CHUNK", "16"))
    mcfg = cfg.model
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl

    @jax.jit
    def step(params, esm_params, batch):
        if not any(k in batch for k in
                   ("pep_operm", "pep_seg", "pep_packs")):
            raise ValueError(
                "packed FILIP eval step needs tokenize_packed batches")
        n_seqs = packed_side_count(batch, "pep")
        batch = expand_packed_batch(batch)
        sim_a, sim_b = filip_sim_packed(
            params, esm_params, batch, mcfg, n_seqs,
            rows_per_chunk=rows_per_chunk, remat=cfg.remat, train=False,
            rng=None, similarity_fn=similarity_fn)
        return filip_loss(sim_a, sim_b, use_dcl)

    return step


def make_train_step_packed_filip(cfg: EngineConfig,
                                 optimizer: optax.GradientTransformation,
                                 similarity_fn: Callable | None = None,
                                 use_dcl: bool | None = None,
                                 rows_per_chunk: int | None = None):
    """jit'd FILIP train step over tokenize_packed batches. Note FILIP has
    no grad accumulation (reference main_2protein_filip.py:63), so the
    packed sequence count is cfg.batch_size, not global_batch."""
    if rows_per_chunk is None:
        rows_per_chunk = int(os.environ.get("PCT_ROWS_PER_CHUNK", "16"))
    mcfg = cfg.model
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    n_seqs = cfg.batch_size

    def loss_fn(params, esm_params, batch, rng):
        sim_a, sim_b = filip_sim_packed(
            params, esm_params, batch, mcfg, n_seqs,
            rows_per_chunk=rows_per_chunk, remat=cfg.remat, train=True,
            rng=rng, similarity_fn=similarity_fn)
        return filip_loss(sim_a, sim_b, use_dcl)

    @jax.jit
    def step(params, opt_state, esm_params, batch, rng):
        if not any(k in batch for k in
                   ("pep_operm", "pep_seg", "pep_packs")):
            raise ValueError(
                "packed FILIP step needs tokenize_packed batches")
        if "pep_operm" in batch or "pep_packs" in batch:
            for side in ("pep", "rec"):
                got = packed_side_count(batch, side)
                if got != n_seqs:
                    raise ValueError(
                        f"packed batch has {got} {side} sequences but "
                        f"batch_size={n_seqs}")
        batch = expand_packed_batch(batch)
        loss, grads = jax.value_and_grad(loss_fn)(params, esm_params, batch,
                                                  rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
