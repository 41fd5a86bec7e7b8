"""Sharded packed-row CLIP training: the packed data path on a DP mesh.

`parallel/step.py` shards UNPACKED batches; the single-chip throughput
winner is sequence packing (train/packed_engine.py, ~95% token fill).
This module composes the two: pairs are dealt to per-shard groups on the
host (balanced by receptor length), each shard's sequences pack into its
own rows, and the stacked row tensor shards over 'data' — every chip runs
the packed engine on its rows, pools its local (B_local, D) embeddings,
and the usual all-gather/psum pair makes the InfoNCE negatives span the
global batch (exactly the parallel/step.py contract, reference GradCache
semantics at training_utils.py:92-155).

Wire format (``tokenize_packed_sharded``): per side
- ``{side}_ids``  (n_shards * R, L) int8 — shard-major rows, so
  ``PartitionSpec('data')`` on axis 0 hands each chip its own rows;
  shards with fewer packed rows pad with all-<pad> rows (seg == 0
  everywhere: masked out of attention and pooling).
- ``{side}_operm`` (n_shards, B_local) int32 — per-shard owner
  permutation with LOCAL pair indices; pairs are assigned to shards
  jointly (both sides of a pair live on the same shard, in the same local
  order), so the concatenated all-gather order matches between sides and
  the InfoNCE diagonal stays aligned.

The 'model' axis must be 1: tensor parallelism composes via the unpacked
step (parallel/step.py, eager attention) — GSPMD cannot split the fused
attention custom call the packed path leans on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..data.tokenizer import EOS_ID, PAD_ID, EsmTokenizer
from ..models import clip
from ..ops.infonce import clip_infonce
from ..train.packed_engine import (_default_rows_per_chunk,
                                   _encode_packed_chunked, _expand_pack,
                                   _pool_packed, _row_len_for)
from .mesh import DATA_AXIS, MODEL_AXIS


def _validated(sharded, n_data: int, b_local: int):
    """Host-side batch guard: a batch tokenized for a different shard count
    than the mesh's data axis would pass shard_map silently — each chip
    takes operm[0] of its slice, so extra sub-shards' tokens misroute into
    the wrong sequences (finite loss, corrupted training). Fail loudly
    instead, matching the single-device packed step's guard."""

    def step(params, opt_state, esm_params, batch, rng):
        got = batch["pep_operm"].shape
        if got != (n_data, b_local):
            raise ValueError(
                f"packed sharded batch carries operm {got} but the mesh "
                f"expects ({n_data}, {b_local}) — tokenize_packed_sharded "
                f"n_shards must equal the mesh data axis")
        for side in ("pep", "rec"):
            rows = batch[f"{side}_ids"].shape[0]
            if rows % n_data:
                raise ValueError(
                    f"{side}_ids rows {rows} not divisible by data axis "
                    f"{n_data}")
        return sharded(params, opt_state, esm_params, batch, rng)

    return step

__all__ = ["tokenize_packed_sharded", "make_sharded_packed_train_step",
           "make_sharded_packed_filip_step"]


def _deal_pairs(pep_lens, rec_lens, n_shards: int) -> list[list[int]]:
    """Assign pair indices to shards with EQUAL counts, balancing total
    receptor tokens (the dominant cost): longest-first greedy into the
    lightest shard, then move the lightest members out of over-count
    shards into the least-loaded under-count shard (a flatten+reslice
    equal-count fixup measured ~2x load skew on skewed length draws)."""
    n = len(rec_lens)
    b_local = n // n_shards
    order = sorted(range(n), key=lambda i: -rec_lens[i])
    shards: list[list[int]] = [[] for _ in range(n_shards)]
    load = [0] * n_shards
    for i in order:
        s = int(np.argmin(load))
        shards[s].append(i)
        load[s] += rec_lens[i]
    for s in range(n_shards):
        while len(shards[s]) > b_local:
            # lightest member leaves; lands on the least-loaded shard
            # that still has room
            j = min(range(len(shards[s])),
                    key=lambda k: rec_lens[shards[s][k]])
            i = shards[s].pop(j)
            load[s] -= rec_lens[i]
            t = min((u for u in range(n_shards)
                     if len(shards[u]) < b_local),
                    key=lambda u: load[u])
            shards[t].append(i)
            load[t] += rec_lens[i]
    return shards


def tokenize_packed_sharded(tokenizer: EsmTokenizer, peps: list[str],
                            recs: list[str], n_shards: int,
                            pep_row_len: int | None = None,
                            rec_row_len: int | None = None):
    """Pack both sides per shard; stack rows shard-major (see module doc)."""
    from ..data.packing import pack_sequences

    import warnings

    from ..train.packed_engine import scan_order_operm

    n = len(peps)
    if n % n_shards:
        raise ValueError(f"global batch {n} not divisible by {n_shards}")
    b_local = n // n_shards
    pep_encs = [tokenizer.encode(s) for s in peps]
    rec_encs = [tokenizer.encode(s) for s in recs]
    shards = _deal_pairs([len(e) for e in pep_encs],
                         [len(e) for e in rec_encs], n_shards)

    out = {}
    for side, encs, explicit in (("pep", pep_encs, pep_row_len),
                                 ("rec", rec_encs, rec_row_len)):
        row_len = _row_len_for(max(len(e) for e in encs), explicit)
        clamped = 0
        clipped = []
        for e in encs:
            if len(e) > row_len:  # keep eos, like tokenize_packed
                e = np.concatenate((e[: row_len - 1], [EOS_ID]))
                clamped += 1
            clipped.append(e)
        if clamped:
            warnings.warn(
                f"tokenize_packed_sharded: {clamped} {side} sequence(s) "
                f"longer than row_len={row_len} were truncated (eos kept)",
                stacklevel=2)
        packs = []
        for members in shards:
            packed = pack_sequences([clipped[i] for i in members], row_len,
                                    row_multiple=1)
            operm = scan_order_operm(
                packed, np.arange(b_local, dtype=np.int32))  # LOCAL
            packs.append((packed.ids, operm))
        r_max = -(-max(p.shape[0] for p, _ in packs) // 8) * 8
        ids = np.full((n_shards, r_max, row_len), PAD_ID, np.int8)
        for s, (p, _) in enumerate(packs):
            ids[s, : p.shape[0]] = p.astype(np.int8)
        out[f"{side}_ids"] = jnp.asarray(ids.reshape(n_shards * r_max,
                                                     row_len))
        out[f"{side}_operm"] = jnp.asarray(
            np.stack([o for _, o in packs]))
    # pair order per shard for callers that need to map embeddings back
    out["pair_shard_order"] = jnp.asarray(
        np.concatenate([np.asarray(m, np.int32) for m in shards]))
    return out


def make_sharded_packed_train_step(cfg, optimizer:
                                   optax.GradientTransformation, mesh,
                                   loss_fn=clip_infonce,
                                   rows_per_chunk: int | None = None):
    """jit(shard_map) train step over ``tokenize_packed_sharded`` batches.

    Loss is invariant to the host's pair-to-shard dealing (InfoNCE is
    permutation-symmetric across pairs); parity with the single-device
    packed step is exact up to f32 reduction order
    (tests/test_parallel.py::test_sharded_packed_step_matches_packed).
    """
    mcfg = cfg.model
    n_data = mesh.shape[DATA_AXIS]
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)
    if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
        raise ValueError(
            "packed sharding is DP-only; compose TP via parallel/step.py")
    if cfg.global_batch % n_data:
        raise ValueError(f"global batch {cfg.global_batch} not divisible "
                         f"by data axis {n_data}")
    b_local = cfg.global_batch // n_data

    def local_step(params, opt_state, esm_params, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        rp, rr = jax.random.split(rng)

        def side_emb(p, side, r):
            ids = batch[f"{side}_ids"]             # (R_local, L) int8
            operm = batch[f"{side}_operm"][0]      # (B_local,)
            pk = _expand_pack(ids, operm, b_local)
            h = _encode_packed_chunked(esm_params, pk["ids"], pk["seg"],
                                       pk["pos"], mcfg.esm, rows_per_chunk,
                                       cfg.remat)
            return _pool_packed(p[side], h.astype(jnp.float32),
                                pk["seg"], pk["owner"], b_local,
                                p["temperature"],
                                dropout_rate=mcfg.dropout, train=True,
                                rng=r, activation=mcfg.activation)

        def head_loss(p):
            pep_l = side_emb(p, "pep", rp)
            rec_l = side_emb(p, "rec", rr)
            pep = jax.lax.all_gather(pep_l, DATA_AXIS, axis=0, tiled=True)
            rec = jax.lax.all_gather(rec_l, DATA_AXIS, axis=0, tiled=True)
            return loss_fn(pep, rec)

        loss, grads = jax.value_and_grad(head_loss)(params)
        # pmean, not psum: all_gather's transpose sums n_data identical
        # cotangents under check_vma=False (see parallel/step.py).
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(),
                  {"pep_ids": P(DATA_AXIS), "rec_ids": P(DATA_AXIS),
                   "pep_operm": P(DATA_AXIS), "rec_operm": P(DATA_AXIS),
                   "pair_shard_order": P()},
                  P()),
        out_specs=(P(), P(), P()),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return _validated(jax.jit(sharded), n_data, b_local)


def make_sharded_packed_filip_step(cfg, optimizer:
                                   optax.GradientTransformation, mesh,
                                   use_dcl: bool | None = None,
                                   similarity_fn=None,
                                   rows_per_chunk: int | None = None):
    """Packed FILIP on a DP mesh: token-level gather over packed backbones.

    Each chip runs the packed backbone + per-token head on its shard's
    rows, scatters tokens to local per-sequence (B_local, T, D) tensors,
    all-gathers the receptor side's tokens, and computes its B_local rows
    of both direction matrices (both FILIP losses reduce row-wise —
    parallel/filip_step.py contract) with the fused max-sim kernel running
    per chip. Wire format: ``tokenize_packed_sharded``.
    """
    from ..models import heads
    from ..train.filip_engine import default_similarity_fn
    from ..train.filip_packed import _l2_normalize_tokens, _scatter_side
    from .filip_step import _row_direction_loss_sum, local_diagonals

    mcfg = cfg.model
    n_data = mesh.shape[DATA_AXIS]
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)
    if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
        raise ValueError(
            "packed sharding is DP-only; compose TP via parallel/step.py")
    if cfg.batch_size % n_data:
        raise ValueError(f"batch {cfg.batch_size} not divisible by data "
                         f"axis {n_data}")
    b_local = cfg.batch_size // n_data
    b_global = cfg.batch_size
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()

    def local_step(params, opt_state, esm_params, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(p):
            rp, rr = jax.random.split(rng)
            sides = {}
            for side, r in (("pep", rp), ("rec", rr)):
                ids = batch[f"{side}_ids"]
                operm = batch[f"{side}_operm"][0]
                pk = _expand_pack(ids, operm, b_local)
                h = _encode_packed_chunked(esm_params, pk["ids"],
                                           pk["seg"], pk["pos"], mcfg.esm,
                                           rows_per_chunk, cfg.remat)
                x = _l2_normalize_tokens(
                    heads.encode_tokens(p[side], h.astype(jnp.float32),
                                        dropout_rate=mcfg.dropout,
                                        train=True, rng=r,
                                        activation=mcfg.activation))
                # flat (no scatter tiers): one (b_local, L, D) buffer
                ((out, mask, _),) = _scatter_side(x, pk, (), b_local,
                                                  mcfg.embedding_dim)
                sides[side] = (out, mask)
            (ha, ma), (hb, mb) = sides["pep"], sides["rec"]
            hb_all = jax.lax.all_gather(hb, DATA_AXIS, axis=0, tiled=True)
            mb_all = jax.lax.all_gather(mb, DATA_AXIS, axis=0, tiled=True)
            sim_a_rows, sim_b_rows = sim_fn(ha, hb_all, ma, mb_all,
                                            p["temperature"])

            diag_a = local_diagonals(sim_a_rows, b_local, b_global)
            diag_b = local_diagonals(sim_b_rows, b_local, b_global)
            sum_a = _row_direction_loss_sum(sim_a_rows, diag_a, use_dcl)
            sum_b = _row_direction_loss_sum(sim_b_rows, diag_b, use_dcl)
            return 0.5 * jax.lax.psum(sum_a + sum_b, DATA_AXIS) / b_global

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # pmean, not psum (see parallel/step.py grad-scale note).
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(),
                  {"pep_ids": P(DATA_AXIS), "rec_ids": P(DATA_AXIS),
                   "pep_operm": P(DATA_AXIS), "rec_operm": P(DATA_AXIS),
                   "pair_shard_order": P()},
                  P()),
        out_specs=(P(), P(), P()),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return _validated(jax.jit(sharded), n_data, b_local)
