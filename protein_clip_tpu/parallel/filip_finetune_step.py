"""Data-parallel UNFROZEN-backbone FILIP training (finetune + LoRA).

The last missing engine x mesh composition (VERDICT r3 #2): CLIP finetune
composes with DP (parallel/finetune_step.py) and frozen FILIP composes
with DP (parallel/filip_step.py, packed_step.py); this module composes
the token-level two-pass gradcache (train/filip_finetune.py) with the
DP token-gather pattern. Per replica, inside one shard_map over 'data':

  pass 1   scan the LOCAL batch shard's chunks through backbone + token
           heads -> cached normalised token tensors, stop_gradient;
  tail     all_gather the receptor side's (b_local, T, D) tokens + mask
           over ICI, compute the b_local rows of BOTH direction matrices
           this replica owns (both FILIP losses reduce row-wise,
           parallel/filip_step.py contract), psum the row sums into the
           global loss; value_and_grad w.r.t. (params, local tokens);
  pass 2   replay local chunks under jax.vjp feeding those token
           cotangents, accumulating parameter grads.

Cotangent scale: every replica differentiates its own copy of the
replicated global loss; the all_gather/psum transposes under
check_vma=False sum the n_data identical copies, so the replayed grads
arrive n_data x their disjoint-shard contribution — pmean over 'data'
recovers exactly the true global-loss gradient (the parallel/step.py
scale rule; SGD exact-parity tests pin it).

LoRA rides the same steps with the adapter merge as the backbone view:
the frozen compute-dtype base replicates in the esm_params slot, only
adapters + heads + temperature train (train/lora.py semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..train.filip_engine import _snap_chunks, default_similarity_fn
from ..train.filip_finetune import (_packed_token_machinery,
                                    _token_machinery)
from .filip_step import _row_direction_loss_sum, local_diagonals
from .mesh import DATA_AXIS, MODEL_AXIS
from .step import tp_safe_model_config

_PACKED_BATCH_SPEC = {"pep_ids": P(DATA_AXIS), "rec_ids": P(DATA_AXIS),
                      "pep_operm": P(DATA_AXIS), "rec_operm": P(DATA_AXIS),
                      "pair_shard_order": P()}


def _lora_view(alpha):
    from ..train.lora import _resolve_alpha, merge_lora

    def esm_view(params, esm_params):
        return merge_lora(esm_params, params["lora"],
                          _resolve_alpha(params, alpha))

    return esm_view


def make_sharded_filip_finetune_step(cfg,
                                     optimizer: optax.GradientTransformation,
                                     mesh, *, packed: bool = False,
                                     lora: bool = False,
                                     lora_alpha: float | None = None,
                                     similarity_fn=None,
                                     use_dcl: bool | None = None,
                                     rows_per_chunk: int | None = None):
    """Dispatcher: plain or packed wire, full-finetune or LoRA view."""
    esm_view = _lora_view(lora_alpha) if lora else None
    if packed:
        return make_sharded_packed_filip_finetune_step(
            cfg, optimizer, mesh, esm_view=esm_view,
            similarity_fn=similarity_fn, use_dcl=use_dcl,
            rows_per_chunk=rows_per_chunk)
    return make_sharded_plain_filip_finetune_step(
        cfg, optimizer, mesh, esm_view=esm_view,
        similarity_fn=similarity_fn, use_dcl=use_dcl)


def _gathered_row_loss(heads_temperature, sim_fn, use_dcl,
                       ha, ma, hb, mb, n_data):
    """Local-rows x global-columns two-direction FILIP loss."""
    b_local = ha.shape[0]
    b_global = b_local * n_data
    hb_all = jax.lax.all_gather(hb, DATA_AXIS, axis=0, tiled=True)
    mb_all = jax.lax.all_gather(mb, DATA_AXIS, axis=0, tiled=True)
    sim_a_rows, sim_b_rows = sim_fn(ha, hb_all, ma, mb_all,
                                    heads_temperature)
    diag_a = local_diagonals(sim_a_rows, b_local, b_global)
    diag_b = local_diagonals(sim_b_rows, b_local, b_global)
    sum_a = _row_direction_loss_sum(sim_a_rows, diag_a, use_dcl)
    sum_b = _row_direction_loss_sum(sim_b_rows, diag_b, use_dcl)
    return 0.5 * jax.lax.psum(sum_a + sum_b, DATA_AXIS) / b_global


def make_sharded_plain_filip_finetune_step(
        cfg, optimizer: optax.GradientTransformation, mesh, *,
        esm_view=None, similarity_fn=None, use_dcl: bool | None = None):
    """jit(shard_map) unfrozen FILIP step over tokenize_pair_batch batches
    sharded on 'data'. Params {esm f32 masters | lora adapters, heads}
    replicated; signature (params, opt_state, esm_params, batch, rng) ->
    (params, opt_state, loss)."""
    from ..train.clip_engine import expand_batch

    mcfg = tp_safe_model_config(cfg.model, mesh)
    import dataclasses
    cfg = dataclasses.replace(cfg, model=mcfg)
    n_data = mesh.shape[DATA_AXIS]
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    if similarity_fn is None:
        if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
            from ..models.filip import filip_similarity as similarity_fn
        else:
            similarity_fn = default_similarity_fn()
    if cfg.batch_size % n_data:
        raise ValueError(f"batch {cfg.batch_size} not divisible by data "
                         f"axis {n_data}")
    b_local = cfg.batch_size // n_data
    encode_chunk, chunk_batch, _ = _token_machinery(cfg, similarity_fn,
                                                    use_dcl, esm_view)
    n_chunks = _snap_chunks(b_local, max(1, cfg.num_chunks // n_data))

    def tail(params, HA, HB, mask_a, mask_b):
        ha = HA.reshape(b_local, *HA.shape[2:])
        hb = HB.reshape(b_local, *HB.shape[2:])
        return _gathered_row_loss(params["heads"]["temperature"],
                                  similarity_fn, use_dcl, ha, mask_a, hb,
                                  mask_b, n_data)

    def local_step(params, opt_state, esm_params, batch, rng):
        batch = expand_batch(batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        chunks = chunk_batch(batch, n_chunks, rng)

        def body(_, c):
            return None, encode_chunk(params, esm_params, c)

        _, (HA, HB) = jax.lax.scan(body, None, chunks)
        HA = jax.lax.stop_gradient(HA)
        HB = jax.lax.stop_gradient(HB)

        loss, (grads, dHA, dHB) = jax.value_and_grad(
            tail, argnums=(0, 1, 2))(params, HA, HB, batch["pep_mask"],
                                     batch["rec_mask"])

        def body2(acc, x):
            c, ga, gb = x
            _, vjp = jax.vjp(lambda p: encode_chunk(p, esm_params, c),
                             params)
            (pg,) = vjp((ga, gb))
            return jax.tree.map(jnp.add, acc, pg), None

        grads, _ = jax.lax.scan(body2, grads, (chunks, dHA, dHB))
        # n_data x cotangents -> pmean = true global gradient (module doc)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_packed_filip_finetune_step(
        cfg, optimizer: optax.GradientTransformation, mesh, *,
        esm_view=None, similarity_fn=None, use_dcl: bool | None = None,
        rows_per_chunk: int | None = None):
    """jit(shard_map) unfrozen packed FILIP step over the
    tokenize_packed_sharded wire (flat packs; pairs dealt to shards
    receptor-token-balanced, shard-major rows — parallel/packed_step.py).

    Pass 1 scans the LOCAL shard's row chunks into cached (R_local, L, D)
    normalised token tensors; the tail scatters them to per-sequence
    (b_local, L, D) buffers (the packed scatter is a permutation of valid
    tokens), gathers the receptor side over ICI and takes this replica's
    rows of both direction losses; pass 2 replays each chunk with its own
    row slice of the cached tensor's cotangent. DP-only (the fused
    attention custom call cannot split over a 'model' axis)."""
    from ..train.filip_packed import _scatter_side
    from ..train.finetune import _chunk_pack
    from ..train.packed_engine import _default_rows_per_chunk, _expand_pack
    from .packed_step import _validated

    mcfg = cfg.model
    n_data = mesh.shape[DATA_AXIS]
    if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
        raise ValueError(
            "packed sharding is DP-only; compose TP via the plain "
            "make_sharded_plain_filip_finetune_step")
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)
    if cfg.batch_size % n_data:
        raise ValueError(f"batch {cfg.batch_size} not divisible by data "
                         f"axis {n_data}")
    b_local = cfg.batch_size // n_data
    # chunk_tokens/scan_tokens are wire-agnostic (they take ids/seg/pos);
    # the single-device machinery's tail/prepare are replaced by the
    # sharded wire's expansion + the gathered row loss
    chunk_tokens, scan_tokens, _, _ = _packed_token_machinery(
        cfg, sim_fn, use_dcl, rows_per_chunk, esm_view)

    def prepare(batch, rng):
        packs = {side: _expand_pack(batch[f"{side}_ids"],
                                    batch[f"{side}_operm"][0], b_local)
                 for side in ("pep", "rec")}
        l_max = max(packs["pep"]["ids"].shape[1],
                    packs["rec"]["ids"].shape[1])
        sides = {}
        for side, r in zip(("pep", "rec"), jax.random.split(rng)):
            pack = packs[side]
            # constant TOKENS per chunk across the two sides' row widths
            # (train/filip_finetune._packed_token_machinery rule)
            rpc = rows_per_chunk * (l_max // pack["ids"].shape[1])
            chunks, n = _chunk_pack(pack, rpc)
            sides[side] = (chunks, jax.random.split(r, n))
        return sides, packs

    def tail(params, Xp, Xr, packs):
        sides = {}
        for side, X in (("pep", Xp), ("rec", Xr)):
            x = X.reshape(-1, *X.shape[2:])  # (R_local, L, D)
            ((out, mask, _),) = _scatter_side(x, packs[side], (), b_local,
                                              mcfg.embedding_dim)
            sides[side] = (out, mask)
        (ha, ma), (hb, mb) = sides["pep"], sides["rec"]
        return _gathered_row_loss(params["heads"]["temperature"], sim_fn,
                                  use_dcl, ha, ma, hb, mb, n_data)

    def replay(params, esm_params, side, chunks, rngs, dX, acc):
        def body(acc, x):
            _, vjp = jax.vjp(
                lambda p: chunk_tokens(p, esm_params, side, x["ids"],
                                       x["seg"], x["pos"], x["rng"]),
                params)
            (pg,) = vjp(x["dx"])
            return jax.tree.map(jnp.add, acc, pg), None

        xs = {k: chunks[k] for k in ("ids", "seg", "pos")}
        xs["rng"] = rngs
        xs["dx"] = dX
        acc, _ = jax.lax.scan(body, acc, xs)
        return acc

    def local_step(params, opt_state, esm_params, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        sides, packs = prepare(batch, rng)

        X = {side: jax.lax.stop_gradient(
                scan_tokens(params, esm_params, side, *sides[side]))
             for side in ("pep", "rec")}

        loss, (grads, dXp, dXr) = jax.value_and_grad(
            tail, argnums=(0, 1, 2))(params, X["pep"], X["rec"], packs)

        grads = replay(params, esm_params, "pep", *sides["pep"], dXp, grads)
        grads = replay(params, esm_params, "rec", *sides["rec"], dXr, grads)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), _PACKED_BATCH_SPEC, P()),
        out_specs=(P(), P(), P()),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return _validated(jax.jit(sharded), n_data, b_local)
