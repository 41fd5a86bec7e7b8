"""Data-parallel UNFROZEN-backbone finetune step.

Composes the two capabilities the single-chip modules already prove:
the two-pass gradcache over an unfrozen encoder (train/finetune.py) and
the DP global-negative pattern (parallel/step.py). Per replica, inside
one shard_map over 'data':

  pass 1   scan the LOCAL microbatch chunks through backbone+heads
           without a graph -> local (b_local, D) embeddings;
  loss     all_gather embeddings over ICI so InfoNCE negatives span the
           mesh (the GradCache global batch, training_utils.py:92-155,
           but over collectives), and differentiate w.r.t. the LOCAL
           embeddings — the all_gather transpose (psum_scatter) routes
           each row's cotangent back to its owning replica;
  pass 2   replay local chunks under jax.vjp feeding those cotangents,
           accumulating parameter grads.

Each replica's replay covers ONLY its own chunks — but the cotangents
it feeds them arrive n_data x scale (the all_gather transpose under a
manual mesh axis sums the identical per-replica loss cotangents), so
pmean over 'data' recovers exactly the sum of disjoint contributions =
the true global-loss gradient. Pinned by the SGD-parametrized
exact-parity test against the single-device finetune step
(tests/test_finetune.py) — sgd is the probe Adam would mask.

The backbone trains, so params (f32 masters + Adam state) are replicated
over 'data' and updated identically on every replica from the psum'd
grads — classic data parallelism, ~1.2 GB of replicated state at
t30_150M. TP for bigger backbones composes via the 'model' auto axis
exactly as in parallel/step.py (tp_safe_model_config forces eager
attention when the model axis is real).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..models import clip, esm2
from ..ops.infonce import clip_infonce
from ..train.clip_engine import expand_batch
from ..train.finetune import _cast_esm, _chunked
from ..train.gradcache import gradcache_value_and_grad
from .mesh import DATA_AXIS
from .step import tp_safe_model_config


def make_sharded_finetune_step(cfg, optimizer: optax.GradientTransformation,
                               mesh, loss_fn=clip_infonce,
                               esm_view=None):
    """jit(shard_map(step)): (params, opt_state, esm_params, batch, rng) ->
    (params, opt_state, loss). Batch leaves (B_global, T) sharded over
    'data'; params/opt_state replicated. esm_params slot ignored by the
    default full finetune (the backbone lives inside params, as in
    train/finetune.py); an esm_view(params, esm_params) override selects
    a different backbone — LoRA passes the adapter merge over the frozen
    base riding that slot (make_sharded_lora_step)."""
    mcfg = tp_safe_model_config(cfg.model, mesh)
    if esm_view is None:
        def esm_view(params, esm_params):
            del esm_params
            return _cast_esm(params["esm"], mcfg.esm.compute_dtype)
    n_data = mesh.shape[DATA_AXIS]
    if cfg.global_batch % n_data:
        raise ValueError(f"global batch {cfg.global_batch} not divisible by "
                         f"data axis {n_data}")
    local_batch = cfg.global_batch // n_data
    # snap to a divisor of the LOCAL batch (the single-device engines'
    # _snap_chunks rule) instead of rejecting configs that work there
    from ..train.filip_engine import _snap_chunks
    n_local = _snap_chunks(local_batch, max(1, cfg.num_chunks // n_data))

    def encode(side, esm_params):
        def fn(params, chunk):
            esm_c = esm_view(params, esm_params)
            h = esm2.forward(esm_c, chunk["ids"], chunk["mask"], mcfg.esm,
                             remat=cfg.remat)
            return clip.encode_side(params["heads"], side,
                                    h.astype(jnp.float32), chunk["mask"],
                                    mcfg, train=True, rng=chunk["rng"])
        return fn

    def gathered_loss(ex, ey):
        # negatives span the mesh: gather pooled embeddings over ICI
        pep = jax.lax.all_gather(ex, DATA_AXIS, axis=0, tiled=True)
        rec = jax.lax.all_gather(ey, DATA_AXIS, axis=0, tiled=True)
        return loss_fn(pep, rec)

    def local_step(params, opt_state, esm_params, batch, rng):
        batch = expand_batch(batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        rp, rr = jax.random.split(rng)
        # the single-device two-pass, verbatim, with the all-gathered
        # loss: its embedding cotangents arrive n_data x the true per-row
        # value — every replica differentiates its own copy of the
        # replicated loss, and the all_gather transpose (psum_scatter)
        # SUMS those identical cotangents across the mesh (the ADVICE-r2
        # scale trap, same as parallel/step.py). Each replica's replay
        # therefore carries n_data x its disjoint-chunk contribution —
        # pmean yields exactly sum-of-contributions = the true
        # global-loss gradient. Pinned by the SGD parity test (a psum
        # here measures 8x).
        loss, grads = gradcache_value_and_grad(
            encode("pep", esm_params), gathered_loss, params,
            _chunked(batch, "pep", n_local, rp),
            _chunked(batch, "rec", n_local, rr),
            encode_fn_y=encode("rec", esm_params))
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_lora_step(cfg, optimizer: optax.GradientTransformation,
                           mesh, loss_fn=clip_infonce,
                           alpha: float | None = None):
    """DP LoRA: the sharded finetune two-pass with the adapter merge as
    the backbone view. The frozen base replicates over 'data' (it is
    gradient-free), adapters + heads train from pmean'd grads — the
    state that replicates per chip is megabytes, so this scales LoRA to
    the mesh with no sharding of optimizer state needed."""
    from ..train.lora import _resolve_alpha, merge_lora

    def esm_view(params, esm_params):
        return merge_lora(esm_params, params["lora"],
                          _resolve_alpha(params, alpha))

    return make_sharded_finetune_step(cfg, optimizer, mesh, loss_fn,
                                      esm_view=esm_view)


def make_sharded_packed_finetune_step(cfg,
                                      optimizer: optax.GradientTransformation,
                                      mesh, loss_fn=clip_infonce,
                                      rows_per_chunk: int | None = None,
                                      esm_view=None):
    """DP x packed x finetune: the production finetune path (packed rows,
    ~95% token fill — train/finetune.make_train_step_packed) on a 'data'
    mesh. Wire format: parallel/packed_step.tokenize_packed_sharded (pairs
    dealt to shards receptor-token-balanced; shard-major rows).

    Per replica, inside one shard_map: pass 1 scans the LOCAL shard's row
    chunks into per-sequence (sums, counts) partials with stop_gradient;
    the tail finishes the LOCAL pools, all-gathers pooled embeddings over
    ICI so InfoNCE negatives span the global batch, and differentiates
    w.r.t. (params, local sums); pass 2 replays local chunks feeding every
    chunk the SAME local d_sums (pooling is a linear scatter-add). Both
    the tail param grads and d_sums arrive n_data x true scale (the
    all_gather transpose sums identical per-replica cotangents) — pmean
    recovers exactly the global-loss gradient, as in the plain sharded
    finetune above. DP-only like the frozen packed step (the fused
    attention custom call cannot split over a 'model' axis)."""
    from ..train.finetune import _packed_machinery
    from ..train.packed_engine import _default_rows_per_chunk, _expand_pack
    from .mesh import MODEL_AXIS
    from .packed_step import _validated

    mcfg = cfg.model
    n_data = mesh.shape[DATA_AXIS]
    if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
        raise ValueError(
            "packed sharding is DP-only; compose TP via the plain "
            "make_sharded_finetune_step")
    if cfg.global_batch % n_data:
        raise ValueError(f"global batch {cfg.global_batch} not divisible "
                         f"by data axis {n_data}")
    b_local = cfg.global_batch // n_data
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)

    def gathered_loss(pep_l, rec_l):
        # negatives span the mesh: gather pooled embeddings over ICI
        pep = jax.lax.all_gather(pep_l, DATA_AXIS, axis=0, tiled=True)
        rec = jax.lax.all_gather(rec_l, DATA_AXIS, axis=0, tiled=True)
        return loss_fn(pep, rec)

    def expand_sides(batch):
        # sharded wire: per-shard (R_local, L) int8 rows + LOCAL operm
        return {side: _expand_pack(batch[f"{side}_ids"],
                                   batch[f"{side}_operm"][0], b_local)
                for side in ("pep", "rec")}

    # the single-device packed two-pass (train/finetune._packed_machinery)
    # parameterized with the per-shard sequence count, the sharded wire's
    # pack expansion, and the all-gathered loss
    _, scan_sums, tail, prepare, replay = _packed_machinery(
        cfg, gathered_loss, rows_per_chunk, esm_view,
        n_seqs=b_local, expand_sides=expand_sides)

    def local_step(params, opt_state, esm_params, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        emb_dim = params["heads"]["pep"]["projection"]["w"].shape[1]
        sides = prepare(batch, rng)

        pools = {side: jax.lax.stop_gradient(
                     scan_sums(params, esm_params, side, c, r, emb_dim))
                 for side, (c, r, _) in sides.items()}

        loss, (grads, d_sp, d_sr) = jax.value_and_grad(
            tail, argnums=(0, 1, 3))(
                params, *pools["pep"], *pools["rec"],
                sides["pep"][2], sides["rec"][2])

        grads = replay(params, esm_params, "pep", sides["pep"][0],
                       sides["pep"][1], d_sp, grads)
        grads = replay(params, esm_params, "rec", sides["rec"][0],
                       sides["rec"][1], d_sr, grads)
        # n_data x cotangents -> pmean = true global gradient (see the
        # plain sharded finetune's scale note; SGD parity test pins it).
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


def make_sharded_packed_lora_step(cfg,
                                  optimizer: optax.GradientTransformation,
                                  mesh, loss_fn=clip_infonce,
                                  alpha: float | None = None):
    """DP x packed x LoRA: the sharded packed finetune with the adapter
    merge as the backbone view (frozen compute-dtype base rides the
    esm_params slot, replicated over 'data')."""
    from ..train.lora import _resolve_alpha, merge_lora

    def esm_view(params, esm_params):
        return merge_lora(esm_params, params["lora"],
                          _resolve_alpha(params, alpha))

    return make_sharded_packed_finetune_step(cfg, optimizer, mesh, loss_fn,
                                             esm_view=esm_view)
