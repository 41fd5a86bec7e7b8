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
    n_local = max(1, cfg.num_chunks // n_data)
    if local_batch % n_local:
        raise ValueError(f"local batch {local_batch} not divisible by local "
                         f"chunk count {n_local}")

    def encode(side, esm_params):
        def fn(params, chunk):
            esm_c = esm_view(params, esm_params)
            h = esm2.forward(esm_c, chunk["ids"], chunk["mask"], mcfg.esm,
                             remat=cfg.remat)
            return clip.encode_side(params["heads"], side,
                                    h.astype(jnp.float32), chunk["mask"],
                                    mcfg, train=True, rng=chunk["rng"])
        return fn

    def chunked(batch, side, rng):
        return _chunked(batch, side, n_local, rng)

    def scan_encode(fn, params, chunks):
        def body(_, c):
            return None, fn(params, c)
        _, embs = jax.lax.scan(body, None, chunks)
        return embs  # (n_local, b, D)

    def local_step(params, opt_state, esm_params, batch, rng):
        batch = expand_batch(batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        rp, rr = jax.random.split(rng)
        chunks_x = chunked(batch, "pep", rp)
        chunks_y = chunked(batch, "rec", rr)
        enc_p = encode("pep", esm_params)
        enc_r = encode("rec", esm_params)

        embs_x = jax.lax.stop_gradient(scan_encode(enc_p, params, chunks_x))
        embs_y = jax.lax.stop_gradient(scan_encode(enc_r, params, chunks_y))
        D = embs_x.shape[-1]

        def global_loss(ex, ey):
            pep = jax.lax.all_gather(ex.reshape(-1, D), DATA_AXIS,
                                     axis=0, tiled=True)
            rec = jax.lax.all_gather(ey.reshape(-1, D), DATA_AXIS,
                                     axis=0, tiled=True)
            return loss_fn(pep, rec)

        loss, (gx, gy) = jax.value_and_grad(global_loss, argnums=(0, 1))(
            embs_x, embs_y)

        def replay(fn, chunks, cotangents, acc):
            def body(acc, xg):
                c, g = xg
                _, vjp = jax.vjp(lambda p: fn(p, c), params)
                (pg,) = vjp(g)
                return jax.tree.map(jnp.add, acc, pg), None
            acc, _ = jax.lax.scan(body, acc, (chunks, cotangents))
            return acc

        grads = replay(enc_p, chunks_x, gx,
                       jax.tree.map(jnp.zeros_like, params))
        grads = replay(enc_r, chunks_y, gy, grads)
        # gx/gy are n_data x the true per-row cotangent: every replica
        # differentiates its own copy of the replicated loss, and the
        # all_gather transpose (psum_scatter) SUMS those identical
        # cotangents across the mesh (the ADVICE-r2 scale trap, same as
        # parallel/step.py). Each replica's replay therefore carries
        # n_data x its disjoint-chunk contribution — pmean yields
        # exactly sum-of-contributions = the true global-loss gradient.
        # Pinned by the SGD parity test (a psum here measures 8x).
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
    from ..train.finetune import _chunk_pack
    from ..train.packed_engine import (_default_rows_per_chunk, _expand_pack,
                                       _finish_pool, _token_sums)
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
    if esm_view is None:
        def esm_view(params, esm_params):
            del esm_params  # the backbone lives inside params
            return _cast_esm(params["esm"], mcfg.esm.compute_dtype)

    def chunk_sums(params, esm_params, side, ids, seg, pos, owner, rng):
        esm_c = esm_view(params, esm_params)
        mask = (seg > 0).astype(jnp.int32)
        h = esm2.forward(esm_c, ids, mask, mcfg.esm, remat=cfg.remat,
                         segment_ids=seg, positions=pos)
        return _token_sums(params["heads"][side], h.astype(jnp.float32),
                           seg, owner, b_local, dropout_rate=mcfg.dropout,
                           train=True, rng=rng, activation=mcfg.activation)

    def local_step(params, opt_state, esm_params, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        emb_dim = params["heads"]["pep"]["projection"]["w"].shape[1]
        l_max = max(batch["pep_ids"].shape[1], batch["rec_ids"].shape[1])

        sides = {}
        for side, r in zip(("pep", "rec"), jax.random.split(rng)):
            ids = batch[f"{side}_ids"]          # (R_local, L) int8
            operm = batch[f"{side}_operm"][0]   # (B_local,) local indices
            pk = _expand_pack(ids, operm, b_local)
            rpc = rows_per_chunk * (l_max // ids.shape[1])
            chunks, n = _chunk_pack(pk, rpc)
            rc, rt = jax.random.split(r)
            sides[side] = (chunks, jax.random.split(rc, n), rt)

        def scan_sums(side, chunks, rngs):
            def body(carry, x):
                s, c = chunk_sums(params, esm_params, side, x["ids"],
                                  x["seg"], x["pos"], x["owner"], x["rng"])
                return (carry[0] + s, carry[1] + c), None
            init = (jnp.zeros((b_local, emb_dim), jnp.float32),
                    jnp.zeros((b_local,), jnp.float32))
            xs = dict(chunks)
            xs["rng"] = rngs
            (sums, cnt), _ = jax.lax.scan(body, init, xs)
            return sums, cnt

        pools = {side: jax.lax.stop_gradient(scan_sums(side, c, r))
                 for side, (c, r, _) in sides.items()}

        def tail(p, sums_p, cnt_p, sums_r, cnt_r, r2p, r2r):
            t = p["heads"]["temperature"]
            pep_l = _finish_pool(p["heads"]["pep"], sums_p, cnt_p, t,
                                 dropout_rate=mcfg.dropout, train=True,
                                 rng=r2p, activation=mcfg.activation)
            rec_l = _finish_pool(p["heads"]["rec"], sums_r, cnt_r, t,
                                 dropout_rate=mcfg.dropout, train=True,
                                 rng=r2r, activation=mcfg.activation)
            pep = jax.lax.all_gather(pep_l, DATA_AXIS, axis=0, tiled=True)
            rec = jax.lax.all_gather(rec_l, DATA_AXIS, axis=0, tiled=True)
            return loss_fn(pep, rec)

        loss, (grads, d_sp, d_sr) = jax.value_and_grad(
            tail, argnums=(0, 1, 3))(
                params, *pools["pep"], *pools["rec"],
                sides["pep"][2], sides["rec"][2])

        def replay(side, chunks, rngs, d_sums, acc):
            def body(acc, x):
                _, vjp = jax.vjp(
                    lambda p: chunk_sums(p, esm_params, side, x["ids"],
                                         x["seg"], x["pos"], x["owner"],
                                         x["rng"])[0],
                    params)
                (pg,) = vjp(d_sums)
                return jax.tree.map(jnp.add, acc, pg), None
            xs = dict(chunks)
            xs["rng"] = rngs
            acc, _ = jax.lax.scan(body, acc, xs)
            return acc

        grads = replay("pep", sides["pep"][0], sides["pep"][1], d_sp, grads)
        grads = replay("rec", sides["rec"][0], sides["rec"][1], d_sr, grads)
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
