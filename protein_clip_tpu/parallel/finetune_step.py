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
from ..train.finetune import _cast_esm
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
        ids = batch[f"{side}_ids"]
        mask = batch[f"{side}_mask"]
        B, T = ids.shape
        return {"ids": ids.reshape(n_local, B // n_local, T),
                "mask": mask.reshape(n_local, B // n_local, T),
                "rng": jax.random.split(rng, n_local)}

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
