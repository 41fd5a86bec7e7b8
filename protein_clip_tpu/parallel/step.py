"""Multi-chip CLIP training step: DP over 'data' (manual collectives) with
optional TP over 'model' (GSPMD auto axis).

The TPU-native form of the reference's GradCache global batch
(training_utils.py:92-155): each chip encodes its local batch shard with the
frozen backbone (chunk-scanned), projects it through the trainable heads,
**all-gathers the (B_local, D) embeddings over ICI** so the InfoNCE
denominator spans the full global batch, and psums head gradients.
Gradients flow back through the all-gather to local shards only — exactly
GradCache's cached-embedding cotangent routing, but done by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import clip
from ..ops.infonce import clip_infonce
from ..train.filip_engine import _snap_chunks
from ..train.gradcache import encode_hidden_chunked
from .mesh import DATA_AXIS, MODEL_AXIS


def tp_safe_model_config(mcfg, mesh):
    """Force eager attention when the 'model' axis is real.

    The fused attention kernel is a Pallas custom call; GSPMD cannot
    partition a custom call over the auto 'model' axis (it would have to
    all-gather the head-sharded activations around it, or refuse). Under
    TP the eager einsum path lets XLA shard attention over heads as usual;
    the kernel stays the single-chip / pure-DP default.
    """
    import dataclasses

    if (dict(mesh.shape).get(MODEL_AXIS, 1) > 1
            and mcfg.esm.attention_impl == "fused"):
        return dataclasses.replace(
            mcfg, esm=dataclasses.replace(mcfg.esm, attention_impl="eager"))
    return mcfg


def make_sharded_train_step(cfg, optimizer: optax.GradientTransformation,
                            mesh, loss_fn=clip_infonce):
    """Returns jit(shard_map(step)): (params, opt_state, esm_params, batch,
    rng) -> (params, opt_state, loss). Batch leaves arrive (B_global, T) and
    are sharded over 'data'; params/opt_state replicated over 'data'
    (TP over 'model' is an auto axis handled by GSPMD from the params'
    own shardings)."""
    mcfg = tp_safe_model_config(cfg.model, mesh)
    n_data = mesh.shape[DATA_AXIS]
    if cfg.global_batch % n_data:
        raise ValueError(f"global batch {cfg.global_batch} not divisible by "
                         f"data axis {n_data}")
    local_batch = cfg.global_batch // n_data
    chunk = max(1, cfg.global_batch // cfg.num_chunks)
    # snap to a divisor of the LOCAL batch (same rule as the single-device
    # engines' _snap_chunks): configs valid single-device must not crash
    # in encode_hidden_chunked just because n_data doesn't divide them
    local_chunks = _snap_chunks(local_batch, max(1, local_batch // chunk))

    def local_step(params, opt_state, esm_params, batch, rng):
        from ..train.clip_engine import expand_batch
        batch = expand_batch(batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        hp = encode_hidden_chunked(esm_params, batch["pep_ids"],
                                   batch["pep_mask"], mcfg.esm,
                                   local_chunks, cfg.remat)
        hr = encode_hidden_chunked(esm_params, batch["rec_ids"],
                                   batch["rec_mask"], mcfg.esm,
                                   local_chunks, cfg.remat)
        hp = hp.astype(jnp.float32)
        hr = hr.astype(jnp.float32)

        def head_loss(p):
            rp, rr = jax.random.split(rng)
            pep_local = clip.encode_side(p, "pep", hp, batch["pep_mask"],
                                         mcfg, train=True, rng=rp)
            rec_local = clip.encode_side(p, "rec", hr, batch["rec_mask"],
                                         mcfg, train=True, rng=rr)
            # negatives span the mesh: gather embeddings over ICI
            pep = jax.lax.all_gather(pep_local, DATA_AXIS, axis=0, tiled=True)
            rec = jax.lax.all_gather(rec_local, DATA_AXIS, axis=0, tiled=True)
            return loss_fn(pep, rec)

        loss, grads = jax.value_and_grad(head_loss)(params)
        # Every replica differentiates the SAME global loss, and under
        # shard_map's manual axis the all_gather transpose (psum_scatter)
        # sums the n_data identical cotangents — each replica's grads are
        # already n_data x its local-shard contribution. pmean (not psum)
        # therefore yields the true grad of the reported loss; psum would
        # be n_data x too large (invisible under Adam, wrong under any
        # non-scale-invariant transform). Pinned by the SGD-parametrized
        # parity tests in tests/test_parallel.py.
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


def make_sharded_eval_step(cfg, mesh, loss_fn=clip_infonce):
    """Sharded eval: same gather pattern, no grads/dropout."""
    mcfg = tp_safe_model_config(cfg.model, mesh)

    def local_step(params, esm_params, batch):
        from ..train.clip_engine import expand_batch
        batch = expand_batch(batch)
        pep_l, rec_l = clip.forward(params, esm_params, batch, mcfg,
                                    train=False)
        pep = jax.lax.all_gather(pep_l, DATA_AXIS, axis=0, tiled=True)
        rec = jax.lax.all_gather(rec_l, DATA_AXIS, axis=0, tiled=True)
        return loss_fn(pep, rec)

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=P(),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_batch(mesh, batch: dict[str, jax.Array]) -> dict[str, jax.Array]:
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
