"""Data-parallel MLM training step.

The reference's MLM exploration is a notebook (MLM_Testing.ipynb, N1 in
SURVEY.md) with no training loop at all; the mlm_train CLI gives it one,
and this module scales it over the 'data' mesh axis the TPU way:

- the (B, T) batch shards over 'data'; each chip masks its shard with a
  fold_in-derived key (distinct masks per shard, deterministic in the
  global key);
- the loss is the TRUE global mean over masked positions: shard-local
  (sum, count) terms are psum'd over ICI before the divide, so shards
  with more masked tokens weigh proportionally (a naive mean-of-means
  would not);
- LM-head grads psum over 'data' (the backbone stays frozen here, as in
  cli/mlm_train.py; unfreezing would shard the same way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import esm2, mlm
from .mesh import DATA_AXIS


def make_sharded_mlm_train_step(esm_cfg: esm2.ESM2Config,
                                optimizer: optax.GradientTransformation,
                                mesh, mask_prob: float):
    def local_step(lm_head, opt_state, esm_params, ids, mask, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        masked, labels = mlm.mask_tokens(key, ids, mask, mask_prob)

        def loss_fn(h):
            s, c = mlm.mlm_loss_terms(esm_params, h, masked, mask, labels,
                                      esm_cfg)
            s = jax.lax.psum(s, DATA_AXIS)
            c = jax.lax.psum(c, DATA_AXIS)
            return s / jnp.maximum(c, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(lm_head)
        # pmean, not psum: the in-loss psum transpose already multiplies
        # each replica's cotangent by n_data under check_vma=False (see
        # parallel/step.py; SGD parity test pins the scale).
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, lm_head)
        return optax.apply_updates(lm_head, updates), opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_mlm_eval_step(esm_cfg: esm2.ESM2Config, mesh,
                               mask_prob: float):
    def local_step(lm_head, esm_params, ids, mask, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        masked, labels = mlm.mask_tokens(key, ids, mask, mask_prob)
        s, c = mlm.mlm_loss_terms(esm_params, lm_head, masked, mask, labels,
                                  esm_cfg)
        s = jax.lax.psum(s, DATA_AXIS)
        c = jax.lax.psum(c, DATA_AXIS)
        return s / jnp.maximum(c, 1.0)

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_packed_mlm_train_step(esm_cfg: esm2.ESM2Config,
                                       optimizer:
                                       optax.GradientTransformation,
                                       mesh, mask_prob: float):
    """DP over the packed single-side wire (train/packed_engine.
    tokenize_packed_rows_sharded): int8 rows shard over 'data', segments/
    positions and per-segment token-dropout ratios derive on device, and
    the loss stays the TRUE global mean over all shards' masked positions
    (psum'd (sum, count) terms, exactly like the plain step above). All-pad
    filler rows on short shards contribute zero terms by construction."""
    from ..train.packed_engine import derive_segments

    def local_step(lm_head, opt_state, esm_params, ids8, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        ids, seg, pos = derive_segments(ids8)
        mask = (seg > 0).astype(jnp.int32)
        masked, labels = mlm.mask_tokens(key, ids, mask, mask_prob)

        def loss_fn(h):
            s, c = mlm.mlm_loss_terms(esm_params, h, masked, mask, labels,
                                      esm_cfg, segment_ids=seg,
                                      positions=pos)
            s = jax.lax.psum(s, DATA_AXIS)
            c = jax.lax.psum(c, DATA_AXIS)
            return s / jnp.maximum(c, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(lm_head)
        # pmean, not psum (see make_sharded_mlm_train_step)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, lm_head)
        return optax.apply_updates(lm_head, updates), opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_packed_mlm_eval_step(esm_cfg: esm2.ESM2Config, mesh,
                                      mask_prob: float):
    from ..train.packed_engine import derive_segments

    def local_step(lm_head, esm_params, ids8, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        ids, seg, pos = derive_segments(ids8)
        mask = (seg > 0).astype(jnp.int32)
        masked, labels = mlm.mask_tokens(key, ids, mask, mask_prob)
        s, c = mlm.mlm_loss_terms(esm_params, lm_head, masked, mask, labels,
                                  esm_cfg, segment_ids=seg, positions=pos)
        s = jax.lax.psum(s, DATA_AXIS)
        c = jax.lax.psum(c, DATA_AXIS)
        return s / jnp.maximum(c, 1.0)

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P()),
        out_specs=P(),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_mlm_finetune_step(esm_cfg: esm2.ESM2Config,
                                   optimizer:
                                   optax.GradientTransformation,
                                   mesh, mask_prob: float, esm_view,
                                   packed: bool = False):
    """DP continued pretraining: the masked-CE gradient reaches the
    backbone across the data mesh.

    ``esm_view(trainable, esm_params)`` is the same hook the single-chip
    CLI threads (cli/mlm_train.py): f32-master cast for --finetune,
    merge_lora for --lora-rank — so one factory serves both. Per-token CE
    has no cross-batch coupling, so plain value_and_grad + remat suffices
    per shard (no gradcache); the loss is the psum'd global mean and
    trainable grads pmean over 'data' (exactly the plain-step scale
    contract). ``packed`` switches the wire to single-side packed rows
    (tokenize_packed_rows_sharded)."""
    from ..train.packed_engine import derive_segments

    def local_step(trainable, opt_state, esm_params, *args):
        *arrs, key = args
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        if packed:
            ids, seg, pos = derive_segments(arrs[0])
            mask = (seg > 0).astype(jnp.int32)
        else:
            ids, mask = arrs
            seg = pos = None
        masked, labels = mlm.mask_tokens(key, ids, mask, mask_prob)

        def loss_fn(t):
            s, c = mlm.mlm_loss_terms(esm_view(t, esm_params), t["head"],
                                      masked, mask, labels, esm_cfg,
                                      remat=True, segment_ids=seg,
                                      positions=pos)
            s = jax.lax.psum(s, DATA_AXIS)
            c = jax.lax.psum(c, DATA_AXIS)
            return s / jnp.maximum(c, 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    n_batch_args = 1 if packed else 2
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P()) + (P(DATA_AXIS),) * n_batch_args + (P(),),
        out_specs=(P(), P(), P()),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_mlm_finetune_eval_step(esm_cfg: esm2.ESM2Config, mesh,
                                        mask_prob: float, esm_view,
                                        packed: bool = False):
    from ..train.packed_engine import derive_segments

    def local_step(trainable, esm_params, *args):
        *arrs, key = args
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        if packed:
            ids, seg, pos = derive_segments(arrs[0])
            mask = (seg > 0).astype(jnp.int32)
        else:
            ids, mask = arrs
            seg = pos = None
        masked, labels = mlm.mask_tokens(key, ids, mask, mask_prob)
        s, c = mlm.mlm_loss_terms(esm_view(trainable, esm_params),
                                  trainable["head"], masked, mask, labels,
                                  esm_cfg, segment_ids=seg, positions=pos)
        s = jax.lax.psum(s, DATA_AXIS)
        c = jax.lax.psum(c, DATA_AXIS)
        return s / jnp.maximum(c, 1.0)

    n_batch_args = 1 if packed else 2
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P()) + (P(DATA_AXIS),) * n_batch_args + (P(),),
        out_specs=P(),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_arrays(mesh, *arrays):
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.device_put(a, sharding) for a in arrays)
