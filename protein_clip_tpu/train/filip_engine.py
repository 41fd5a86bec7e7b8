"""FILIP training engine (reference modules/training_utils_filip.py).

Per-batch training (the reference runs FILIP without GradCache,
main_2protein_filip.py:63), loss = symmetric average of the two direction
InfoNCEs over the late-interaction similarity matrices. The similarity is
the fused Pallas kernel by default on TPU (ops/filip_pallas.py); the fused
kernel plus the chunk-scanned backbone (cfg.num_chunks) lift the
reference's batch-10 memory wall (main_2protein_filip.py:33) by >10x.

With cfg.length_groups > 1 the batch arrives length-grouped
(clip_engine.tokenize_grouped): each group's backbone runs at its own pad
bucket and the (B, B) similarity assembles from per-(group, group) fused
kernel blocks — negatives still span the whole batch and the diagonal
stays aligned because pairs were permuted jointly.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models import filip
from ..ops.infonce import filip_loss
from ..ops.filip_pallas import filip_similarity_fused
from .clip_engine import EngineConfig, expand_batch

Params = dict[str, Any]


def default_similarity_fn():
    """Fused kernel on TPU, lax elsewhere (interpret mode is slow for the
    inner-loop of training)."""
    if jax.default_backend() == "tpu":
        return filip_similarity_fused
    return filip.filip_similarity


def _snap_chunks(batch: int, want: int) -> int:
    n = max(1, min(want, batch))
    while batch % n:
        n -= 1
    return n


def make_train_step(cfg: EngineConfig,
                    optimizer: optax.GradientTransformation,
                    similarity_fn: Callable | None = None,
                    use_dcl: bool | None = None):
    if cfg.packed:
        from .filip_packed import make_train_step_packed_filip
        return make_train_step_packed_filip(cfg, optimizer, similarity_fn,
                                            use_dcl)
    if cfg.length_groups > 1:
        return make_train_step_grouped(cfg, optimizer, similarity_fn,
                                       use_dcl)
    mcfg = cfg.model
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()
    n_chunks = _snap_chunks(cfg.batch_size, cfg.num_chunks)

    def loss_fn(params, esm_params, batch, rng):
        batch = expand_batch(batch)
        sim_a, sim_b = filip.forward(params, esm_params, batch, mcfg,
                                     train=True, rng=rng, remat=cfg.remat,
                                     similarity_fn=sim_fn,
                                     num_chunks=n_chunks)
        return filip_loss(sim_a, sim_b, use_dcl)

    @jax.jit
    def step(params, opt_state, esm_params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, esm_params, batch,
                                                  rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_train_step_grouped(cfg: EngineConfig,
                            optimizer: optax.GradientTransformation,
                            similarity_fn: Callable | None = None,
                            use_dcl: bool | None = None):
    """FILIP step over tokenize_grouped batches: per-group backbone buckets,
    block-assembled (B, B) similarity so the negative pool spans groups."""
    mcfg = cfg.model
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()

    def loss_fn(params, esm_params, batches, rng):
        batches = [expand_batch(b) for b in batches]
        sides = []
        for b in batches:
            rng, sub = jax.random.split(rng)
            n_chunks = _snap_chunks(
                b["pep_ids"].shape[0],
                max(1, cfg.num_chunks // len(batches)))
            ha, hb = filip.encode_batch_tokens(
                params, esm_params, b, mcfg, train=True, rng=sub,
                remat=cfg.remat, num_chunks=n_chunks)
            sides.append((ha, hb, b["pep_mask"], b["rec_mask"]))
        n = len(sides)
        blocks_a = [[None] * n for _ in range(n)]
        blocks_b = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(n):
                sa, sb = sim_fn(sides[i][0], sides[j][1], sides[i][2],
                                sides[j][3], params["temperature"])
                blocks_a[i][j] = sa
                blocks_b[i][j] = sb
        sim_a = jnp.block(blocks_a)
        sim_b = jnp.block(blocks_b)
        return filip_loss(sim_a, sim_b, use_dcl)

    @jax.jit
    def step(params, opt_state, esm_params, batches, rng):
        if isinstance(batches, dict):
            raise ValueError(
                "grouped FILIP step needs a tuple of tokenize_grouped "
                "batches (cfg.length_groups > 1 pairs with the grouped "
                "tokenizer)")
        loss, grads = jax.value_and_grad(loss_fn)(params, esm_params,
                                                  tuple(batches), rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_eval_step(cfg: EngineConfig, similarity_fn: Callable | None = None,
                   use_dcl: bool | None = None):
    """FILIP eval dispatched on the train data path (packed / grouped /
    plain) so a val epoch rides the same padding-waste cuts as training."""
    if cfg.packed:
        from .filip_packed import make_eval_step_packed_filip
        return make_eval_step_packed_filip(cfg, similarity_fn, use_dcl)
    if cfg.length_groups > 1:
        return make_eval_step_grouped(cfg, similarity_fn, use_dcl)
    mcfg = cfg.model
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()
    n_chunks = _snap_chunks(cfg.batch_size, cfg.num_chunks)

    @jax.jit
    def step(params, esm_params, batch):
        batch = expand_batch(batch)
        sim_a, sim_b = filip.forward(params, esm_params, batch, mcfg,
                                     train=False, similarity_fn=sim_fn,
                                     num_chunks=n_chunks)
        return filip_loss(sim_a, sim_b, use_dcl)

    return step


def make_eval_step_grouped(cfg: EngineConfig,
                           similarity_fn: Callable | None = None,
                           use_dcl: bool | None = None):
    """FILIP eval over tokenize_grouped batches: per-group buckets,
    block-assembled (B, B) similarity (the grouped train path, no grads)."""
    mcfg = cfg.model
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()

    @jax.jit
    def step(params, esm_params, batches):
        if isinstance(batches, dict):
            raise ValueError(
                "grouped FILIP eval step needs a tuple of tokenize_grouped "
                "batches")
        batches = [expand_batch(b) for b in batches]
        sides = []
        for b in batches:
            n_chunks = _snap_chunks(
                b["pep_ids"].shape[0],
                max(1, cfg.num_chunks // len(batches)))
            ha, hb = filip.encode_batch_tokens(
                params, esm_params, b, mcfg, train=False,
                remat=cfg.remat, num_chunks=n_chunks)
            sides.append((ha, hb, b["pep_mask"], b["rec_mask"]))
        n = len(sides)
        blocks_a = [[None] * n for _ in range(n)]
        blocks_b = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(n):
                sa, sb = sim_fn(sides[i][0], sides[j][1], sides[i][2],
                                sides[j][3], params["temperature"])
                blocks_a[i][j] = sa
                blocks_b[i][j] = sb
        return filip_loss(jnp.block(blocks_a), jnp.block(blocks_b), use_dcl)

    return step
