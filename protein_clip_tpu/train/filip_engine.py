"""FILIP training engine (reference modules/training_utils_filip.py).

Per-batch training (the reference runs FILIP without GradCache,
main_2protein_filip.py:63), loss = symmetric average of the two direction
InfoNCEs over the late-interaction similarity matrices. The similarity is
the fused Pallas kernel by default on TPU (ops/filip_pallas.py), letting the
batch scale ~13x past the reference's 10.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
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


def make_train_step(cfg: EngineConfig,
                    optimizer: optax.GradientTransformation,
                    similarity_fn: Callable | None = None,
                    use_dcl: bool | None = None):
    mcfg = cfg.model
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()

    def loss_fn(params, esm_params, batch, rng):
        batch = expand_batch(batch)
        sim_a, sim_b = filip.forward(params, esm_params, batch, mcfg,
                                     train=True, rng=rng, remat=cfg.remat,
                                     similarity_fn=sim_fn)
        return filip_loss(sim_a, sim_b, use_dcl)

    @jax.jit
    def step(params, opt_state, esm_params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, esm_params, batch,
                                                  rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_eval_step(cfg: EngineConfig, similarity_fn: Callable | None = None,
                   use_dcl: bool | None = None):
    mcfg = cfg.model
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()

    @jax.jit
    def step(params, esm_params, batch):
        batch = expand_batch(batch)
        sim_a, sim_b = filip.forward(params, esm_params, batch, mcfg,
                                     train=False, similarity_fn=sim_fn)
        return filip_loss(sim_a, sim_b, use_dcl)

    return step
