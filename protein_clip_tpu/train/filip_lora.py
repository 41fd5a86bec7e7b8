"""FILIP + LoRA: parameter-efficient token-level finetuning.

The FILIP finetune two-pass (train/filip_finetune.py) with the backbone
view swapped for the adapter merge (train/lora.py): the frozen
compute-dtype base rides the esm_params slot, gradients reach only the
adapters + FILIP token heads, and the temperature grad flows through the
tail as in full finetune. Engine-shaped module so ``loop.fit`` drives it
unchanged (per-batch training like the reference FILIP; plain or packed
batches — cfg.packed rides the packed two-pass via the esm_view hook).
"""

from __future__ import annotations

from typing import Callable

import optax

from .clip_engine import EngineConfig
from .lora import (_resolve_alpha, init_params, make_optimizer,  # noqa: F401
                   merge_lora)

__all__ = ["init_params", "make_optimizer", "make_train_step",
           "make_eval_step"]


def _esm_view(alpha):
    def view(params, esm_params):
        return merge_lora(esm_params, params["lora"],
                          _resolve_alpha(params, alpha))
    return view


def make_train_step(cfg: EngineConfig,
                    optimizer: optax.GradientTransformation,
                    similarity_fn: Callable | None = None,
                    use_dcl: bool | None = None,
                    alpha: float | None = None):
    from .filip_finetune import make_train_step as ft

    return ft(cfg, optimizer, similarity_fn, use_dcl,
              esm_view=_esm_view(alpha))


def make_eval_step(cfg: EngineConfig, similarity_fn: Callable | None = None,
                   use_dcl: bool | None = None, alpha: float | None = None):
    import jax

    from . import filip_engine, filip_packed

    if cfg.packed:
        base = filip_packed.make_eval_step_packed_filip(cfg, similarity_fn,
                                                        use_dcl)
    else:
        base = filip_engine.make_eval_step(cfg, similarity_fn, use_dcl)

    @jax.jit
    def step(params, esm_params, batch):
        merged = merge_lora(esm_params, params["lora"],
                            _resolve_alpha(params, alpha))
        return base(params["heads"], merged, batch)

    return step
