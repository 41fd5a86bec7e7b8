"""End-to-end finetuning: the UNFROZEN-backbone CLIP engine.

The reference freezes its ESM-2 backbone everywhere (main.py:20-24) and
needs the GradCache library (training_utils.py:92-155) just to fit 256
negatives with frozen encoders. This module goes where the reference
cannot: the backbone itself trains, with the same 256-negative global
batch, using the pieces built for it —

- the generic two-pass gradcache (``train/gradcache.py``): pass 1 scans
  the encoder over microbatches without a graph, the global InfoNCE
  differentiates w.r.t. the concatenated embeddings, pass 2 replays each
  microbatch under ``jax.vjp`` feeding the cached cotangents;
- the flash-style Pallas attention backward (``ops/attention_pallas.py``),
  so the backbone backward never materialises (B, nh, T, T) scores;
- ``jax.checkpoint`` rematerialisation inside each microbatch (the remat
  flag finally has a backward to save memory FOR).

Mixed precision the TPU way: master params stay f32 (Adam moments in f32
— bf16 Adam loses update bits), one in-step cast to the backbone's
compute dtype feeds the matmuls, and the cast's VJP routes bf16
cotangents back into f32 accumulators. Heads and loss compute in f32 as
in the frozen engine.

Params pytree: ``{"esm": <esm2 params, f32>, "heads": <clip params>}``.
The step signature matches the other engines
(params, opt_state, esm_params, batch, rng) so ``loop.fit`` drives it
unchanged — the ``esm_params`` slot is ignored (pass ``{}``): the
backbone lives INSIDE params now.

Two learning rates: heads at ``cfg.learning_rate`` (reference 1e-3),
backbone at ``cfg.backbone_lr`` (default 1e-5 — 1e-3 on a pretrained
backbone destroys it) via ``make_optimizer`` (optax.multi_transform);
``loop.fit`` picks that hook up automatically.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models import clip, esm2
from .clip_engine import EngineConfig, default_loss_fn, expand_batch
from .gradcache import gradcache_value_and_grad

Params = dict[str, Any]

__all__ = ["init_params", "make_optimizer", "make_train_step",
           "make_eval_step"]


def init_params(esm_params: Params, head_params: Params) -> Params:
    """Combine backbone + head params into the finetune pytree.

    The backbone master copy is kept (cast to) f32: Adam's moment updates
    underflow in bf16, and the per-step compute-dtype cast inside the
    step is one HBM pass."""
    esm_f32 = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, esm_params)
    return {"esm": esm_f32, "heads": head_params}


def make_optimizer(cfg: EngineConfig) -> optax.GradientTransformation:
    """Two-group Adam: heads at cfg.learning_rate, backbone at
    cfg.backbone_lr (loop.fit calls this instead of plain adam when the
    engine module exposes it)."""
    from . import optimizer as opt_mod

    bb_lr = cfg.backbone_lr if cfg.backbone_lr is not None else 1e-5
    return optax.multi_transform(
        {"esm": opt_mod.adam(bb_lr), "heads": opt_mod.adam(cfg.learning_rate)},
        lambda params: {
            "esm": jax.tree.map(lambda _: "esm", params["esm"]),
            "heads": jax.tree.map(lambda _: "heads", params["heads"]),
        })


def _cast_esm(esm_params: Params, dtype) -> Params:
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, esm_params)


def _chunked(batch, side: str, n: int, rng):
    ids = batch[f"{side}_ids"]
    mask = batch[f"{side}_mask"]
    B, T = ids.shape
    if B % n:
        raise ValueError(f"global batch {B} not divisible by num_chunks {n}")
    return {
        "ids": ids.reshape(n, B // n, T),
        "mask": mask.reshape(n, B // n, T),
        # per-chunk dropout keys: pass 2's vjp replay re-traces the SAME
        # encode (same chunk rng), so the dropout mask is identical in
        # both passes — the gradcache invariant.
        "rng": jax.random.split(rng, n),
    }


def make_train_step(cfg: EngineConfig,
                    optimizer: optax.GradientTransformation,
                    loss_fn: Callable | None = None,
                    donate: bool | None = None):
    """jit'd unfrozen train step: (params, opt_state, _, batch, rng) ->
    (params, opt_state, loss) over ``tokenize_pair_batch`` batches.

    donate: donate params/opt_state buffers to the step (default via
    PCT_FINETUNE_DONATE, off). At t33_650M f32 the params+Adam state are
    ~7.8 GB — without donation the update holds two copies (~15.6 GB,
    over the v5e HBM); with donation XLA writes updates in place. Leave
    OFF when the caller keeps references to old params (loop.fit's
    best-params snapshot does)."""
    loss_fn = loss_fn or default_loss_fn()
    if donate is None:
        donate = os.environ.get("PCT_FINETUNE_DONATE", "0") != "0"
    if cfg.packed or cfg.length_groups > 1:
        raise ValueError(
            "finetune v1 trains on plain single-bucket batches "
            "(tokenize_pair_batch); packed/grouped finetune is not wired")
    mcfg = cfg.model
    n = cfg.num_chunks

    def encode(side):
        def fn(params, chunk):
            esm_c = _cast_esm(params["esm"], mcfg.esm.compute_dtype)
            h = esm2.forward(esm_c, chunk["ids"], chunk["mask"], mcfg.esm,
                             remat=cfg.remat)
            return clip.encode_side(params["heads"], side,
                                    h.astype(jnp.float32), chunk["mask"],
                                    mcfg, train=True, rng=chunk["rng"])
        return fn

    def step(params, opt_state, esm_params, batch, rng):
        del esm_params  # the backbone lives inside params
        batch = expand_batch(batch)
        rp, rr = jax.random.split(rng)
        chunks_x = _chunked(batch, "pep", n, rp)
        chunks_y = _chunked(batch, "rec", n, rr)
        loss, grads = gradcache_value_and_grad(
            encode("pep"), loss_fn, params, chunks_x, chunks_y,
            encode_fn_y=encode("rec"))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_eval_step(cfg: EngineConfig, loss_fn: Callable | None = None):
    """Eval over the combined pytree: the frozen-engine eval step fed the
    finetuned backbone (cast in-jit to the compute dtype)."""
    from . import clip_engine

    loss_fn = loss_fn or default_loss_fn()
    base = clip_engine.make_eval_step(cfg, loss_fn)

    @jax.jit
    def step(params, esm_params, batch):
        del esm_params
        esm_c = _cast_esm(params["esm"], cfg.model.esm.compute_dtype)
        return base(params["heads"], esm_c, batch)

    return step
