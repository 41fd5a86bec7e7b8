"""LoRA: parameter-efficient finetuning of the ESM-2 backbone.

Low-rank adapters (Hu et al. 2021) on the attention projection weights
(optionally the FFN): each stacked weight W (L, H, O) gains trainable
A (L, H, r), B (L, r, O) with B zero-initialised, and the model runs on
the EFFECTIVE weights W + (alpha/r) * A@B. Zero-init means step 0 is
exactly the frozen model.

TPU-first shape: instead of threading adapter matmuls through the layer
code (branchy, breaks the fused-attention custom call), ``merge_lora``
materialises the effective weights ONCE per step — a single batched
einsum over the scan-stacked layer axis, one HBM pass over the touched
leaves — and the unchanged ``esm2.forward`` (Pallas kernels included)
runs on them. Autodiff chains through the merge, so d(loss)/d(A, B)
falls out of the same two-pass gradcache the full finetune uses; the
frozen base weights stay a constant (passed through the engine's
esm_params slot, in compute dtype) and get NO gradient buffers.

What LoRA buys here is OPTIMIZER STATE, not backward FLOPs: Adam moments
exist only for the adapters + heads (rank 8 on t33_650M: ~6 MB vs the
~5.2 GB of f32 master+moments full finetuning carries) — the
one-chip-finetunes-650M/3B enabler. The backward still computes dense
dW per layer (it must, to reach A/B), so throughput ~matches full
finetune.

Params pytree: ``{"lora": {path: {"a", "b"}}, "heads": clip params}``;
step signature matches the other engines, with the FROZEN compute-dtype
backbone in the esm_params slot (NOT ignored, unlike train/finetune.py).
``loop.fit`` drives it unchanged (engine=lora).
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models import clip, esm2
from .clip_engine import EngineConfig, default_loss_fn, expand_batch
from .finetune import _chunked
from .gradcache import gradcache_value_and_grad

Params = dict[str, Any]

# attention-only is the classic LoRA recipe; "wi"/"wo" extend to the FFN
ATTN_TARGETS = ("q", "k", "v", "o")
FFN_TARGETS = ("wi", "wo")


def _target_leaves(esm_params: Params, targets) -> dict[str, jax.Array]:
    out = {}
    layers = esm_params["layers"]
    for t in targets:
        group = "attn" if t in ATTN_TARGETS else "ffn"
        out[f"{group}/{t}"] = layers[group][t]["w"]
    return out


def init_lora(key: jax.Array, esm_params: Params, rank: int = 8,
              targets=ATTN_TARGETS) -> Params:
    """A ~ N(0, 1/rank) f32, B = 0 (so the initial model is the frozen
    one exactly); per-layer matrices ride the stacked L axis."""
    out = {}
    for name, w in _target_leaves(esm_params, targets).items():
        L, H, O = w.shape
        key, sub = jax.random.split(key)
        out[name] = {
            "a": (jax.random.normal(sub, (L, H, rank), jnp.float32)
                  / jnp.sqrt(rank)),
            "b": jnp.zeros((L, rank, O), jnp.float32),
        }
    return out


def merge_lora(esm_params: Params, lora: Params, alpha: float) -> Params:
    """Effective weights: W + (alpha/r) * A@B, batched over the layer
    axis, cast back to W's dtype (the cast VJP routes compute-dtype
    cotangents into the f32 adapters)."""
    out = {k: v for k, v in esm_params.items()}
    layers = {k: dict(v) for k, v in esm_params["layers"].items()}
    for name, ab in lora.items():
        group, t = name.split("/")
        leaf = dict(layers[group][t])
        w = leaf["w"]
        r = ab["a"].shape[-1]
        delta = jnp.einsum("lhr,lro->lho", ab["a"], ab["b"],
                           preferred_element_type=jnp.float32)
        leaf["w"] = w + (alpha / r * delta).astype(w.dtype)
        layers[group] = {**layers[group], t: leaf}
    out["layers"] = layers
    return out


def init_params(lora: Params, head_params: Params) -> Params:
    return {"lora": lora, "heads": head_params}


def make_optimizer(cfg: EngineConfig) -> optax.GradientTransformation:
    """Two-group: heads at cfg.learning_rate, adapters at cfg.backbone_lr
    (default 1e-4 — adapters start at zero effect and tolerate a much
    hotter rate than full-finetune backbones)."""
    from . import optimizer as opt_mod

    ad_lr = cfg.backbone_lr if cfg.backbone_lr is not None else 1e-4
    opt = optax.multi_transform(
        {"lora": opt_mod.from_config(cfg, lr=ad_lr, grad_clip=0.0),
         "heads": opt_mod.from_config(cfg, grad_clip=0.0)},
        lambda params: {
            "lora": jax.tree.map(lambda _: "lora", params["lora"]),
            "heads": jax.tree.map(lambda _: "heads", params["heads"]),
        })
    # whole-tree clip, hoisted outside the multi_transform (see
    # finetune.make_optimizer)
    if cfg.grad_clip:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def default_alpha(rank: int) -> float:
    """The alpha the engines use when none is passed explicitly:
    PCT_LORA_ALPHA if set, else the 2*rank convention. Any consumer
    merging adapters OUTSIDE the engines (viz hooks, eval views,
    checkpoint loaders) must resolve alpha through this so the plotted/
    evaluated model matches the trained one."""
    env = os.environ.get("PCT_LORA_ALPHA")
    return float(env) if env is not None else 2.0 * rank


def make_train_step(cfg: EngineConfig,
                    optimizer: optax.GradientTransformation,
                    loss_fn: Callable | None = None,
                    alpha: float | None = None):
    """jit'd LoRA step: (params, opt_state, esm_params, batch, rng) ->
    (params, opt_state, loss). esm_params = the FROZEN compute-dtype
    backbone; alpha defaults to 2*rank (PCT_LORA_ALPHA overrides)."""
    loss_fn = loss_fn or default_loss_fn()
    if cfg.packed:
        return make_train_step_packed(cfg, optimizer, loss_fn, alpha=alpha)
    if cfg.length_groups > 1:
        raise ValueError(
            "LoRA trains on plain (tokenize_pair_batch) or packed "
            "(cfg.packed) batches; length-grouped LoRA is not wired")
    mcfg = cfg.model
    n = cfg.num_chunks

    def encode(side, esm_params):
        def fn(params, chunk):
            merged = merge_lora(esm_params, params["lora"],
                                _resolve_alpha(params, alpha))
            h = esm2.forward(merged, chunk["ids"], chunk["mask"], mcfg.esm,
                             remat=cfg.remat)
            return clip.encode_side(params["heads"], side,
                                    h.astype(jnp.float32), chunk["mask"],
                                    mcfg, train=True, rng=chunk["rng"])
        return fn

    def step(params, opt_state, esm_params, batch, rng):
        batch = expand_batch(batch)
        rp, rr = jax.random.split(rng)
        chunks_x = _chunked(batch, "pep", n, rp)
        chunks_y = _chunked(batch, "rec", n, rr)
        loss, grads = gradcache_value_and_grad(
            encode("pep", esm_params), loss_fn, params, chunks_x, chunks_y,
            encode_fn_y=encode("rec", esm_params))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def _resolve_alpha(params, alpha):
    if alpha is not None:
        return alpha
    return default_alpha(next(iter(params["lora"].values()))["a"].shape[-1])


def make_train_step_packed(cfg: EngineConfig,
                           optimizer: optax.GradientTransformation,
                           loss_fn: Callable | None = None,
                           rows_per_chunk: int | None = None,
                           alpha: float | None = None):
    """Packed-row LoRA: the packed finetune two-pass (train/finetune.py
    make_train_step_packed) with the backbone view swapped for the
    adapter merge — esm_params carries the FROZEN compute-dtype base and
    gradients reach only adapters + heads."""
    from .finetune import make_train_step_packed as ft_packed

    def esm_view(params, esm_params):
        return merge_lora(esm_params, params["lora"],
                          _resolve_alpha(params, alpha))

    return ft_packed(cfg, optimizer, loss_fn, rows_per_chunk,
                     esm_view=esm_view)


def make_eval_step(cfg: EngineConfig, loss_fn: Callable | None = None,
                   alpha: float | None = None):
    """Eval: merge once, run the frozen-engine eval step on the effective
    weights."""
    from . import clip_engine

    loss_fn = loss_fn or default_loss_fn()
    base = clip_engine.make_eval_step(cfg, loss_fn)

    @jax.jit
    def step(params, esm_params, batch):
        merged = merge_lora(esm_params, params["lora"],
                            _resolve_alpha(params, alpha))
        return base(params["heads"], merged, batch)

    return step
