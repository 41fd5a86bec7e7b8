"""UNFROZEN-backbone FILIP finetune: two-pass gradcache at token level.

Same pass structure as the CLIP finetune engine (train/finetune.py), but
the cached quantity is the per-token embedding TENSOR, not a pooled
vector: FILIP's late-interaction loss (reference
modules/training_utils_filip.py + models.py:292-356) consumes every
token of both sides, so

  pass 1   scan microbatch chunks through backbone + token heads
           -> (n, b, T, D) normalised token embeddings per side,
           stop_gradient (no graph held);
  tail     value_and_grad of similarity (fused Pallas max-sim kernel,
           budget-blocked backward) + InfoNCE w.r.t. (params, HA, HB) —
           the temperature parameter gets its grad here;
  pass 2   replay each chunk under jax.vjp feeding its (b, T, D)
           cotangent slices, accumulating parameter grads.

Unlike the pooled CLIP case there is no shared-cotangent trick — each
chunk's cotangent is its own slice of (dHA, dHB) — but the cache is
still tiny: B x T x D f32 per side (16 MB at batch 128, T 512, D 64),
nothing like the (B, nh, T, T) attention graphs the monolithic backward
would hold.

The reference runs FILIP at batch 10 because its FROZEN-backbone score
tensor already blows GPU memory (main_2protein_filip.py:33); an
unfrozen FILIP backbone is far outside its reach at any batch.

Params pytree, optimizer, and step signature match train/finetune.py:
``{"esm": f32 masters, "heads": filip params}``, two-group Adam via
``make_optimizer`` (re-exported), ``loop.fit`` drives it unchanged with
``use_gradcache=False`` (FILIP trains per-batch, as the reference).
Plain single-bucket batches only (v1): packed/grouped FILIP finetune is
not wired.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models import esm2, filip
from ..ops.infonce import filip_loss
from .clip_engine import EngineConfig, expand_batch
from .filip_engine import _snap_chunks, default_similarity_fn
from .finetune import _cast_esm, init_params, make_optimizer

Params = dict[str, Any]

__all__ = ["init_params", "make_optimizer", "make_train_step",
           "make_eval_step"]


def _token_machinery(cfg: EngineConfig, sim_fn: Callable, use_dcl: bool,
                     esm_view: Callable | None = None):
    """(encode_chunk, chunk_batch, tail) closures shared by the two-pass
    step and the monolithic loss.

    esm_view(params, esm_params) -> the compute-dtype backbone the chunks
    run on; default casts the full-finetune f32 masters (esm_params
    ignored), LoRA overrides with the adapter merge (train/lora.py)."""
    mcfg = cfg.model
    if esm_view is None:
        def esm_view(params, esm_params):
            del esm_params  # the backbone lives inside params
            return _cast_esm(params["esm"], mcfg.esm.compute_dtype)

    def encode_chunk(params, esm_params, chunk):
        esm_c = esm_view(params, esm_params)
        rp, rr = jax.random.split(chunk["rng"])
        hp = esm2.forward(esm_c, chunk["pep_ids"], chunk["pep_mask"],
                          mcfg.esm, remat=cfg.remat)
        hr = esm2.forward(esm_c, chunk["rec_ids"], chunk["rec_mask"],
                          mcfg.esm, remat=cfg.remat)
        ha = filip.encode_side_tokens(params["heads"], "pep",
                                      hp.astype(jnp.float32), mcfg,
                                      train=True, rng=rp)
        hb = filip.encode_side_tokens(params["heads"], "rec",
                                      hr.astype(jnp.float32), mcfg,
                                      train=True, rng=rr)
        return ha, hb

    def chunk_batch(batch, n: int, rng):
        B = batch["pep_ids"].shape[0]
        if B % n:
            raise ValueError(f"batch {B} not divisible by num_chunks {n}")
        out = {k: batch[k].reshape(n, B // n, *batch[k].shape[1:])
               for k in ("pep_ids", "pep_mask", "rec_ids", "rec_mask")}
        out["rng"] = jax.random.split(rng, n)
        return out

    def tail(params, HA, HB, mask_a, mask_b):
        B = mask_a.shape[0]
        sim_a, sim_b = sim_fn(HA.reshape(B, *HA.shape[2:]),
                              HB.reshape(B, *HB.shape[2:]),
                              mask_a, mask_b,
                              params["heads"]["temperature"])
        return filip_loss(sim_a, sim_b, use_dcl)

    return encode_chunk, chunk_batch, tail


def make_token_loss(cfg: EngineConfig, similarity_fn: Callable | None = None,
                    use_dcl: bool | None = None,
                    esm_view: Callable | None = None):
    """Monolithic loss(params, esm_params, batch, rng) — the same math as
    make_train_step's two passes differentiated in one graph; exists for
    the exact-grad parity test."""
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()
    encode_chunk, chunk_batch, tail = _token_machinery(cfg, sim_fn, use_dcl,
                                                       esm_view)
    n = _snap_chunks(cfg.batch_size, cfg.num_chunks)

    def loss(params, esm_params, batch, rng):
        batch = expand_batch(batch)
        chunks = chunk_batch(batch, n, rng)

        def body(_, c):
            return None, encode_chunk(params, esm_params, c)
        _, (HA, HB) = jax.lax.scan(body, None, chunks)
        return tail(params, HA, HB, batch["pep_mask"], batch["rec_mask"])

    return loss


def make_train_step(cfg: EngineConfig,
                    optimizer: optax.GradientTransformation,
                    similarity_fn: Callable | None = None,
                    use_dcl: bool | None = None,
                    esm_view: Callable | None = None):
    """jit'd unfrozen FILIP step: (params, opt_state, esm_params, batch,
    rng) -> (params, opt_state, loss) over tokenize_pair_batch batches.
    esm_params is ignored by the default full finetune (backbone inside
    params) and carries the frozen base under an esm_view override."""
    if cfg.packed or cfg.length_groups > 1:
        raise ValueError(
            "FILIP finetune v1 trains on plain single-bucket batches "
            "(tokenize_pair_batch); packed/grouped FILIP finetune is "
            "not wired")
    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()
    encode_chunk, chunk_batch, tail = _token_machinery(cfg, sim_fn, use_dcl,
                                                       esm_view)
    n = _snap_chunks(cfg.batch_size, cfg.num_chunks)

    def step(params, opt_state, esm_params, batch, rng):
        batch = expand_batch(batch)
        chunks = chunk_batch(batch, n, rng)

        def body(_, c):
            return None, encode_chunk(params, esm_params, c)
        _, (HA, HB) = jax.lax.scan(body, None, chunks)
        HA = jax.lax.stop_gradient(HA)
        HB = jax.lax.stop_gradient(HB)

        loss, (grads, dHA, dHB) = jax.value_and_grad(
            tail, argnums=(0, 1, 2))(params, HA, HB, batch["pep_mask"],
                                     batch["rec_mask"])

        def body2(acc, x):
            c, ga, gb = x
            _, vjp = jax.vjp(lambda p: encode_chunk(p, esm_params, c),
                             params)
            (pg,) = vjp((ga, gb))
            return jax.tree.map(jnp.add, acc, pg), None

        grads, _ = jax.lax.scan(body2, grads, (chunks, dHA, dHB))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def make_eval_step(cfg: EngineConfig, similarity_fn: Callable | None = None,
                   use_dcl: bool | None = None):
    """FILIP eval over the combined pytree: the frozen-engine eval fed the
    finetuned backbone, cast in-jit to the compute dtype."""
    from . import filip_engine

    base = filip_engine.make_eval_step(cfg, similarity_fn, use_dcl)

    @jax.jit
    def step(params, esm_params, batch):
        del esm_params
        esm_c = _cast_esm(params["esm"], cfg.model.esm.compute_dtype)
        return base(params["heads"], esm_c, batch)

    return step
