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

Packed FILIP finetune (``cfg.packed``, make_train_step_packed): the same
two passes over packed ROW chunks (train/packed_engine wire). Pass 1
scans chunks through backbone + token head + L2-normalise into a cached
(R, L, D) token tensor per side; the differentiable tail is the frozen
packed path's scatter (flat or scatter-tiers) + fused max-sim + InfoNCE
(train/filip_packed helpers); pass 2 replays each chunk with its own
(r, L, D) cotangent slice — the scatter is a permutation, so slicing the
cached tensor's cotangent by rows IS the per-chunk cotangent. Grouped
batches remain unwired (packing supersedes grouping).
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
           "make_train_step_packed", "make_eval_step"]


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
    if cfg.packed:
        return make_train_step_packed(cfg, optimizer, similarity_fn,
                                      use_dcl, esm_view=esm_view)
    if cfg.length_groups > 1:
        raise ValueError(
            "FILIP finetune trains on plain (tokenize_pair_batch) or "
            "packed (cfg.packed) batches; grouped FILIP finetune is "
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


def _packed_token_machinery(cfg: EngineConfig, sim_fn: Callable,
                            use_dcl: bool, rows_per_chunk: int,
                            esm_view: Callable | None = None):
    """Shared pieces of the packed FILIP finetune: per-chunk token encoder,
    pass-1 scan, the scatter+max-sim+InfoNCE tail, and batch preparation.
    Chunking follows the CLIP packed finetune (constant TOKENS per chunk
    across the two sides' row widths)."""
    from ..models import heads
    from . import packed_engine as pe
    from .filip_packed import (_l2_normalize_tokens, _scatter_side,
                               _sim_from_tiers)
    from .finetune import _chunk_pack

    mcfg = cfg.model
    n_seqs = cfg.batch_size  # FILIP: no grad accumulation (reference)
    if esm_view is None:
        def esm_view(params, esm_params):
            del esm_params  # the backbone lives inside params
            return _cast_esm(params["esm"], mcfg.esm.compute_dtype)

    def chunk_tokens(params, esm_params, side, ids, seg, pos, rng):
        esm_c = esm_view(params, esm_params)
        mask = (seg > 0).astype(jnp.int32)
        h = esm2.forward(esm_c, ids, mask, mcfg.esm, remat=cfg.remat,
                         segment_ids=seg, positions=pos)
        x = heads.encode_tokens(params["heads"][side],
                                h.astype(jnp.float32),
                                dropout_rate=mcfg.dropout, train=True,
                                rng=rng, activation=mcfg.activation)
        return _l2_normalize_tokens(x)

    def scan_tokens(params, esm_params, side, chunks, rngs):
        def body(_, x):
            return None, chunk_tokens(params, esm_params, side, x["ids"],
                                      x["seg"], x["pos"], x["rng"])
        xs = {k: chunks[k] for k in ("ids", "seg", "pos")}
        xs["rng"] = rngs
        _, X = jax.lax.scan(body, None, xs)
        return X  # (n_chunks, r, L, D), row order = the pack's row order

    def tail(params, Xp, Xr, packs, stiers):
        tiers = {}
        for side, X in (("pep", Xp), ("rec", Xr)):
            x = X.reshape(-1, *X.shape[2:])  # (R, L, D), original rows
            tiers[side] = _scatter_side(x, packs[side], stiers[side],
                                        n_seqs, mcfg.embedding_dim)
        sim_a, sim_b = _sim_from_tiers(tiers["pep"], tiers["rec"],
                                       params["heads"]["temperature"],
                                       sim_fn, n_seqs)
        return filip_loss(sim_a, sim_b, use_dcl)

    def prepare(batch, rng):
        batch = pe.expand_packed_batch(batch)
        if "pep_packs" in batch or "rec_packs" in batch:
            raise ValueError(
                "packed FILIP finetune supports flat packing only "
                "(packed_tiers=1; scatter_tiers compose); width-tiered "
                "finetune is not wired")
        l_max = max(batch["pep_ids"].shape[1], batch["rec_ids"].shape[1])
        sides, packs, stiers = {}, {}, {}
        for side, r in zip(("pep", "rec"), jax.random.split(rng)):
            pack = {k: batch[f"{side}_{k}"]
                    for k in ("ids", "seg", "pos", "owner")}
            rpc = rows_per_chunk * (l_max // pack["ids"].shape[1])
            chunks, n = _chunk_pack(pack, rpc)
            sides[side] = (chunks, jax.random.split(r, n))
            packs[side] = pack
            stiers[side] = batch.get(f"{side}_stiers")
        return sides, packs, stiers

    return chunk_tokens, scan_tokens, tail, prepare


def make_packed_token_loss(cfg: EngineConfig,
                           similarity_fn: Callable | None = None,
                           use_dcl: bool | None = None,
                           rows_per_chunk: int | None = None,
                           esm_view: Callable | None = None):
    """Monolithic packed FILIP finetune loss(params, esm_params, batch,
    rng) — the same math as make_train_step_packed's two passes (same
    chunking, same per-chunk dropout keys) differentiated in one graph;
    exists for the exact-grad parity test."""
    from .packed_engine import _default_rows_per_chunk

    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)
    _, scan_tokens, tail, prepare = _packed_token_machinery(
        cfg, sim_fn, use_dcl, rows_per_chunk, esm_view)

    def loss(params, esm_params, batch, rng):
        sides, packs, stiers = prepare(batch, rng)
        X = {side: scan_tokens(params, esm_params, side, *sides[side])
             for side in ("pep", "rec")}
        return tail(params, X["pep"], X["rec"], packs, stiers)

    return loss


def make_train_step_packed(cfg: EngineConfig,
                           optimizer: optax.GradientTransformation,
                           similarity_fn: Callable | None = None,
                           use_dcl: bool | None = None,
                           rows_per_chunk: int | None = None,
                           esm_view: Callable | None = None,
                           donate: bool = False):
    """jit'd unfrozen FILIP step over tokenize_packed wire batches
    (train/filip_packed.tokenize_packed, scatter_tiers supported).

    Three phases inside one jit:
      pass 1   scan packed row-chunks -> cached (n, r, L, D) normalised
               token tensors per side, stop_gradient;
      tail     value_and_grad of scatter -> fused max-sim -> InfoNCE
               w.r.t. (params, X_pep, X_rec) — temperature grads land
               here;
      pass 2   re-scan chunks under jax.vjp (remat'd forward, flash
               attention backward), each chunk fed its own row slice of
               the cached tensor's cotangent (the scatter is a
               permutation of valid tokens; gap/pad cotangents are 0)."""
    from .packed_engine import _default_rows_per_chunk, packed_side_count

    use_dcl = cfg.filip_use_dcl if use_dcl is None else use_dcl
    sim_fn = similarity_fn or default_similarity_fn()
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)
    chunk_tokens, scan_tokens, tail, prepare = _packed_token_machinery(
        cfg, sim_fn, use_dcl, rows_per_chunk, esm_view)
    n_seqs = cfg.batch_size

    def replay(params, esm_params, side, chunks, rngs, dX, acc):
        def body(acc, x):
            _, vjp = jax.vjp(
                lambda p: chunk_tokens(p, esm_params, side, x["ids"],
                                       x["seg"], x["pos"], x["rng"]),
                params)
            (pg,) = vjp(x["dx"])
            return jax.tree.map(jnp.add, acc, pg), None
        xs = {k: chunks[k] for k in ("ids", "seg", "pos")}
        xs["rng"] = rngs
        xs["dx"] = dX
        acc, _ = jax.lax.scan(body, acc, xs)
        return acc

    def step(params, opt_state, esm_params, batch, rng):
        if not any(k in batch for k in ("pep_operm", "pep_seg", "pep_packs")):
            raise ValueError(
                "packed FILIP finetune step needs tokenize_packed batches")
        for side in ("pep", "rec"):
            got = packed_side_count(batch, side)
            if got != n_seqs:
                raise ValueError(
                    f"packed batch has {got} {side} sequences but "
                    f"batch_size={n_seqs}")
        sides, packs, stiers = prepare(batch, rng)

        X = {side: jax.lax.stop_gradient(
                scan_tokens(params, esm_params, side, *sides[side]))
             for side in ("pep", "rec")}

        loss, (grads, dXp, dXr) = jax.value_and_grad(
            tail, argnums=(0, 1, 2))(params, X["pep"], X["rec"], packs,
                                     stiers)

        grads = replay(params, esm_params, "pep", *sides["pep"], dXp, grads)
        grads = replay(params, esm_params, "rec", *sides["rec"], dXr, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_eval_step(cfg: EngineConfig, similarity_fn: Callable | None = None,
                   use_dcl: bool | None = None):
    """FILIP eval over the combined pytree: the frozen-engine eval
    (packed or plain, matching cfg) fed the finetuned backbone, cast
    in-jit to the compute dtype."""
    from . import filip_engine, filip_packed

    if cfg.packed:
        base = filip_packed.make_eval_step_packed_filip(cfg, similarity_fn,
                                                        use_dcl)
    else:
        base = filip_engine.make_eval_step(cfg, similarity_fn, use_dcl)

    @jax.jit
    def step(params, esm_params, batch):
        del esm_params
        esm_c = _cast_esm(params["esm"], cfg.model.esm.compute_dtype)
        return base(params["heads"], esm_c, batch)

    return step
