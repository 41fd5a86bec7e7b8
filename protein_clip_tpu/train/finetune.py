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

Packed finetune (``cfg.packed``): the same two-pass structure over
packed ROW chunks instead of sequence chunks. The gradcache trick is
even cleaner here than in the plain path: per-sequence pooling is a
segment scatter-ADD of per-chunk partial (sums, counts), and addition
distributes cotangents unchanged — so pass 2 feeds every chunk the SAME
global ``d_sums`` array; nothing per-chunk is cached. Chunk outputs are
(n_seqs, D) partial token-head sums (zero rows for sequences the chunk
doesn't own); the differentiable tail is masked-mean -> emb_ffn ->
normalize -> exp(t/2) -> InfoNCE.
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
           "make_train_step_packed", "make_eval_step"]


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
    """Two-group Adam/AdamW: heads at cfg.learning_rate, backbone at
    cfg.backbone_lr (loop.fit calls this instead of the default when the
    engine module exposes it). Weight decay / warmup / cosine schedule
    knobs (train/optimizer.build) apply to both groups at their own
    peak learning rates."""
    from . import optimizer as opt_mod

    bb_lr = cfg.backbone_lr if cfg.backbone_lr is not None else 1e-5
    opt = optax.multi_transform(
        {"esm": opt_mod.from_config(cfg, lr=bb_lr, grad_clip=0.0),
         "heads": opt_mod.from_config(cfg, grad_clip=0.0)},
        lambda params: {
            "esm": jax.tree.map(lambda _: "esm", params["esm"]),
            "heads": jax.tree.map(lambda _: "heads", params["heads"]),
        })
    # clip by the WHOLE-tree global norm (backbone + heads together),
    # not per group — hence hoisted outside the multi_transform
    if cfg.grad_clip:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


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
    if cfg.packed:
        return make_train_step_packed(cfg, optimizer, loss_fn, donate=donate)
    if cfg.length_groups > 1:
        raise ValueError(
            "finetune trains on plain (tokenize_pair_batch) or packed "
            "(cfg.packed) batches; length-grouped finetune is not wired")
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


def _chunk_pack(pack, rows_per_chunk: int):
    """Reshape one expanded pack's row-major arrays into (n_chunks, r, L).

    Same divisor rule as the frozen path's _encode_packed_chunked: the
    largest chunk count with R/rows_per_chunk as ceiling that divides R."""
    R, L = pack["ids"].shape
    n = max(1, R // rows_per_chunk)
    while R % n:
        n -= 1
    return {k: pack[k].reshape(n, R // n, L)
            for k in ("ids", "seg", "pos", "owner")}, n


def _default_expand_sides(batch):
    """Single-device wire -> per-side expanded packs (flat packing only)."""
    from . import packed_engine as pe

    batch = pe.expand_packed_batch(batch)
    if "pep_packs" in batch or "rec_packs" in batch:
        raise ValueError(
            "packed finetune supports flat packing only "
            "(packed_tiers=1); width-tiered finetune is not wired")
    return {side: {k: batch[f"{side}_{k}"]
                   for k in ("ids", "seg", "pos", "owner")}
            for side in ("pep", "rec")}


def _packed_machinery(cfg: EngineConfig, loss_fn: Callable,
                      rows_per_chunk: int, esm_view: Callable | None = None,
                      n_seqs: int | None = None,
                      expand_sides: Callable | None = None):
    """Shared pieces of the packed finetune two-pass: per-chunk
    partial-sums encoder, pass-1 scan, the differentiable tail, and the
    pass-2 cotangent replay. Returns (chunk_sums, scan_sums, tail,
    prepare, replay) closures; ``prepare`` turns a wire batch + rng into
    ((chunks, rngs) per side, tail rngs).

    esm_view(params, esm_params) -> the compute-dtype backbone tree the
    chunks run on. Default: cast the finetune engine's f32 master copy
    (esm_params ignored). LoRA overrides it with the adapter merge
    (train/lora.py), giving packed parameter-efficient finetuning from
    the same two passes.

    n_seqs / expand_sides parameterize the DP variant
    (parallel/finetune_step.make_sharded_packed_finetune_step): per-shard
    sequence count and the sharded wire's per-side pack expansion; its
    loss_fn all-gathers the pooled embeddings so negatives span the mesh.
    Defaults are the single-device step's."""
    from . import packed_engine as pe

    mcfg = cfg.model
    if n_seqs is None:
        n_seqs = cfg.global_batch
    if expand_sides is None:
        expand_sides = _default_expand_sides
    if esm_view is None:
        def esm_view(params, esm_params):
            del esm_params  # the backbone lives inside params
            return _cast_esm(params["esm"], mcfg.esm.compute_dtype)

    def chunk_sums(params, esm_params, side, ids, seg, pos, owner, rng):
        esm_c = esm_view(params, esm_params)
        mask = (seg > 0).astype(jnp.int32)
        h = esm2.forward(esm_c, ids, mask, mcfg.esm, remat=cfg.remat,
                         segment_ids=seg, positions=pos)
        return pe._token_sums(
            params["heads"][side], h.astype(jnp.float32), seg, owner,
            n_seqs, dropout_rate=mcfg.dropout, train=True, rng=rng,
            activation=mcfg.activation)

    def scan_sums(params, esm_params, side, chunks, rngs, emb_dim):
        def body(carry, x):
            s, c = chunk_sums(params, esm_params, side, x["ids"], x["seg"],
                              x["pos"], x["owner"], x["rng"])
            return (carry[0] + s, carry[1] + c), None
        init = (jnp.zeros((n_seqs, emb_dim), jnp.float32),
                jnp.zeros((n_seqs,), jnp.float32))
        xs = dict(chunks)
        xs["rng"] = rngs
        (sums, cnt), _ = jax.lax.scan(body, init, xs)
        return sums, cnt

    def tail(params, sums_p, cnt_p, sums_r, cnt_r, r2p, r2r):
        t = params["heads"]["temperature"]
        pep = pe._finish_pool(params["heads"]["pep"], sums_p, cnt_p, t,
                              dropout_rate=mcfg.dropout, train=True, rng=r2p,
                              activation=mcfg.activation)
        rec = pe._finish_pool(params["heads"]["rec"], sums_r, cnt_r, t,
                              dropout_rate=mcfg.dropout, train=True, rng=r2r,
                              activation=mcfg.activation)
        return loss_fn(pep, rec)

    def prepare(batch, rng):
        packs = expand_sides(batch)
        # constant TOKENS per chunk across sides: narrower rows (the pep
        # side's 128 vs the receptors' 512) take proportionally more rows
        # per chunk, keeping per-chunk matmul shapes at the width the
        # rows_per_chunk sweep tuned (same rule as the frozen path's
        # _packs_and_hidden)
        l_max = max(p["ids"].shape[1] for p in packs.values())
        sides = {}
        for side, r in zip(("pep", "rec"), jax.random.split(rng)):
            pack = packs[side]
            rpc = rows_per_chunk * (l_max // pack["ids"].shape[1])
            chunks, n = _chunk_pack(pack, rpc)
            rc, rt = jax.random.split(r)
            sides[side] = (chunks, jax.random.split(rc, n), rt)
        return sides

    def replay(params, esm_params, side, chunks, rngs, d_sums, acc):
        # pass 2: re-scan chunks under jax.vjp, feeding EVERY chunk the
        # same global d_sums — pooling is a scatter-add, so each chunk's
        # cotangent is d_sums restricted by its own ownership, which the
        # vjp applies for free. Counts carry no parameter dependence, so
        # only the sums output is differentiated.
        def body(acc, x):
            _, vjp = jax.vjp(
                lambda p: chunk_sums(p, esm_params, side, x["ids"],
                                     x["seg"], x["pos"], x["owner"],
                                     x["rng"])[0],
                params)
            (pg,) = vjp(d_sums)
            return jax.tree.map(jnp.add, acc, pg), None
        xs = dict(chunks)
        xs["rng"] = rngs
        acc, _ = jax.lax.scan(body, acc, xs)
        return acc

    return chunk_sums, scan_sums, tail, prepare, replay


def make_packed_loss(cfg: EngineConfig, loss_fn: Callable | None = None,
                     rows_per_chunk: int | None = None,
                     esm_view: Callable | None = None):
    """Monolithic (single-graph) packed finetune loss: loss(params,
    esm_params, batch, rng). The SAME math as make_train_step_packed's two
    passes — same chunking, same per-chunk dropout keys — differentiated
    in one piece. Exists so tests can assert the two-pass grads exactly
    (and as the simple form for small problems where activation memory
    fits)."""
    from .packed_engine import _default_rows_per_chunk

    loss_fn = loss_fn or default_loss_fn()
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)
    _, scan_sums, tail, prepare, _ = _packed_machinery(cfg, loss_fn,
                                                       rows_per_chunk,
                                                       esm_view)

    def loss(params, esm_params, batch, rng):
        sides = prepare(batch, rng)
        emb_dim = params["heads"]["pep"]["projection"]["w"].shape[1]
        pools = {}
        for side, (chunks, rngs, _) in sides.items():
            pools[side] = scan_sums(params, esm_params, side, chunks, rngs,
                                    emb_dim)
        return tail(params, *pools["pep"], *pools["rec"],
                    sides["pep"][2], sides["rec"][2])

    return loss


def make_train_step_packed(cfg: EngineConfig,
                           optimizer: optax.GradientTransformation,
                           loss_fn: Callable | None = None,
                           rows_per_chunk: int | None = None,
                           donate: bool = False,
                           esm_view: Callable | None = None):
    """jit'd unfrozen train step over tokenize_packed wire batches.

    Three phases inside one jit:
      pass 1   scan row-chunks -> accumulated per-sequence (sums, counts),
               stop_gradient (no graph held);
      tail     value_and_grad of mean->ffn->normalize->scale->InfoNCE
               w.r.t. (params, sums_pep, sums_rec);
      pass 2   re-scan chunks under jax.vjp (remat'd forward, flash
               attention backward), feeding EVERY chunk the same global
               d_sums — pooling is a scatter-add, so each chunk's
               cotangent is just d_sums restricted by its own ownership,
               which the vjp applies for free.
    Counts carry no parameter dependence (they count valid tokens), so
    their cotangent is identically zero and pass 2 differentiates the
    sums output only."""
    from .packed_engine import _default_rows_per_chunk, _validate_packed_batch

    loss_fn = loss_fn or default_loss_fn()
    rows_per_chunk = _default_rows_per_chunk(rows_per_chunk)
    _, scan_sums, tail, prepare, replay = _packed_machinery(
        cfg, loss_fn, rows_per_chunk, esm_view)
    n_seqs = cfg.global_batch

    def step(params, opt_state, esm_params, batch, rng):
        _validate_packed_batch(batch, n_seqs)
        sides = prepare(batch, rng)
        emb_dim = params["heads"]["pep"]["projection"]["w"].shape[1]

        pools = {}
        for side, (chunks, rngs, _) in sides.items():
            pools[side] = jax.lax.stop_gradient(
                scan_sums(params, esm_params, side, chunks, rngs, emb_dim))

        (loss, (grads, d_sp, d_sr)) = jax.value_and_grad(
            tail, argnums=(0, 1, 3))(
                params, *pools["pep"], *pools["rec"],
                sides["pep"][2], sides["rec"][2])

        grads = replay(params, esm_params, "pep", sides["pep"][0],
                       sides["pep"][1], d_sp, grads)
        grads = replay(params, esm_params, "rec", sides["rec"][0],
                       sides["rec"][1], d_sr, grads)
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
