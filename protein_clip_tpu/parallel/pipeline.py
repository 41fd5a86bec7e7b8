"""Pipeline parallelism over a 'stage' mesh axis — GPipe-style lockstep.

The reference has no distributed code at all (SURVEY.md §2.3), so this axis
is designed TPU-first rather than ported. At the flagship 150M scale DP/TP
(parallel/step.py, parallel/sharding.py) are the profitable axes; PP becomes
the memory play for esm2_t48_15B-class backbones whose stacked weights
outgrow one chip even in bf16. The schedule:

- Stage s owns layers [s*L/S, (s+1)*L/S): the stacked layer pytree reshapes
  (L, ...) -> (S, L/S, ...) and shards its leading dim over 'stage'
  (``stage_esm_params``), so each chip holds 1/S of the backbone weights.
  Embedding + final LayerNorm are tiny and stay replicated.
- The batch splits into M microbatches; all stages run in lockstep for
  M + S - 1 ticks inside one ``lax.scan``. At tick t stage s processes
  microbatch t - s: stage 0 embeds a fresh microbatch, every other stage
  consumes the activation its neighbour sent last tick via ring
  ``lax.ppermute`` over ICI. Bubble fraction = (S-1)/(M+S-1) (the GPipe
  bound); carried state is ONE microbatch activation per stage.
- The last stage applies the final LayerNorm; outputs broadcast to all
  stages with a masked ``psum`` so the trainable heads + InfoNCE run
  replicated. The duplication stays noise even at the t48 shapes PP
  exists for: per global batch 256 at T=2048 the heads cost ~0.7 TFLOP
  (projection B*T*H*P dominates, H=5120, P=128) and the (B,B) InfoNCE
  ~0.02 GFLOP, vs ~8e3 TFLOP for the 48-layer backbone forward — 0.009%,
  and the loss term only reaches ~2 GFLOP at global batch 4096 (B^2*P
  growth). Replication costs S copies of ~0.01%; in a production
  topology 'stage' composes with a 'data' axis for the heads anyway.

The frozen-backbone regime (train/gradcache.py) makes this forward-only
pipeline a complete training schedule: gradients stop at the backbone
boundary (``stop_gradient``), so no backward pipeline / 1F1B interleaving is
needed — the replicated heads get exact gradients of the global loss
(tests/test_pipeline.py proves step-for-step equality with the single-device
engine).

The UNFROZEN regime (``make_pp_finetune_step``) differentiates through the
tick scan: JAX reverses the ppermutes automatically, which turns the GPipe
forward schedule into its mirrored backward pipeline — cotangents ride the
reversed ring while each stage replays its own layer slice under per-layer
``jax.checkpoint``. Exact-gradient parity with the single-device two-pass
gradcache finetune is pinned in tests/test_pipeline.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import clip, esm2
from ..ops.infonce import clip_infonce
from .mesh import DATA_AXIS, MODEL_AXIS

STAGE_AXIS = "stage"

Params = dict[str, Any]

# shard_map spec prefix for stage_esm_params output: layer stacks are
# sharded over 'stage' on their leading (stage) dim, the rest replicated.
STAGED_SPEC = {"embed": P(), "layers": P(STAGE_AXIS), "final_ln": P()}


def split_layer_stages(esm_params: Params, num_stages: int) -> list[Params]:
    """Split the stacked-layer pytree into contiguous per-stage slices.

    Embedding joins stage 0; the final LayerNorm joins the last stage.
    (Checkpoint/export view of the split; the runtime schedule uses the
    stacked ``stage_esm_params`` form.)
    """
    layers = esm_params["layers"]
    n_layers = jax.tree.leaves(layers)[0].shape[0]
    if n_layers % num_stages:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{num_stages} stages")
    per = n_layers // num_stages
    stages = []
    for s in range(num_stages):
        stage: Params = {
            "layers": jax.tree.map(lambda x: x[s * per:(s + 1) * per], layers)
        }
        if s == 0:
            stage["embed"] = esm_params["embed"]
        if s == num_stages - 1:
            stage["final_ln"] = esm_params["final_ln"]
        stages.append(stage)
    return stages


def make_pp_mesh(num_stages: int, devices=None) -> Mesh:
    """1-D ('stage',) mesh over the first num_stages devices."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) < num_stages:
        raise ValueError(f"need {num_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:num_stages]), (STAGE_AXIS,))


def stage_esm_params(esm_params: Params, num_stages: int) -> Params:
    """Reshape stacked layer leaves (L, ...) -> (S, L/S, ...) for sharding
    their leading dim over 'stage'. Quantized leaves (w_q/w_s) stage too."""
    layers = esm_params["layers"]
    n_layers = jax.tree.leaves(layers)[0].shape[0]
    if n_layers % num_stages:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{num_stages} stages")
    per = n_layers // num_stages
    staged = jax.tree.map(
        lambda x: x.reshape(num_stages, per, *x.shape[1:]), layers)
    return {"embed": esm_params["embed"], "layers": staged,
            "final_ln": esm_params["final_ln"]}


def staged_esm_param_specs() -> Params:
    """PartitionSpec tree for ``stage_esm_params`` output: leading dim over
    'stage', Megatron column/row splits over 'model' on the trailing dims
    (parallel/sharding.py recipe lifted by one stage axis). With a 1-sized
    or absent 'model' axis this degenerates to the pure-PP placement."""
    S, M = STAGE_AXIS, MODEL_AXIS
    lin_col = {"w": P(S, None, None, M), "b": P(S, None, M)}
    lin_row = {"w": P(S, None, M, None), "b": P(S, None)}
    ln = {"w": P(S, None), "b": P(S, None)}
    return {
        "embed": {"word": P()},
        "layers": {
            "attn": {
                "q": dict(lin_col), "k": dict(lin_col), "v": dict(lin_col),
                "o": dict(lin_row), "ln": dict(ln),
            },
            "ffn": {"wi": dict(lin_col), "wo": dict(lin_row),
                    "ln": dict(ln)},
        },
        "final_ln": {"w": P(), "b": P()},
    }


def shard_staged_params(mesh: Mesh, staged: Params) -> Params:
    """Place staged params: each chip holds only its own layer slice (and,
    when the mesh has a real 'model' axis, only its Megatron shard of it)."""
    if MODEL_AXIS in mesh.shape and mesh.shape[MODEL_AXIS] > 1:
        from .sharding import shard_params
        return shard_params(mesh, staged, staged_esm_param_specs())

    def put(spec):
        return lambda x: jax.device_put(x, NamedSharding(mesh, spec))

    return {
        "embed": jax.tree.map(put(P()), staged["embed"]),
        "layers": jax.tree.map(put(P(STAGE_AXIS)), staged["layers"]),
        "final_ln": jax.tree.map(put(P()), staged["final_ln"]),
    }


def _pp_hidden_local(staged, ids_mb, mask_mb, cfg: esm2.ESM2Config,
                     n_stages: int, n_micro: int, remat: bool = False):
    """Per-device body (inside shard_map over 'stage').

    ids_mb/mask_mb: (M, mb, T), replicated. Staged layer leaves arrive
    (1, L/S, ...). Returns (M, mb, T, H) last_hidden_state, replicated
    (masked-psum broadcast from the last stage).

    remat: checkpoint each layer so differentiating THROUGH the pipeline
    (make_pp_finetune_step) stores one (mb, T, H) activation per layer
    boundary instead of every attention/FFN intermediate — the same
    policy as esm2.forward(remat=True). Frozen callers leave it off
    (stop_gradient makes the backward nonexistent; remat is a no-op,
    measured in docs/PERF.md).
    """
    s = jax.lax.axis_index(STAGE_AXIS)
    layers = jax.tree.map(lambda x: x[0], staged["layers"])
    M, mb, T = ids_mb.shape
    neg = jnp.finfo(jnp.float32).min
    cos, sin = esm2._rope_tables(T, cfg.head_dim, cfg.compute_dtype)

    def run_stage(x, mask):
        mask_bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * neg
        segments = mask.astype(jnp.int32)

        def layer(x, lp):
            x = esm2._attention_block(x, lp["attn"], mask_bias, segments,
                                      cos, sin, cfg)
            x = esm2._ffn_block(x, lp["ffn"], cfg)
            return x, None

        if remat:
            layer = jax.checkpoint(layer)
        x, _ = jax.lax.scan(layer, x, layers)
        return x

    perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]

    def tick(buf, t):
        # stage s works on microbatch t - s this tick (clipped: out-of-range
        # ticks compute fill/drain garbage that is never read)
        i = jnp.clip(t - s, 0, n_micro - 1)
        ids = jax.lax.dynamic_index_in_dim(ids_mb, i, 0, keepdims=False)
        mask = jax.lax.dynamic_index_in_dim(mask_mb, i, 0, keepdims=False)
        emb = esm2.embed(staged, ids, mask, cfg)
        x_in = jnp.where(s == 0, emb, buf)
        y = run_stage(x_in, mask)
        buf_next = jax.lax.ppermute(y, STAGE_AXIS, perm)
        return buf_next, y

    # the carry is device-varying (each stage holds a different activation):
    # cast the replicated zeros so scan's carry typing agrees
    buf0 = jax.lax.pcast(jnp.zeros((mb, T, cfg.hidden_size),
                                   cfg.compute_dtype),
                         (STAGE_AXIS,), to="varying")
    _, ys = jax.lax.scan(tick, buf0, jnp.arange(M + n_stages - 1))
    # microbatch m leaves the last stage at tick m + S - 1
    out = ys[n_stages - 1:]
    out = esm2._layer_norm(out, staged["final_ln"]["w"],
                           staged["final_ln"]["b"], cfg.layer_norm_eps)
    return jax.lax.psum(
        jnp.where(s == n_stages - 1, out, jnp.zeros_like(out)), STAGE_AXIS)


def _microbatched(ids, n_micro: int):
    B = ids.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by num_microbatches"
                         f"={n_micro}")
    return ids.reshape(n_micro, B // n_micro, *ids.shape[1:])


def make_pp_encode(cfg: esm2.ESM2Config, mesh: Mesh, num_microbatches: int):
    """jit(shard_map) backbone forward with the layer stack pipelined over
    'stage': (staged_params, ids (B,T), mask (B,T)) -> (B, T, H), numerically
    identical to ``esm2.forward`` (same per-token op sequence)."""
    n_stages = mesh.shape[STAGE_AXIS]

    def encode(staged, ids, mask):
        h = _pp_hidden_local(staged, _microbatched(ids, num_microbatches),
                             _microbatched(mask, num_microbatches), cfg,
                             n_stages, num_microbatches)
        return h.reshape(ids.shape[0], ids.shape[1], -1)

    sharded = jax.shard_map(
        encode, mesh=mesh,
        in_specs=(STAGED_SPEC, P(), P()),
        out_specs=P(),
        axis_names={STAGE_AXIS},
    )
    return jax.jit(sharded)


def make_pp_train_step(cfg, optimizer: optax.GradientTransformation,
                       mesh: Mesh, num_microbatches: int | None = None,
                       loss_fn=clip_infonce):
    """CLIP train step with the frozen backbone pipelined over 'stage'.

    (params, opt_state, staged_esm_params, batch, rng) ->
    (params, opt_state, loss); batch leaves replicated (B_global, T).
    Heads + loss + optimizer run replicated on every stage — exact
    step-for-step parity with the single-device engine
    (tests/test_pipeline.py).
    """
    mcfg = cfg.model
    n_stages = mesh.shape[STAGE_AXIS]
    n_micro = num_microbatches or max(2 * n_stages, cfg.num_chunks)

    def local_step(params, opt_state, staged, batch, rng):
        from ..train.clip_engine import expand_batch
        batch = expand_batch(batch)

        def enc(ids, mask):
            h = _pp_hidden_local(staged, _microbatched(ids, n_micro),
                                 _microbatched(mask, n_micro), mcfg.esm,
                                 n_stages, n_micro)
            h = h.reshape(ids.shape[0], ids.shape[1], -1)
            return jax.lax.stop_gradient(h.astype(jnp.float32))

        hp = enc(batch["pep_ids"], batch["pep_mask"])
        hr = enc(batch["rec_ids"], batch["rec_mask"])

        def head_loss(p):
            rp, rr = jax.random.split(rng)
            pep = clip.encode_side(p, "pep", hp, batch["pep_mask"], mcfg,
                                   train=True, rng=rp)
            rec = clip.encode_side(p, "rec", hr, batch["rec_mask"], mcfg,
                                   train=True, rng=rr)
            return loss_fn(pep, rec)

        loss, grads = jax.value_and_grad(head_loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), STAGED_SPEC, P(), P()),
        out_specs=(P(), P(), P()),
        axis_names={STAGE_AXIS},
    )
    return jax.jit(sharded)


def _pp_hidden_packed(staged, ids_mb, seg_mb, pos_mb, cfg: esm2.ESM2Config,
                      n_stages: int, n_micro: int):
    """Packed-row twin of ``_pp_hidden_local``: microbatches are packed ROWS
    (data/packing.py) — attention is block-diagonal per segment, RoPE
    restarts at each segment (per-token position gather), and the
    token-dropout rescale is per segment, exactly as esm2.forward's packed
    branch. ids_mb/seg_mb/pos_mb: (M, rows_mb, L) int32, replicated."""
    s = jax.lax.axis_index(STAGE_AXIS)
    layers = jax.tree.map(lambda x: x[0], staged["layers"])
    M, R, L = ids_mb.shape
    neg = jnp.finfo(jnp.float32).min
    cos_t, sin_t = esm2._rope_tables(L, cfg.head_dim, cfg.compute_dtype)

    def run_stage(x, seg, pos):
        same = seg[:, :, None] == seg[:, None, :]
        valid = (seg > 0)[:, None, :]
        mask_bias = jnp.where((same & valid)[:, None, :, :], 0.0,
                              neg).astype(jnp.float32)
        cos = jnp.take(cos_t, pos, axis=0)      # (rows_mb, L, dh)
        sin = jnp.take(sin_t, pos, axis=0)

        def layer(x, lp):
            x = esm2._attention_block(x, lp["attn"], mask_bias, seg,
                                      cos, sin, cfg)
            x = esm2._ffn_block(x, lp["ffn"], cfg)
            return x, None

        x, _ = jax.lax.scan(layer, x, layers)
        return x

    perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]

    def tick(buf, t):
        i = jnp.clip(t - s, 0, n_micro - 1)
        ids = jax.lax.dynamic_index_in_dim(ids_mb, i, 0, keepdims=False)
        seg = jax.lax.dynamic_index_in_dim(seg_mb, i, 0, keepdims=False)
        pos = jax.lax.dynamic_index_in_dim(pos_mb, i, 0, keepdims=False)
        mask = (seg > 0).astype(jnp.int32)
        emb = esm2.embed(staged, ids, mask, cfg, segment_ids=seg)
        x_in = jnp.where(s == 0, emb, buf)
        y = run_stage(x_in, seg, pos)
        buf_next = jax.lax.ppermute(y, STAGE_AXIS, perm)
        return buf_next, y

    buf0 = jax.lax.pcast(jnp.zeros((R, L, cfg.hidden_size),
                                   cfg.compute_dtype),
                         (STAGE_AXIS,), to="varying")
    _, ys = jax.lax.scan(tick, buf0, jnp.arange(M + n_stages - 1))
    out = ys[n_stages - 1:]
    out = esm2._layer_norm(out, staged["final_ln"]["w"],
                           staged["final_ln"]["b"], cfg.layer_norm_eps)
    return jax.lax.psum(
        jnp.where(s == n_stages - 1, out, jnp.zeros_like(out)), STAGE_AXIS)


def _micro_divisor(rows: int, want: int) -> int:
    """Largest microbatch count <= want that divides the row count (packed
    row counts are data-dependent; GPipe needs an exact split).

    Warns (once per compiled shape — this runs at trace time) when the
    effective count differs from the requested one: m=1 means no pipelining
    and (n_stages-1)/n_stages idle bubble, a hidden throughput cliff."""
    m = max(1, min(want, rows))
    while rows % m:
        m -= 1
    if m != want:
        import warnings
        warnings.warn(
            f"PP: requested {want} microbatches but {rows} packed rows "
            f"only split into {m} — pipeline utilization drops "
            f"({'no overlap at m=1' if m == 1 else 'bigger bubble'}); "
            "pick a pack budget whose row count divides the request",
            stacklevel=2)
    return m


def make_pp_packed_train_step(cfg, optimizer: optax.GradientTransformation,
                              mesh: Mesh,
                              num_microbatches: int | None = None,
                              loss_fn=None):
    """Packed-wire CLIP train step with the frozen backbone pipelined over
    'stage' — the sequence-packing throughput play composed with the
    t48-class memory play (VERDICT r3 #7; previously PP was proven on the
    unpacked wire only). Flat packs only (one width per side); width tiers
    would pipeline per-tier and are out of scope until a workload needs
    them. Batch: tokenize_packed wire, replicated. Heads pool by
    segment-sum over the owner permutation and run replicated, exactly as
    train/packed_engine.make_train_step_packed — step-for-step parity is
    pinned in tests/test_pipeline.py.
    """
    from ..train.clip_engine import default_loss_fn
    from ..train.packed_engine import (_pool_packed, _validate_packed_batch,
                                       expand_packed_batch,
                                       packed_side_count)

    loss_fn = loss_fn or default_loss_fn()
    mcfg = cfg.model
    n_stages = mesh.shape[STAGE_AXIS]
    n_seqs = cfg.global_batch
    want_micro = num_microbatches or max(2 * n_stages, cfg.num_chunks)

    def local_step(params, opt_state, staged, batch, rng):
        if "pep_packs" in batch or "rec_packs" in batch:
            raise ValueError("PP packed step takes flat packs "
                             "(--pack-tiers 1)")
        _validate_packed_batch(batch, n_seqs)
        batch = expand_packed_batch(batch)

        sides = {}
        for side in ("pep", "rec"):
            ids = batch[f"{side}_ids"]
            seg = batch[f"{side}_seg"]
            pos = batch[f"{side}_pos"]
            m = _micro_divisor(ids.shape[0], want_micro)
            h = _pp_hidden_packed(
                staged, _microbatched(ids, m), _microbatched(seg, m),
                _microbatched(pos, m), mcfg.esm, n_stages, m)
            h = h.reshape(ids.shape[0], ids.shape[1], -1)
            sides[side] = jax.lax.stop_gradient(h.astype(jnp.float32))

        def head_loss(p):
            rp, rr = jax.random.split(rng)
            pep = _pool_packed(
                p["pep"], sides["pep"], batch["pep_seg"],
                batch["pep_owner"], n_seqs, p["temperature"],
                dropout_rate=mcfg.dropout, train=True, rng=rp,
                activation=mcfg.activation)
            rec = _pool_packed(
                p["rec"], sides["rec"], batch["rec_seg"],
                batch["rec_owner"], n_seqs, p["temperature"],
                dropout_rate=mcfg.dropout, train=True, rng=rr,
                activation=mcfg.activation)
            return loss_fn(pep, rec)

        loss, grads = jax.value_and_grad(head_loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), STAGED_SPEC, P(), P()),
        out_specs=(P(), P(), P()),
        axis_names={STAGE_AXIS},
    )
    return jax.jit(sharded)


def make_pp_dp_mesh(data: int, stages: int, model: int = 1,
                    devices=None) -> Mesh:
    """('data', 'stage'[, 'model']) mesh: each data replica pipelines its own
    batch shard over a stage ring; negatives still span the full global batch
    via the embedding all-gather over 'data' (the parallel/step.py pattern).
    model > 1 adds a trailing GSPMD tensor-parallel axis (Megatron splits on
    the staged weights, parallel/sharding.py)."""
    devices = devices if devices is not None else jax.devices()
    need = data * stages * model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    if model > 1:
        grid = np.asarray(devices[:need]).reshape(data, stages, model)
        return Mesh(grid, (DATA_AXIS, STAGE_AXIS, MODEL_AXIS))
    grid = np.asarray(devices[:need]).reshape(data, stages)
    return Mesh(grid, (DATA_AXIS, STAGE_AXIS))


def make_pp_dp_train_step(cfg, optimizer: optax.GradientTransformation,
                          mesh: Mesh, num_microbatches: int | None = None,
                          loss_fn=clip_infonce):
    """CLIP train step over a ('data', 'stage') mesh: DP x PP composed.

    Batch leaves arrive (B_global, T) and shard over 'data'; each data
    replica runs the GPipe lockstep schedule over its 'stage' ring on its
    local shard. Head embeddings all-gather over 'data' so the InfoNCE
    denominator spans the global batch (exactly parallel/step.py's manual-DP
    contract), and head grads psum over 'data'. Staged backbone weights are
    sharded over 'stage' and replicated over 'data'.

    A 3-axis mesh (make_pp_dp_mesh(model=...)) additionally tensor-shards
    the staged weights over a GSPMD auto 'model' axis — the full
    DP x PP x TP production composition; attention falls back to the eager
    einsum there (GSPMD cannot partition the Pallas custom call, same rule
    as parallel/step.tp_safe_model_config).

    Numerics match the single-device engine at equal global batch
    (tests/test_pipeline.py::test_pp_dp_train_step_matches_single_device).
    """
    from .step import tp_safe_model_config

    mcfg = tp_safe_model_config(cfg.model, mesh)
    n_stages = mesh.shape[STAGE_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    if cfg.global_batch % n_data:
        raise ValueError(f"global batch {cfg.global_batch} not divisible by "
                         f"data axis {n_data}")
    n_micro = num_microbatches or max(2 * n_stages, cfg.num_chunks)

    def local_step(params, opt_state, staged, batch, rng):
        from ..train.clip_engine import expand_batch
        batch = expand_batch(batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def enc(ids, mask):
            h = _pp_hidden_local(staged, _microbatched(ids, n_micro),
                                 _microbatched(mask, n_micro), mcfg.esm,
                                 n_stages, n_micro)
            h = h.reshape(ids.shape[0], ids.shape[1], -1)
            return jax.lax.stop_gradient(h.astype(jnp.float32))

        hp = enc(batch["pep_ids"], batch["pep_mask"])
        hr = enc(batch["rec_ids"], batch["rec_mask"])

        def head_loss(p):
            rp, rr = jax.random.split(rng)
            pep_l = clip.encode_side(p, "pep", hp, batch["pep_mask"], mcfg,
                                     train=True, rng=rp)
            rec_l = clip.encode_side(p, "rec", hr, batch["rec_mask"], mcfg,
                                     train=True, rng=rr)
            pep = jax.lax.all_gather(pep_l, DATA_AXIS, axis=0, tiled=True)
            rec = jax.lax.all_gather(rec_l, DATA_AXIS, axis=0, tiled=True)
            return loss_fn(pep, rec)

        loss, grads = jax.value_and_grad(head_loss)(params)
        # pmean, not psum (see parallel/step.py grad-scale note).
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), STAGED_SPEC, P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        axis_names={DATA_AXIS, STAGE_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)


def init_finetune_params(esm_params: Params, head_params: Params,
                         mesh: Mesh) -> Params:
    """Finetune-through-PP trainable pytree: f32 backbone masters staged
    and sharded over 'stage' (each chip holds 1/S of the masters AND of
    the Adam moments initialised from them — the memory math that makes a
    t48-class finetune fit), heads replicated."""
    from ..train.finetune import init_params as _fp

    masters = _fp(esm_params, {})["esm"]
    n_stages = mesh.shape[STAGE_AXIS]
    staged = shard_staged_params(mesh, stage_esm_params(masters, n_stages))
    return {"esm": staged, "heads": head_params}


def unstage_esm_params(staged: Params) -> Params:
    """(S, L/S, ...) staged layer leaves back to the flat (L, ...) stack
    (checkpoint/export view; inverse of stage_esm_params)."""
    layers = jax.tree.map(
        lambda x: jnp.reshape(x, (x.shape[0] * x.shape[1], *x.shape[2:])),
        staged["layers"])
    return {"embed": staged["embed"], "layers": layers,
            "final_ln": staged["final_ln"]}


def make_pp_finetune_step(cfg, optimizer: optax.GradientTransformation,
                          mesh: Mesh, num_microbatches: int | None = None,
                          loss_fn=None):
    """UNFROZEN CLIP finetune with the backbone pipelined over 'stage' —
    the t48_15B-class regime PP exists for (models/esm2.py:113-116),
    closing VERDICT r4 #5 (the frozen-only restriction).

    Differentiates THROUGH the GPipe tick scan: JAX reverses the ring
    ``ppermute``s automatically, turning the forward fill/drain schedule
    into the mirrored backward pipeline (cotangents ride the reversed
    ring edges), and the VMA system transposes each replicated input's
    implicit broadcast into a ``psum`` — so embed/final_ln/head grads
    (computed on one stage, zeros elsewhere) arrive replicated without
    hand-written collectives, while each stage keeps ONLY its own layer
    slice's grads (out spec P('stage')). Activation memory: the scan
    stores one (mb, T, H) ppermute carry per tick plus, with cfg.remat,
    one activation per layer boundary (``jax.checkpoint`` per layer,
    same policy as the single-device finetune) — the (B, nh, T, T)
    scores never materialise (Pallas attention backward, fused path) or
    recompute per layer (eager under TP).

    Trainable pytree from ``init_finetune_params``: f32 masters staged
    over 'stage' (optimizer moments inherit the placement — optimizer
    runs OUTSIDE the shard_map, GSPMD keeps elementwise updates local),
    one in-step bf16 cast inside the loss exactly as train/finetune.py.
    Exact-gradient parity with the single-device two-pass gradcache
    finetune: tests/test_pipeline.py::test_pp_finetune_step.
    """
    from ..train.clip_engine import default_loss_fn, expand_batch
    from ..train.finetune import _cast_esm

    loss_fn = loss_fn or default_loss_fn()
    mcfg = cfg.model
    n_stages = mesh.shape[STAGE_AXIS]
    n_micro = num_microbatches or max(2 * n_stages, cfg.num_chunks)

    def local_value_and_grad(trainable, batch, rng):
        batch = expand_batch(batch)

        def full_loss(tr):
            staged = _cast_esm(tr["esm"], mcfg.esm.compute_dtype)

            def enc(side, key):
                ids, mask = batch[f"{side}_ids"], batch[f"{side}_mask"]
                h = _pp_hidden_local(staged, _microbatched(ids, n_micro),
                                     _microbatched(mask, n_micro), mcfg.esm,
                                     n_stages, n_micro, remat=cfg.remat)
                h = h.reshape(ids.shape[0], ids.shape[1], -1)
                return clip.encode_side(tr["heads"], side,
                                        h.astype(jnp.float32), mask, mcfg,
                                        train=True, rng=key)

            rp, rr = jax.random.split(rng)
            return loss_fn(enc("pep", rp), enc("rec", rr))

        return jax.value_and_grad(full_loss)(trainable)

    tr_spec = {"esm": STAGED_SPEC, "heads": P()}
    sharded = jax.shard_map(
        local_value_and_grad, mesh=mesh,
        in_specs=(tr_spec, P(), P()),
        out_specs=(P(), tr_spec),
        axis_names={STAGE_AXIS},
    )

    def step(trainable, opt_state, esm_params, batch, rng):
        del esm_params  # the backbone lives inside trainable (staged)
        loss, grads = sharded(trainable, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    return jax.jit(step)
