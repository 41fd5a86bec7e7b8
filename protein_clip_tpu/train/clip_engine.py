"""CLIP training engine — the L4 layer (reference modules/training_utils.py).

Public surface mirrors the reference's: ``train_gc`` (global-batch gradient-
cached training, training_utils.py:92-155), ``train`` (plain per-batch,
training_utils.py:7-28), ``evaluate`` (training_utils.py:30-49) — rebuilt as
jit-compiled pure steps over static bucket shapes:

- tokenize on host (NumPy) into a static bucket length;
- one jit'd train step per (T_pep, T_rec) bucket pair, compiled once;
- the frozen ESM-2 backbone scans over microbatches (train/gradcache.py) so
  a 256-negative global batch fits HBM, and runs ONCE per step (the
  reference runs it twice per sub-batch under GradCache);
- no AMP GradScaler: bf16 on TPU needs no loss scaling
  (reference scaler usage: training_utils.py:139-153).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.tokenizer import EsmTokenizer
from ..models import clip
from ..ops.infonce import clip_infonce
from .gradcache import encode_hidden_chunked


# The fused kernel keeps x, y, and the (B, B) logits VMEM-resident with no
# grid; past this budget (or off sublane alignment) Mosaic would fail at
# compile time deep inside a jit, so fall back to the lax path instead.
# The 8 MiB base is the v5e calibration; ops/tpu_budgets.py scales it per
# device generation (override: PCT_INFONCE_VMEM_BUDGET).


def fused_infonce_fits(b: int, d: int) -> bool:
    """True when the single-shot fused InfoNCE kernel's working set
    (x, y, logits, probs in f32) fits the VMEM budget with d sublane-
    aligned. Global batch 512 at d=128 still fits; 1024 falls back."""
    from ..ops.tpu_budgets import infonce_vmem_budget

    vmem_bytes = 4 * (2 * b * d + 2 * b * b)
    return vmem_bytes <= infonce_vmem_budget() and d % 8 == 0


def default_loss_fn() -> Callable:
    """Fused Pallas InfoNCE on TPU (ops/infonce_pallas.py), lax elsewhere.
    Values agree to f32 rounding (tests/test_pallas_infonce.py). Shapes the
    single-shot kernel cannot hold in VMEM (very large negative pools /
    embedding dims) use the lax fallback transparently."""
    if jax.default_backend() == "tpu":
        from ..ops.infonce_pallas import (fused_infonce, fused_infonce_tiled,
                                          tiled_row_block)

        def loss(x, y):
            b, d = x.shape
            if fused_infonce_fits(b, d):
                return fused_infonce(x, y)
            # pools past the single-shot budget: row-tiled kernel with an
            # online column logsumexp — VMEM O(B*D + rb*B), not O(B*B)
            if tiled_row_block(b) is not None and b <= 4096 and d % 8 == 0:
                return fused_infonce_tiled(x, y)
            return clip_infonce(x, y)

        return loss
    return clip_infonce

Params = dict[str, Any]


@dataclasses.dataclass
class EngineConfig:
    model: clip.CLIPConfig
    batch_size: int = 16                 # main.py:34
    accumulated_batches: int = 16        # main.py:49 -> global batch 256
    learning_rate: float = 1e-3          # main.py:45
    num_chunks: int = 16                 # backbone microbatches per step
    remat: bool = True
    # >1: sort pairs by receptor length and encode per-group at tighter pad
    # buckets (tokenize_grouped) — cuts backbone padding waste ~25-40% on
    # wide length distributions. 1 = single bucket (reference-shaped).
    length_groups: int = 1
    # sequence packing (train/packed_engine.py): ~95% token fill via
    # segment-masked rows; supersedes length_groups when True.
    packed: bool = False
    # >1: width-tiered packing (packed_engine._tier_widths) — short
    # sequences ride narrower rows, cutting attention work that scales
    # with row width. Measured SLOWER at the Propedia bench profile
    # (659 vs 865 pairs/s flat, docs/PERF.md round 4); available for
    # longer-tailed length distributions.
    packed_tiers: int = 1
    # FILIP + packed only: >1 keeps the backbone pack flat (full fill) but
    # scatters per-token head outputs into per-length-tier buffers so the
    # fused max-sim work tracks TRUE lengths, not the global row width.
    # Measured wins at both bench batch sizes (128: 367 vs 359; 256: 349
    # vs 318 pairs/s — docs/PERF.md); the FILIP CLI defaults to 4.
    scatter_tiers: int = 1
    # FILIP only: diagonal-masked denominator (training_utils_filip.py:4-23)
    filip_use_dcl: bool = False
    # finetune engine only: backbone learning rate (heads use
    # learning_rate); None -> the finetune default 1e-5
    backbone_lr: float | None = None
    # production-trainer knobs (train/optimizer.build) — defaults are the
    # reference's plain Adam
    weight_decay: float = 0.0
    warmup_steps: int = 0
    lr_schedule: str = "constant"
    total_steps: int | None = None
    # > 0: clip gradients to this global L2 norm before Adam (whole-tree
    # norm — the two-group finetune/LoRA optimizers hoist the clip around
    # their multi_transform). Non-scale-invariant, like weight decay:
    # safe under DP because the sharded steps pmean to the true gradient.
    grad_clip: float = 0.0

    @property
    def global_batch(self) -> int:
        return self.batch_size * self.accumulated_batches


def tokenize_pair_batch(tokenizer: EsmTokenizer, peps: list[str],
                        recs: list[str],
                        compact: bool = True) -> dict[str, jnp.ndarray]:
    """Tokenize both sides into a device batch.

    compact=True ships int8 token ids only (the 33-token ESM vocab fits) —
    8x fewer bytes host->device than int32 ids+masks; masks are derived on
    device by ``expand_batch`` (attention_mask == ids != <pad>).
    """
    bp = tokenizer(peps)
    br = tokenizer(recs)
    if compact:
        return {
            "pep_ids": jnp.asarray(bp["input_ids"].astype(np.int8)),
            "rec_ids": jnp.asarray(br["input_ids"].astype(np.int8)),
        }
    return {
        "pep_ids": jnp.asarray(bp["input_ids"]),
        "pep_mask": jnp.asarray(bp["attention_mask"]),
        "rec_ids": jnp.asarray(br["input_ids"]),
        "rec_mask": jnp.asarray(br["attention_mask"]),
    }


def expand_batch(batch: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
    """Device-side: restore int32 ids + attention masks from a compact batch.

    Pads only ever occur as trailing <pad> tokens (tokenizer contract), so
    attention_mask == (ids != pad_id) exactly.
    """
    from ..data.tokenizer import PAD_ID

    if "pep_mask" in batch:
        return batch
    out = {}
    for side in ("pep", "rec"):
        ids = batch[f"{side}_ids"]
        out[f"{side}_ids"] = ids.astype(jnp.int32)
        out[f"{side}_mask"] = (ids != PAD_ID).astype(jnp.int32)
    return out


def tokenize_grouped(tokenizer: EsmTokenizer, peps: list[str],
                     recs: list[str], n_groups: int = 2
                     ) -> tuple[dict[str, jnp.ndarray], ...]:
    """Length-grouped tokenization: sort pairs by receptor length and split
    into n_groups equal groups, each padded to its own bucket.

    The reference pads each sub-batch to its longest (training_utils.py:
    66-67); one global 512-bucket wastes ~40% of backbone work as padding on
    the Propedia length profile. Sorting permutes pep/rec TOGETHER, so the
    InfoNCE diagonal stays aligned and the loss is permutation-invariant.
    Shapes stay static per (group bucket) composition -> XLA compile cache.
    """
    order = sorted(range(len(recs)), key=lambda i: len(recs[i]))
    g = len(order) // n_groups
    groups = []
    for gi in range(n_groups):
        idx = order[gi * g:(gi + 1) * g] if gi < n_groups - 1 \
            else order[(n_groups - 1) * g:]
        groups.append(tokenize_pair_batch(
            tokenizer, [peps[i] for i in idx], [recs[i] for i in idx]))
    return tuple(groups)


def make_train_step(cfg: EngineConfig,
                    optimizer: optax.GradientTransformation,
                    loss_fn: Callable | None = None):
    """jit'd global-batch step: (params, opt_state, esm_params, batch, rng)
    -> (params, opt_state, loss). With cfg.length_groups > 1 the batch is a
    tuple of length-grouped batches (tokenize_grouped). loss_fn defaults to
    the fused Pallas InfoNCE on TPU."""
    loss_fn = loss_fn or default_loss_fn()
    if cfg.packed:
        from .packed_engine import make_train_step_packed
        return make_train_step_packed(cfg, optimizer, loss_fn)
    if cfg.length_groups > 1:
        return make_train_step_grouped(cfg, optimizer, loss_fn)

    mcfg = cfg.model

    def head_loss(params, hp, hr, batch, rng):
        rp, rr = jax.random.split(rng)
        pep = clip.encode_side(params, "pep", hp, batch["pep_mask"], mcfg,
                               train=True, rng=rp)
        rec = clip.encode_side(params, "rec", hr, batch["rec_mask"], mcfg,
                               train=True, rng=rr)
        return loss_fn(pep, rec)

    @jax.jit
    def step(params, opt_state, esm_params, batch, rng):
        batch = expand_batch(batch)
        hp = encode_hidden_chunked(esm_params, batch["pep_ids"],
                                   batch["pep_mask"], mcfg.esm,
                                   cfg.num_chunks, cfg.remat)
        hr = encode_hidden_chunked(esm_params, batch["rec_ids"],
                                   batch["rec_mask"], mcfg.esm,
                                   cfg.num_chunks, cfg.remat)
        loss, grads = jax.value_and_grad(head_loss)(
            params, hp.astype(jnp.float32), hr.astype(jnp.float32),
            batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_train_step_grouped(cfg: EngineConfig,
                            optimizer: optax.GradientTransformation,
                            loss_fn: Callable | None = None):
    """Train step over length-grouped batches (tokenize_grouped output):
    each group's backbone pass runs at its own (smaller) bucket length;
    pooled embeddings concatenate before the global-batch loss."""
    loss_fn = loss_fn or default_loss_fn()
    mcfg = cfg.model

    def group_hidden(esm_params, batch, n_chunks):
        hp = encode_hidden_chunked(esm_params, batch["pep_ids"],
                                   batch["pep_mask"], mcfg.esm,
                                   n_chunks, cfg.remat)
        hr = encode_hidden_chunked(esm_params, batch["rec_ids"],
                                   batch["rec_mask"], mcfg.esm,
                                   n_chunks, cfg.remat)
        return hp.astype(jnp.float32), hr.astype(jnp.float32)

    def head_loss(params, hiddens, batches, rng):
        peps, recs = [], []
        for (hp, hr), batch in zip(hiddens, batches):
            rng, rp, rr = jax.random.split(rng, 3)
            peps.append(clip.encode_side(params, "pep", hp,
                                         batch["pep_mask"], mcfg,
                                         train=True, rng=rp))
            recs.append(clip.encode_side(params, "rec", hr,
                                         batch["rec_mask"], mcfg,
                                         train=True, rng=rr))
        return loss_fn(jnp.concatenate(peps), jnp.concatenate(recs))

    @jax.jit
    def step(params, opt_state, esm_params, batches, rng):
        if isinstance(batches, dict):
            raise ValueError(
                "grouped step needs a tuple of tokenize_grouped batches "
                "(cfg.length_groups > 1 pairs with the grouped tokenizer)")
        batches = tuple(expand_batch(b) for b in batches)
        n_groups = len(batches)
        n_chunks = max(1, cfg.num_chunks // n_groups)
        hiddens = [group_hidden(esm_params, b, n_chunks) for b in batches]
        loss, grads = jax.value_and_grad(head_loss)(params, hiddens,
                                                    batches, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def stack_batches(batches: list) -> Any:
    """Stack same-shaped batches on a new leading axis for
    ``make_train_step_many``. All batches must share one tree structure and
    per-leaf shape (same bucket/packing composition — the packed tokenizer's
    row rounding and the grouped tokenizer's fixed group count make this the
    common case on a homogeneous length distribution)."""
    structs = {jax.tree.structure(b) for b in batches}
    if len(structs) > 1:
        raise ValueError(f"cannot stack batches with differing structures "
                         f"(bucket compositions): {structs}")
    shapes = {tuple(x.shape for x in jax.tree.leaves(b)) for b in batches}
    if len(shapes) > 1:
        raise ValueError(f"cannot stack batches with differing leaf shapes "
                         f"(row/bucket compositions): {shapes}")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def make_train_step_many(cfg: EngineConfig,
                         optimizer: optax.GradientTransformation,
                         loss_fn: Callable | None = None):
    """Device-side multi-step training: one dispatch runs K steps.

    (params, opt_state, esm_params, stacked_batches, rng) ->
    (params, opt_state, losses (K,)). ``stacked_batches`` comes from
    ``stack_batches``; per-step rng keys split from ``rng``.

    Why: each dispatch over the axon tunnel costs ~46 ms of host/RPC time
    the device spends idle (trace analysis, docs/PERF.md — while-loop/scan
    device self-time is ~0 there). ``lax.scan`` over pre-staged batches
    amortises that to once per K steps. Numerics are the single-step path's
    exactly — the scan body IS the single-step function
    (tests/test_train.py::test_many_step_matches_sequential).
    """
    step = make_train_step(cfg, optimizer, loss_fn)

    @jax.jit
    def many(params, opt_state, esm_params, batches, rng):
        n = jax.tree.leaves(batches)[0].shape[0]
        keys = jax.random.split(rng, n)

        def body(carry, xs):
            batch, key = xs
            p, o, loss = step(carry[0], carry[1], esm_params, batch, key)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, keys))
        return params, opt_state, losses

    return many


def make_eval_step(cfg: EngineConfig, loss_fn: Callable | None = None):
    """Eval step matching the train step's data path: packed / grouped /
    plain, dispatched from cfg exactly like make_train_step — a val epoch
    no longer pays the single-bucket pad-to-longest the train side spent
    rounds eliminating (VERDICT r2 #3)."""
    loss_fn = loss_fn or default_loss_fn()
    if cfg.packed:
        from .packed_engine import make_eval_step_packed
        return make_eval_step_packed(cfg, loss_fn)
    if cfg.length_groups > 1:
        return make_eval_step_grouped(cfg, loss_fn)
    mcfg = cfg.model

    @jax.jit
    def step(params, esm_params, batch):
        batch = expand_batch(batch)
        pep, rec = clip.forward(params, esm_params, batch, mcfg, train=False)
        return loss_fn(pep, rec)

    return step


def make_eval_step_grouped(cfg: EngineConfig,
                           loss_fn: Callable | None = None):
    """Eval over length-grouped batches: each group runs at its own bucket
    (the grouped train step's data path, no grads/dropout)."""
    loss_fn = loss_fn or default_loss_fn()
    mcfg = cfg.model

    @jax.jit
    def step(params, esm_params, batches):
        if isinstance(batches, dict):
            raise ValueError(
                "grouped eval step needs a tuple of tokenize_grouped "
                "batches (cfg.length_groups > 1 pairs with the grouped "
                "tokenizer)")
        peps, recs = [], []
        for b in batches:
            b = expand_batch(b)
            p, r = clip.forward(params, esm_params, b, mcfg, train=False)
            peps.append(p)
            recs.append(r)
        return loss_fn(jnp.concatenate(peps), jnp.concatenate(recs))

    return step


def _accumulate(loader: Iterable, n: int):
    """Group n loader sub-batches into one global (peps, recs) batch —
    the reference's cache-accumulate (training_utils.py:117-134)."""
    peps: list[str] = []
    recs: list[str] = []
    count = 0
    for p, r in loader:
        peps.extend(p)
        recs.extend(r)
        count += 1
        if count == n:
            yield peps, recs
            peps, recs, count = [], [], 0
    # trailing partial big-batch dropped, matching the reference's
    # `if (step+1) % accumulated_batches == 0` gate


def train_gc(params, opt_state, esm_params, loader, tokenizer, step_fn,
             cfg: EngineConfig, rng, prepare=None
             ) -> tuple[Params, Any, float]:
    """One epoch of global-batch training. Returns (params, opt_state, mean loss).

    Tokenization + host->device transfer run on a background thread two
    batches ahead (data/prefetch.py), overlapping device compute.

    prepare: optional (peps, recs) -> device batch override — mesh engines
    supply the sharded wire (parallel/engine.MeshEngine.make_prepare);
    None keeps the cfg-driven packed/grouped/plain dispatch.
    """
    from ..data.prefetch import prefetch_to_device

    if prepare is not None:
        _user_prepare = prepare
        prepare = lambda pr: _user_prepare(pr[0], pr[1])
    elif cfg.packed:
        from .packed_engine import tokenize_packed
        prepare = lambda pr: tokenize_packed(tokenizer, pr[0], pr[1],
                                             tiers=cfg.packed_tiers,
                                             scatter_tiers=cfg.scatter_tiers)
    elif cfg.length_groups > 1:
        prepare = lambda pr: tokenize_grouped(tokenizer, pr[0], pr[1],
                                              cfg.length_groups)
    else:
        prepare = lambda pr: tokenize_pair_batch(tokenizer, pr[0], pr[1])
    batches = prefetch_to_device(
        _accumulate(loader, cfg.accumulated_batches), prepare)
    # Keep per-step losses as device arrays and fetch once at epoch end:
    # a per-step float(loss) forces a host sync whose dispatch gap the
    # device spends idle — measured ~9% of step time over the axon tunnel
    # (sync 750 vs pipelined 818 pairs/s, docs/PERF.md round 3).
    losses = []
    for batch in batches:
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step_fn(params, opt_state, esm_params,
                                          batch, sub)
        losses.append(loss)
    if not losses:
        raise ValueError(
            f"loader yielded fewer than accumulated_batches="
            f"{cfg.accumulated_batches} sub-batches; no training step ran")
    return params, opt_state, float(np.mean([float(l) for l in losses]))


def train_plain(params, opt_state, esm_params, loader, tokenizer, step_fn,
                rng, cfg: EngineConfig | None = None, prepare=None
                ) -> tuple[Params, Any, float]:
    """Per-sub-batch training (reference train(), training_utils.py:7-28).

    With cfg.length_groups > 1 each batch tokenizes length-grouped, with
    cfg.packed sequence-packed (FILIP padding-waste cuts — the step must
    come from the matching make_train_step). Losses stay on device until
    the epoch ends (see train_gc). prepare: see train_gc."""
    groups = cfg.length_groups if cfg is not None else 1
    packed = cfg.packed if cfg is not None else False
    losses = []
    for peps, recs in loader:
        rng, sub = jax.random.split(rng)
        if prepare is not None:
            batch = prepare(peps, recs)
        elif packed:
            from .packed_engine import tokenize_packed
            batch = tokenize_packed(
                tokenizer, peps, recs,
                tiers=cfg.packed_tiers if cfg is not None else 1,
                scatter_tiers=cfg.scatter_tiers if cfg is not None else 1)
        elif groups > 1:
            batch = tokenize_grouped(tokenizer, peps, recs, groups)
        else:
            batch = tokenize_pair_batch(tokenizer, peps, recs)
        params, opt_state, loss = step_fn(params, opt_state, esm_params,
                                          batch, sub)
        losses.append(loss)
    mean = float(np.mean([float(l) for l in losses])) if losses else 0.0
    return params, opt_state, mean


def evaluate(params, esm_params, loader, tokenizer, eval_step,
             cfg: EngineConfig | None = None, prepare=None) -> float:
    """Mean per-batch loss (reference evaluate(), training_utils.py:30-49).

    With cfg, batches tokenize the way the matching eval_step expects
    (packed / grouped / plain — the train_plain dispatch); prepare
    overrides that dispatch (see train_gc). An empty loader (dataset
    smaller than batch_size with drop_last) returns NaN rather than a
    silent 0.0 — the reference would ZeroDivisionError.
    """
    if prepare is not None:
        pass
    elif cfg is not None and cfg.packed:
        from .packed_engine import tokenize_packed
        prepare = lambda p, r: tokenize_packed(tokenizer, p, r,
                                               tiers=cfg.packed_tiers,
                                               scatter_tiers=cfg.scatter_tiers)
    elif cfg is not None and cfg.length_groups > 1:
        prepare = lambda p, r: tokenize_grouped(tokenizer, p, r,
                                                cfg.length_groups)
    else:
        prepare = lambda p, r: tokenize_pair_batch(tokenizer, p, r)
    losses = [eval_step(params, esm_params, prepare(peps, recs))
              for peps, recs in loader]
    if not losses:
        return float("nan")
    return float(np.mean([float(l) for l in losses]))
