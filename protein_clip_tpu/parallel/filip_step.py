"""Multi-chip FILIP training step: DP over 'data' with token-level gather.

Late-interaction negatives need *token* embeddings, not pooled vectors: each
chip encodes its local batch shard, all-gathers the other side's normalised
token tensor (B_local, T, D) -> (B_global, T, D) over ICI, and computes its
B_local rows of both similarity matrices. Both FILIP direction losses reduce
row-wise (the denominator of training_utils_filip.py:4-23 sums over axis 1),
so each chip owns complete rows and the global loss is a psum of row sums.

Gradients flow through the all-gather back to each chip's local tokens
(reduce-scatter inserted by XLA's AD of all_gather) — GradCache-style
cotangent routing at token granularity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..models import filip
from ..models.filip import filip_similarity
from .mesh import DATA_AXIS


def _diag_mask(b_local: int, b_global: int):
    """(b_local, b_global) boolean: True where the column index equals the
    row's GLOBAL position (shard*b_local + i) — the one place the
    all-gather column-order rule lives."""
    shard = jax.lax.axis_index(DATA_AXIS)
    col = jax.lax.broadcasted_iota(jnp.int32, (b_local, b_global), 1)
    row_global = (jax.lax.broadcasted_iota(jnp.int32, (b_local, b_global), 0)
                  + shard * b_local)
    return col == row_global


def _row_direction_loss_sum(logits_rows, diag_rows, use_dcl=False):
    """Sum (not mean) of per-row CE terms for locally-owned rows.

    logits_rows: (B_local, B_global); diag_rows: the positive logit of each
    local row (the column index equals the row's global position).
    """
    logits_rows = logits_rows.astype(jnp.float32)
    if use_dcl:
        logits_rows = jnp.where(_diag_mask(*logits_rows.shape), -jnp.inf,
                                logits_rows)
    lse = jax.nn.logsumexp(logits_rows, axis=1)
    return jnp.sum(lse - diag_rows)


def local_diagonals(sim_rows, b_local: int, b_global: int):
    """Positive logits of locally-owned rows: row i's positive sits at
    global column shard*b_local + i. Shared by the unpacked and packed
    (parallel/packed_step.py) sharded FILIP steps."""
    return jnp.sum(jnp.where(_diag_mask(b_local, b_global), sim_rows, 0.0),
                   axis=1)


def make_sharded_filip_train_step(cfg, optimizer: optax.GradientTransformation,
                                  mesh, use_dcl: bool | None = None,
                                  similarity_fn=None):
    """jit(shard_map) FILIP step; batch sharded over 'data', params
    replicated (TP over 'model' via GSPMD as in parallel/step.py).

    use_dcl defaults to cfg.filip_use_dcl (matching the single-device and
    packed-sharded steps). similarity_fn defaults to the fused Pallas
    kernel on TPU — the lax einsum materialises the (b_local, B_global,
    TA, TB) score tensor, which does not survive real batch sizes — except
    under a real 'model' axis, where GSPMD cannot partition the custom
    call (same rule as tp_safe_model_config)."""
    from ..models import esm2 as esm2_mod
    from ..train.clip_engine import expand_batch
    from .mesh import MODEL_AXIS
    from .step import tp_safe_model_config

    mcfg = tp_safe_model_config(cfg.model, mesh)
    n_data = mesh.shape[DATA_AXIS]
    if use_dcl is None:
        use_dcl = getattr(cfg, "filip_use_dcl", False)
    if similarity_fn is None:
        if dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
            similarity_fn = filip_similarity
        else:
            from ..train.filip_engine import default_similarity_fn
            similarity_fn = default_similarity_fn()

    def local_step(params, opt_state, esm_params, batch, rng):
        batch = expand_batch(batch)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        hp = jax.lax.stop_gradient(
            esm2_mod.forward(esm_params, batch["pep_ids"], batch["pep_mask"],
                             mcfg.esm, remat=cfg.remat)).astype(jnp.float32)
        hr = jax.lax.stop_gradient(
            esm2_mod.forward(esm_params, batch["rec_ids"], batch["rec_mask"],
                             mcfg.esm, remat=cfg.remat)).astype(jnp.float32)
        b_local = hp.shape[0]
        b_global = b_local * n_data

        def loss_fn(p):
            rp, rr = jax.random.split(rng)
            ha = filip.encode_side_tokens(p, "pep", hp, mcfg, train=True,
                                          rng=rp)
            hb = filip.encode_side_tokens(p, "rec", hr, mcfg, train=True,
                                          rng=rr)
            ma = batch["pep_mask"]
            mb = batch["rec_mask"]
            # gather the OTHER side's tokens so each chip owns full rows
            hb_all = jax.lax.all_gather(hb, DATA_AXIS, axis=0, tiled=True)
            mb_all = jax.lax.all_gather(mb, DATA_AXIS, axis=0, tiled=True)

            t = p["temperature"]
            # local-A-vs-global-B gives complete rows of BOTH matrices:
            # sim_a[i,j] reduces over A's tokens, sim_b[i,j] over B's.
            sim_a_rows, sim_b_rows = similarity_fn(ha, hb_all, ma, mb_all,
                                                   t)

            diag_a = local_diagonals(sim_a_rows, b_local, b_global)
            diag_b = local_diagonals(sim_b_rows, b_local, b_global)

            sum_a = _row_direction_loss_sum(sim_a_rows, diag_a, use_dcl)
            sum_b = _row_direction_loss_sum(sim_b_rows, diag_b, use_dcl)
            total = jax.lax.psum(sum_a + sum_b, DATA_AXIS)
            return 0.5 * total / b_global

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # pmean, not psum: the psum-inside-loss transpose replays the
        # replicated cotangent n_data times under check_vma=False, so each
        # replica's grads already carry an n_data factor (see
        # parallel/step.py; SGD parity test pins the scale).
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P()),
        axis_names={DATA_AXIS},
        check_vma=False,
    )
    return jax.jit(sharded)
