"""Fused symmetric-InfoNCE Pallas TPU kernel.

Replaces the reference's separate matmul + exp + log + mean chain
(training_utils.py:247-265) with one kernel that keeps the (B, B) logits in
VMEM: X·Yᵀ on the MXU, then a numerically stable two-sided logsumexp and the
diagonal term — logits never round-trip to HBM. At the reference's global
batch (B=256, D=128) the whole problem is VMEM-resident (~0.5 MB).

Custom VJP: dL/dlogits = (softmax_rows + softmax_colsᵀ)/2B - eye/B, and
dX = dL·Y, dY = dLᵀ·X — recomputed in a second fused kernel from X, Y alone
(no residuals stored).

Falls back to interpret mode off-TPU so the same code path is testable on
the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .tpu_budgets import on_tpu as _on_tpu


def _fwd_kernel(x_ref, y_ref, loss_ref):
    # Mosaic wants 2D intermediates: every reduction keeps dims.
    x = x_ref[:].astype(jnp.float32)
    y = y_ref[:].astype(jnp.float32)
    logits = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    b = logits.shape[0]
    diag = jnp.sum(x * y, axis=-1, keepdims=True)  # (B,1) == diagonal(logits)

    m_r = jnp.max(logits, axis=1, keepdims=True)
    lse_r = m_r + jnp.log(jnp.sum(jnp.exp(logits - m_r), axis=1,
                                  keepdims=True))
    m_c = jnp.max(logits, axis=0, keepdims=True)
    lse_c = m_c + jnp.log(jnp.sum(jnp.exp(logits - m_c), axis=0,
                                  keepdims=True))

    loss_ref[0, 0] = 0.5 * (jnp.sum(lse_r - diag) / b
                            + jnp.sum(lse_c - diag.T) / b)


def _bwd_kernel(x_ref, y_ref, g_ref, dx_ref, dy_ref):
    x = x_ref[:].astype(jnp.float32)
    y = y_ref[:].astype(jnp.float32)
    g = g_ref[0, 0]
    logits = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    b = logits.shape[0]
    m_r = jnp.max(logits, axis=1, keepdims=True)
    e_r = jnp.exp(logits - m_r)
    p_r = e_r / jnp.sum(e_r, axis=1, keepdims=True)
    m_c = jnp.max(logits, axis=0, keepdims=True)
    e_c = jnp.exp(logits - m_c)
    p_c = e_c / jnp.sum(e_c, axis=0, keepdims=True)
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    eye = (row == col).astype(jnp.float32)
    dlogits = (g / (2.0 * b)) * (p_r + p_c - 2.0 * eye)
    dx_ref[:] = jnp.dot(dlogits, y, preferred_element_type=jnp.float32
                        ).astype(dx_ref.dtype)
    dy_ref[:] = jnp.dot(dlogits.T, x, preferred_element_type=jnp.float32
                        ).astype(dy_ref.dtype)


def _fwd_call(x, y, interpret):
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(x, y)[0, 0]


def _bwd_call(x, y, g, interpret):
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(y.shape, y.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x, y, jnp.reshape(g, (1, 1)).astype(jnp.float32))


# ---------------------------------------------------------------------------
# Tiled variant: negative pools whose (B, B) logits outgrow the single-shot
# VMEM budget (B > ~512 at D=128; see clip_engine.fused_infonce_fits). Grid
# over row blocks; the column-side logsumexp accumulates online
# (flash-style m/s rescaling) in VMEM scratch across the sequential TPU
# grid. Two-pass backward: one kernel reproduces both logsumexps, a second
# recomputes each block's logits and accumulates dy across programs into a
# revisited full-size output block.
# ---------------------------------------------------------------------------

_NEG32 = float(jnp.finfo(jnp.float32).min)


def _row_lse_diag(x, y, yblk):
    logits = jnp.dot(x, y.T, preferred_element_type=jnp.float32)  # (RB, B)
    diag = jnp.sum(x * yblk, axis=-1, keepdims=True)              # (RB, 1)
    m_r = jnp.max(logits, axis=1, keepdims=True)
    lse_r = m_r + jnp.log(jnp.sum(jnp.exp(logits - m_r), axis=1,
                                  keepdims=True))
    return logits, diag, lse_r


def _col_online_update(logits, colm_ref, cols_ref):
    blk_m = jnp.max(logits, axis=0, keepdims=True)                # (1, B)
    blk_s = jnp.sum(jnp.exp(logits - blk_m), axis=0, keepdims=True)
    old_m = colm_ref[:]
    new_m = jnp.maximum(old_m, blk_m)
    cols_ref[:] = (cols_ref[:] * jnp.exp(old_m - new_m)
                   + blk_s * jnp.exp(blk_m - new_m))
    colm_ref[:] = new_m


def _fwd_tiled_kernel(x_ref, y_ref, loss_ref, colm, cols, acc):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    x = x_ref[:].astype(jnp.float32)
    y = y_ref[:].astype(jnp.float32)
    rb = x.shape[0]
    b = y.shape[0]

    @pl.when(i == 0)
    def _():
        colm[:] = jnp.full_like(colm, _NEG32)
        cols[:] = jnp.zeros_like(cols)
        acc[0, 0] = 0.0
        acc[0, 1] = 0.0

    yblk = y_ref[pl.ds(i * rb, rb), :].astype(jnp.float32)
    logits, diag, lse_r = _row_lse_diag(x, y, yblk)
    acc[0, 0] += jnp.sum(lse_r - diag)
    acc[0, 1] += jnp.sum(diag)
    _col_online_update(logits, colm, cols)

    @pl.when(i == nb - 1)
    def _():
        lse_c = colm[:] + jnp.log(cols[:])
        loss_ref[0, 0] = 0.5 * (acc[0, 0] + jnp.sum(lse_c) - acc[0, 1]) / b


def _lse_tiled_kernel(x_ref, y_ref, lse_r_ref, lse_c_ref, colm, cols):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    x = x_ref[:].astype(jnp.float32)
    y = y_ref[:].astype(jnp.float32)
    rb = x.shape[0]

    @pl.when(i == 0)
    def _():
        colm[:] = jnp.full_like(colm, _NEG32)
        cols[:] = jnp.zeros_like(cols)

    yblk = y_ref[pl.ds(i * rb, rb), :].astype(jnp.float32)
    logits, _, lse_r = _row_lse_diag(x, y, yblk)
    lse_r_ref[:] = lse_r
    _col_online_update(logits, colm, cols)

    @pl.when(i == nb - 1)
    def _():
        lse_c_ref[:] = colm[:] + jnp.log(cols[:])


def _bwd_tiled_kernel(x_ref, y_ref, lse_r_ref, lse_c_ref, g_ref,
                      dx_ref, dy_ref, dy_acc):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    x = x_ref[:].astype(jnp.float32)
    y = y_ref[:].astype(jnp.float32)
    rb, b = x.shape[0], y.shape[0]
    g = g_ref[0, 0]

    @pl.when(i == 0)
    def _():
        dy_acc[:] = jnp.zeros_like(dy_acc)

    logits = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    p_r = jnp.exp(logits - lse_r_ref[:])          # rows sum to 1
    p_c = jnp.exp(logits - lse_c_ref[:])          # cols sum to 1 (global)
    row = jax.lax.broadcasted_iota(jnp.int32, (rb, b), 0) + i * rb
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, b), 1)
    eye = (row == col).astype(jnp.float32)
    dlogits = (g / (2.0 * b)) * (p_r + p_c - 2.0 * eye)
    dx_ref[:] = jnp.dot(dlogits, y, preferred_element_type=jnp.float32
                        ).astype(dx_ref.dtype)
    # dy accumulates across the sequential grid in an f32 scratch and casts
    # to the output dtype ONCE at the end — revisit-accumulating in the
    # output dtype would round bf16 embeddings' grads up to 32x per pool
    dy_acc[:] += jnp.dot(dlogits.T, x, preferred_element_type=jnp.float32)

    @pl.when(i == nb - 1)
    def _():
        dy_ref[:] = dy_acc[:].astype(dy_ref.dtype)


def tiled_row_block(b: int) -> int | None:
    """Largest row block in {512, 256, 128} dividing b whose f32 tile set
    fits VMEM, or None.

    The backward kernel holds four (rb, b) f32 tiles (logits, p_r, p_c,
    dlogits) plus the (b, d) y/dy/dy_acc buffers; a flat rb=512 at b=4096
    wants ~32 MB of tiles and fails Mosaic compile (seen on v5e via the
    tpu_smoke 4096 sweep) — cap 4*rb*b*4 at the per-generation tile budget
    (8 MB on v5e; ops/tpu_budgets.py) so the tile set shrinks as the pool
    grows: 512 @ b<=1024, 256 @ 2048, 128 @ 4096."""
    from .tpu_budgets import infonce_tile_budget

    cap = infonce_tile_budget()
    for rb in (512, 256, 128):
        if b % rb == 0 and 4 * rb * b * 4 <= cap:
            return rb
    # No rb fits the budget (tiny-VMEM generation or a lowered
    # PCT_INFONCE_TILE_BUDGET): tell the dispatcher to fall back to the
    # lax path rather than hand Mosaic an over-budget tile set.
    return None


def _require_row_block(b: int, row_block: int | None) -> int:
    rb = row_block or tiled_row_block(b)
    if rb is None:
        raise ValueError(
            f"no tiled row block fits the VMEM tile budget at pool size "
            f"{b} (see ops/tpu_budgets.infonce_tile_budget); use the lax "
            "InfoNCE path instead")
    if b % rb:
        # a non-dividing explicit row_block would silently truncate the
        # grid: trailing rows never enter the logsumexp and their dx
        # blocks are never written
        raise ValueError(f"row_block {rb} does not divide pool size {b}")
    return rb


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _fwd_tiled_call(x, y, rb, interpret):
    b, d = x.shape
    grid = (b // rb,)
    return pl.pallas_call(
        _fwd_tiled_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((b, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, b), jnp.float32),
                        pltpu.VMEM((1, b), jnp.float32),
                        pltpu.SMEM((1, 2), jnp.float32)],
        interpret=interpret,
    )(x, y)[0, 0]


def _bwd_tiled_call(x, y, g, rb, interpret):
    b, d = x.shape
    grid = (b // rb,)
    lse_r, lse_c = pl.pallas_call(
        _lse_tiled_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((b, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((rb, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, b), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, b), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((1, b), jnp.float32),
                        pltpu.VMEM((1, b), jnp.float32)],
        interpret=interpret,
    )(x, y)
    return pl.pallas_call(
        _bwd_tiled_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((b, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, b), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((rb, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((b, d), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(y.shape, y.dtype)),
        scratch_shapes=[pltpu.VMEM((b, d), jnp.float32)],
        interpret=interpret,
    )(x, y, lse_r, lse_c, jnp.reshape(g, (1, 1)).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_infonce_tiled(x: jax.Array, y: jax.Array,
                        row_block: int | None = None,
                        interpret: bool | None = None) -> jax.Array:
    """Symmetric InfoNCE for pools past the single-shot VMEM budget.

    x, y: (B, D) with B divisible by the row block (tiled_row_block picks
    512/256/128). VMEM working set is O(B*D + rb*B) instead of O(B*B)."""
    rb = _require_row_block(x.shape[0], row_block)
    if interpret is None:
        interpret = not _on_tpu()
    return _fwd_tiled_call(x, y, rb, interpret)


def _vjp_tiled_fwd(x, y, row_block, interpret):
    rb = _require_row_block(x.shape[0], row_block)
    if interpret is None:
        interpret = not _on_tpu()
    return _fwd_tiled_call(x, y, rb, interpret), (x, y)


def _vjp_tiled_bwd(row_block, interpret, res, g):
    x, y = res
    rb = _require_row_block(x.shape[0], row_block)
    if interpret is None:
        interpret = not _on_tpu()
    dx, dy = _bwd_tiled_call(x, y, g, rb, interpret)
    return dx, dy


fused_infonce_tiled.defvjp(_vjp_tiled_fwd, _vjp_tiled_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_infonce(x: jax.Array, y: jax.Array,
                  interpret: bool | None = None) -> jax.Array:
    """Symmetric InfoNCE over scaled embeddings — drop-in for
    ops.infonce.clip_infonce. x, y: (B, D)."""
    if interpret is None:
        interpret = not _on_tpu()
    return _fwd_call(x, y, interpret)


def _vjp_fwd(x, y, interpret):
    if interpret is None:
        interpret = not _on_tpu()
    return _fwd_call(x, y, interpret), (x, y)


def _vjp_bwd(interpret, res, g):
    x, y = res
    if interpret is None:
        interpret = not _on_tpu()
    dx, dy = _bwd_call(x, y, g, interpret)
    return dx, dy


fused_infonce.defvjp(_vjp_fwd, _vjp_bwd)
