"""Experimental fused FFN wi+gelu Pallas matmul (PCT_FFN_PALLAS=1).

Target: the ceiling decomposition's biggest unclaimed line (docs/PERF.md).
XLA's wi fusion runs at 134 TF/s vs the epilogue-free wo's 187 — the gap
IS the gelu epilogue: inside XLA's fused loop each output tile is
matmul-then-gelu strictly serial, so the MXU idles while the VPU
evaluates erf (~20 ms/step of drag at the bench shape).

Hypothesis: a Pallas kernel that computes the program's output in TWO
independent row sub-blocks (matmul A; matmul B; gelu A; gelu B) hands
Mosaic's instruction scheduler chains it can overlap — sub-block B's MXU
work is independent of sub-block A's VPU epilogue. If Mosaic schedules
MXU and VPU units concurrently across those chains, the epilogue hides
behind the next matmul instead of stalling it.

Numerics: same op order as models/esm2._dense + _gelu_exact — f32
accumulation, cast to the compute dtype, add the stored-dtype bias, gelu
in f32, cast back. Two drift sources, both rounding-class: MXU
accumulation order inside one (bn, H) x (H, bm) contraction (identical
to what any XLA retile produces), and the in-kernel erf (Mosaic has no
erf primitive, so this module carries the Eigen rational approximation
XLA's ErfImpl32 is derived from: measured max 7 f32 ulp vs lax.erf,
2 / 800k bf16 outputs off by one ulp; tests pin 1-2 bf16 ulp).

Backward: custom_vjp replays the eager composition (XLA matmuls) — the
kernel is a forward-path optimization; the frozen-backbone headline path
never differentiates through it, and unfrozen paths get the exact eager
VJP.

Measured (docs/PERF.md "Pallas FFN wi+gelu experiment"): see the note —
this module stays env-gated unless the TPU A/B shows a win.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tpu_budgets import on_tpu as _on_tpu

# Per-program output tile. bn is split into two independent sub-blocks
# inside the kernel (the MXU/VPU overlap trick above); bm spans full
# 512-lane tiles. VMEM at (512, 640) x (640, 512) bf16: x 640 KB + w
# 640 KB + f32 acc 1 MB, comfortably double-bufferable.
_BN = 512
_BM = 512


def enabled() -> bool:
    return os.environ.get("PCT_FFN_PALLAS") == "1" and _on_tpu()


def _gelu_f32(a, mode: str):
    if mode == "tanh":
        return jax.nn.gelu(a, approximate=True)
    return a * 0.5 * (1.0 + jax.lax.erf(a / math.sqrt(2.0)))


# Eigen generic_fast_erf_float rational approximation — the SAME expansion
# XLA's ErfImpl32 lowers `lax.erf` to (xla/hlo/builder/lib/math.cc cites
# Eigen), so in-kernel erf stays bitwise-identical to the eager path as
# long as fma contraction matches; tests/test_ffn_pallas.py pins equality
# empirically (Mosaic has no erf primitive — this is why it's hand-rolled).
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08,
              -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04,
             -1.68282697438203e-03, -7.37332916720468e-03,
             -1.42647390514189e-02)


def _poly(x2, coeffs):
    acc = jnp.full_like(x2, coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x2 + c
    return acc


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    return x * _poly(x2, _ERF_ALPHA) / _poly(x2, _ERF_BETA)


def _gelu_f32_kernel(a, mode: str):
    """In-kernel gelu: tanh mode lowers natively; erf via the Eigen poly."""
    if mode == "tanh":
        return jax.nn.gelu(a, approximate=True)
    return a * 0.5 * (1.0 + _erf_f32(a / math.sqrt(2.0)))


def _kernel(x_ref, w_ref, b_ref, o_ref, *, mode: str, out_dtype,
            sub_blocks: int):
    x = x_ref[...]                      # (bn, H) compute dtype
    w = w_ref[...]                      # (H, bm)
    b = b_ref[...]                      # (1, bm) stored dtype
    bn = x.shape[0]
    sub = bn // sub_blocks
    accs = []
    for i in range(sub_blocks):        # independent MXU chains first
        accs.append(jax.lax.dot_general(
            x[i * sub:(i + 1) * sub], w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    for i, acc in enumerate(accs):     # VPU epilogues second
        z = acc.astype(out_dtype) + b  # match _dense: cast, THEN bias
        y = _gelu_f32_kernel(z.astype(jnp.float32), mode)
        o_ref[i * sub:(i + 1) * sub, :] = y.astype(out_dtype)


def _pick_block(n: int, want: int, align: int) -> int:
    """Largest align-multiple divisor of n that is <= want; 0 if none."""
    best = 0
    for c in range(align, min(want, n) + 1, align):
        if n % c == 0:
            best = c
    return best


def fits(n: int, h: int, m: int) -> bool:
    return (_pick_block(n, _BN, 256) > 0 and _pick_block(m, _BM, 512) > 0
            and h % 128 == 0)


def _call(x2, w, b, mode: str):
    N, H = x2.shape
    M = w.shape[1]
    bn = _pick_block(N, _BN, 256)
    bm = _pick_block(M, _BM, 512)
    grid = (M // bm, N // bn)          # n fastest: w block resident per row
    out = pl.pallas_call(
        functools.partial(_kernel, mode=mode, out_dtype=x2.dtype,
                          sub_blocks=2),
        grid=grid,
        in_specs=[pl.BlockSpec((bn, H), lambda m, n: (n, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((H, bm), lambda m, n: (0, m),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bm), lambda m, n: (0, m),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, bm), lambda m, n: (n, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, M), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=not _on_tpu(),
    )(x2, w, b[None, :])
    return out


def _eager(x2, w, b, mode: str):
    z = (jnp.einsum("nh,hd->nd", x2, w,
                    preferred_element_type=jnp.float32)
         .astype(x2.dtype) + b)
    return _gelu_f32(z.astype(jnp.float32), mode).astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dense_gelu(x2, w, b, mode: str):
    """gelu(x2 @ w + b) with the wi epilogue fused in-kernel.

    x2: (N, H); w: (H, M); b: (M,). Callers flatten (B, T, H) to
    (B*T, H) first and must have checked ``fits``/``enabled``.
    """
    return _call(x2, w, b, mode)


def _fwd(x2, w, b, mode):
    return _call(x2, w, b, mode), (x2, w, b)


def _bwd(mode, res, g):
    x2, w, b = res
    _, vjp = jax.vjp(lambda a, c, d: _eager(a, c, d, mode), x2, w, b)
    return vjp(g)


dense_gelu.defvjp(_fwd, _bwd)
