"""Feasibility probe: does Mosaic lower s8 x s8 -> s32 dot_general on this
TPU generation, and at what rate vs bf16?

Run on the real chip: `python tools/probe_int8_pallas.py`. Prints one line
per case. Informs ops/quant_pallas.py (fused dynamic-quant W8A8 matmul —
the in-kernel quant that the XLA int8 path pays ~6 bandwidth passes for).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(x_ref, w_ref, o_ref, *, out_dtype):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype)


def mm(x, w, out_dtype, bn=512, bm=512):
    N, H = x.shape
    M = w.shape[1]
    return pl.pallas_call(
        functools.partial(_mm_kernel, out_dtype=out_dtype),
        grid=(N // bn, M // bm),
        in_specs=[pl.BlockSpec((bn, H), lambda n, m: (n, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((H, bm), lambda n, m: (0, m),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, bm), lambda n, m: (n, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, M), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, w)


def bench(fn, *args, iters=50):
    out = fn(*args)
    jnp.sum(out).block_until_ready()
    float(jnp.sum(out))  # tunnel sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    N, H, M = 8192, 2560, 2560
    flops = 2 * N * H * M
    xb = jnp.asarray(rng.normal(size=(N, H)), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(H, M)) * 0.02, jnp.bfloat16)
    xi = jnp.asarray(rng.randint(-127, 128, size=(N, H)), jnp.int8)
    wi = jnp.asarray(rng.randint(-127, 128, size=(H, M)), jnp.int8)

    f = jax.jit(functools.partial(mm, out_dtype=jnp.float32))
    dt = bench(f, xb, wb)
    print(f"bf16 pallas matmul: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s")

    try:
        g = jax.jit(functools.partial(mm, out_dtype=jnp.int32))
        dt = bench(g, xi, wi)
        print(f"s8xs8->s32 pallas:  {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TOP/s")
        ref = np.asarray(xi, np.int32) @ np.asarray(wi, np.int32)
        got = np.asarray(g(xi, wi))
        print("s8 exact:", bool((ref == got).all()))
    except Exception as e:  # noqa: BLE001 — probe prints, doesn't crash
        print("s8 pallas FAILED:", type(e).__name__, str(e)[:300])

    # XLA (non-pallas) comparison points
    h = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    dt = bench(h, xi, wi)
    print(f"s8xs8->s32 XLA:     {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TOP/s")
    hb = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    dt = bench(hb, xb, wb)
    print(f"bf16 XLA:           {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
