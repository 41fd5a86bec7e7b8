"""Fused InfoNCE Pallas kernel vs the lax implementation (interpret mode on
the CPU test platform; compiled on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from protein_clip_tpu.ops.infonce import clip_infonce
from protein_clip_tpu.ops.infonce_pallas import fused_infonce


def _data(rng, B=32, D=16, scale=2.0):
    x = rng.normal(size=(B, D)).astype(np.float32) * scale
    y = rng.normal(size=(B, D)).astype(np.float32) * scale
    return jnp.asarray(x), jnp.asarray(y)


def test_forward_matches_lax(rng):
    x, y = _data(rng)
    ref = float(clip_infonce(x, y))
    got = float(fused_infonce(x, y))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_forward_large_logits_stable(rng):
    x, y = _data(rng, scale=12.0)  # logits up to ~hundreds
    got = float(fused_infonce(x, y))
    ref = float(clip_infonce(x, y))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_gradients_match_lax(rng):
    x, y = _data(rng)
    gx_ref, gy_ref = jax.grad(lambda a, b: clip_infonce(a, b),
                              argnums=(0, 1))(x, y)
    gx, gy = jax.grad(lambda a, b: fused_infonce(a, b), argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), atol=1e-6)


def test_jit_and_nondiff_arg(rng):
    x, y = _data(rng, B=16, D=8)
    f = jax.jit(lambda a, b: fused_infonce(a, b))
    np.testing.assert_allclose(float(f(x, y)), float(clip_infonce(x, y)),
                               rtol=1e-6)


def test_rectangular_embedding_dim(rng):
    # D=128 (reference dim), B=256 (reference global batch)
    x, y = _data(rng, B=256, D=128, scale=1.0)
    np.testing.assert_allclose(float(fused_infonce(x, y)),
                               float(clip_infonce(x, y)), rtol=1e-6)


@pytest.mark.parametrize("b,rb", [(384, None), (512, 128)])
def test_tiled_matches_lax(rng, b, rb):
    """Row-tiled kernel (online column logsumexp, two-pass backward) ==
    lax clip_infonce, values and grads."""
    from protein_clip_tpu.ops.infonce_pallas import fused_infonce_tiled

    x = jnp.asarray(rng.normal(size=(b, 16)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, 16)), jnp.float32)

    want, (gx, gy) = jax.value_and_grad(
        lambda x, y: clip_infonce(x, y), argnums=(0, 1))(x, y)
    got, (tx, ty) = jax.value_and_grad(
        lambda x, y: fused_infonce_tiled(x, y, rb), argnums=(0, 1))(x, y)

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tx), np.asarray(gx),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ty), np.asarray(gy),
                               atol=1e-5, rtol=1e-4)
