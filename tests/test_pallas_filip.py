"""Fused FILIP max-sim kernel vs the lax reference implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from protein_clip_tpu.models.filip import filip_similarity
from protein_clip_tpu.ops.filip_pallas import filip_similarity_fused


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _data(rng, B=4, TA=32, TB=64, D=128):
    ha = _norm(rng.normal(size=(B, TA, D))).astype(np.float32)
    hb = _norm(rng.normal(size=(B, TB, D))).astype(np.float32)
    mask_a = np.ones((B, TA), np.int32)
    mask_b = np.ones((B, TB), np.int32)
    mask_a[1 % B, TA // 2:] = 0
    mask_a[2 % B, 3:] = 0
    mask_b[0, TB - 10:] = 0
    mask_b[3 % B, 5:] = 0
    return (jnp.asarray(ha), jnp.asarray(hb), jnp.asarray(mask_a),
            jnp.asarray(mask_b))


@pytest.mark.parametrize("t", [1.0, 0.7])
def test_forward_matches_lax(rng, t):
    ha, hb, ma, mb = _data(rng)
    ref_a, ref_b = filip_similarity(ha, hb, ma, mb, jnp.asarray(t))
    got_a, got_b = filip_similarity_fused(ha, hb, ma, mb, jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               atol=2e-6)


def test_forward_multichunk(rng):
    # TB > 512 exercises the chunk loop
    ha, hb, ma, mb = _data(rng, B=2, TA=64, TB=1024)
    ref = filip_similarity(ha, hb, ma, mb, jnp.asarray(1.0))
    got = filip_similarity_fused(ha, hb, ma, mb, jnp.asarray(1.0))
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-6)


def test_gradients_match_lax(rng):
    ha, hb, ma, mb = _data(rng, B=3, TA=16, TB=32, D=32)
    t = jnp.asarray(0.9)

    def loss_ref(ha_, hb_):
        sa, sb = filip_similarity(ha_, hb_, ma, mb, t)
        # non-trivial weighting so both outputs matter
        w = jnp.arange(sa.size, dtype=jnp.float32).reshape(sa.shape)
        return jnp.sum(sa * w) + jnp.sum(sb * (w + 1.0))

    def loss_fused(ha_, hb_):
        sa, sb = filip_similarity_fused(ha_, hb_, ma, mb, t)
        w = jnp.arange(sa.size, dtype=jnp.float32).reshape(sa.shape)
        return jnp.sum(sa * w) + jnp.sum(sb * (w + 1.0))

    ga_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(ha, hb)
    ga, gb = jax.grad(loss_fused, argnums=(0, 1))(ha, hb)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               atol=2e-5, rtol=1e-4)


def test_temperature_gradient_flows(rng):
    ha, hb, ma, mb = _data(rng, B=2, TA=16, TB=32, D=32)

    def loss(t):
        sa, sb = filip_similarity_fused(ha, hb, ma, mb, t)
        return jnp.mean(sa) + jnp.mean(sb)

    def loss_ref(t):
        sa, sb = filip_similarity(ha, hb, ma, mb, t)
        return jnp.mean(sa) + jnp.mean(sb)

    g = float(jax.grad(loss)(jnp.asarray(0.8)))
    g_ref = float(jax.grad(loss_ref)(jnp.asarray(0.8)))
    np.testing.assert_allclose(g, g_ref, rtol=1e-4)


def test_jit(rng):
    ha, hb, ma, mb = _data(rng, B=2, TA=16, TB=32, D=32)
    f = jax.jit(lambda *a: filip_similarity_fused(*a, jnp.asarray(1.0)))
    got = f(ha, hb, ma, mb)
    ref = filip_similarity(ha, hb, ma, mb, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=2e-6)


def test_blocked_backward_matches_unblocked(rng):
    """A tiny budget forces real (i, j) blocking (ib < Ba, jb < Bb); the
    accumulated gradients must equal the single-block computation."""
    from protein_clip_tpu.ops.filip_pallas import _raw_maxsim_bwd

    ha, hb, ma, mb = _data(rng, B=4, TA=16, TB=32, D=32)
    ga = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    gb = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)

    ref = _raw_maxsim_bwd(ha, hb, ma, mb, ga, gb)          # one block
    # budget of 2*TA*TB elems -> cap=2 -> jb=2, ib=1: 4 i-blocks x 2 j-blocks
    got = _raw_maxsim_bwd(ha, hb, ma, mb, ga, gb,
                          budget_elems=2 * 16 * 32)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
