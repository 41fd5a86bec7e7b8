"""Fused wi+gelu Pallas kernel (ops/ffn_pallas.py, PCT_FFN_PALLAS=1):
forward/grad parity vs the eager composition, and the esm2._ffn_block
routing under the env gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_clip_tpu.models import esm2
from protein_clip_tpu.ops import ffn_pallas


def _xwb(rng, N=512, H=128, M=512, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(N, H)), dtype)
    w = jnp.asarray(rng.normal(size=(H, M)) * 0.1, dtype)
    b = jnp.asarray(rng.normal(size=(M,)) * 0.1, dtype)
    return x, w, b


@pytest.mark.parametrize("mode", ["erf", "tanh"])
def test_forward_matches_eager(rng, mode):
    x, w, b = _xwb(rng)
    out = np.asarray(ffn_pallas._call(x, w, b, mode))
    ref = np.asarray(ffn_pallas._eager(x, w, b, mode))
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_forward_matches_eager_bf16(rng):
    x, w, b = _xwb(rng, dtype=jnp.bfloat16)
    out = np.asarray(ffn_pallas._call(x, w, b, "erf"), np.float32)
    ref = np.asarray(ffn_pallas._eager(x, w, b, "erf"), np.float32)
    # identical op order; only MXU accumulation order may differ -> a
    # couple of bf16 ulps on O(1) activations
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_grads_match_eager(rng):
    x, w, b = _xwb(rng)

    def run(f):
        return jax.grad(lambda a, c, d: jnp.sum(f(a, c, d) ** 2),
                        argnums=(0, 1, 2))(x, w, b)

    for a, c in zip(run(lambda a, c, d: ffn_pallas.dense_gelu(a, c, d, "erf")),
                    run(lambda a, c, d: ffn_pallas._eager(a, c, d, "erf"))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-3, rtol=1e-3)


def test_block_chooser():
    assert ffn_pallas._pick_block(8192, 512, 256) == 512
    assert ffn_pallas._pick_block(768, 512, 256) == 256
    assert ffn_pallas._pick_block(100, 512, 256) == 0
    assert ffn_pallas.fits(8192, 640, 2560)
    assert not ffn_pallas.fits(100, 640, 2560)


def test_ffn_block_routes_through_kernel(rng, monkeypatch):
    """esm2._wi_gelu under PCT_FFN_PALLAS=1 must agree with the default
    path (on CPU the kernel runs in interpret mode; shapes chosen to fit)."""
    monkeypatch.setenv("PCT_FFN_PALLAS", "1")
    monkeypatch.setattr(ffn_pallas, "enabled", lambda: True)
    cfg = esm2.ESM2Config.tiny()
    B, T = 4, 128
    h = jnp.asarray(rng.normal(size=(B, T, cfg.hidden_size)), jnp.float32)
    wi = {"w": jnp.asarray(rng.normal(
        size=(cfg.hidden_size, 512)) * 0.1, jnp.float32),
        "b": jnp.zeros((512,), jnp.float32)}
    out = np.asarray(esm2._wi_gelu(h, wi, cfg))
    monkeypatch.delenv("PCT_FFN_PALLAS")
    ref = np.asarray(esm2._wi_gelu(h, wi, cfg))
    np.testing.assert_allclose(out, ref, atol=2e-6)
