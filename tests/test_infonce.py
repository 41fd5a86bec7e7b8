"""InfoNCE numerics: stable logsumexp form == reference's naive exp/log form.

Oracle: the reference's formula (training_utils.py:74-89) re-stated in NumPy.
"""

import numpy as np
import jax.numpy as jnp

from protein_clip_tpu.ops.infonce import (
    clip_infonce, infonce_from_logits, naive_infonce_from_logits,
    filip_direction_loss, filip_loss,
)


def numpy_reference_loss(logits):
    """Reference recipe: exp -> log ratios, symmetric mean."""
    exp_logits = np.exp(logits)
    diag = np.diag(logits)
    l_r = -np.mean(np.log(np.exp(diag) / exp_logits.sum(axis=1)))
    l_p = -np.mean(np.log(np.exp(diag) / exp_logits.sum(axis=0)))
    return 0.5 * (l_r + l_p)


def test_stable_matches_naive_and_numpy(rng):
    logits = rng.normal(size=(16, 16)).astype(np.float32) * 2.0
    ref = numpy_reference_loss(logits.astype(np.float64))
    stable = float(infonce_from_logits(jnp.asarray(logits)))
    naive = float(naive_infonce_from_logits(jnp.asarray(logits)))
    np.testing.assert_allclose(stable, ref, rtol=1e-6)
    np.testing.assert_allclose(naive, ref, rtol=1e-5)


def test_stable_survives_large_logits(rng):
    # exp(t) scaling can push logits > 88 -> naive form overflows f32
    logits = rng.normal(size=(8, 8)).astype(np.float32) * 5 + 100.0
    stable = float(infonce_from_logits(jnp.asarray(logits)))
    assert np.isfinite(stable)
    naive = float(naive_infonce_from_logits(jnp.asarray(logits)))
    assert not np.isfinite(naive)  # documents why we do NOT train with it


def test_clip_infonce_from_embeddings(rng):
    pep = rng.normal(size=(8, 4)).astype(np.float32)
    rec = rng.normal(size=(8, 4)).astype(np.float32)
    got = float(clip_infonce(jnp.asarray(pep), jnp.asarray(rec)))
    ref = numpy_reference_loss((pep @ rec.T).astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_perfect_alignment_lower_than_random(rng):
    eye = np.eye(8, dtype=np.float32) * 10
    rand = rng.normal(size=(8, 8)).astype(np.float32)
    assert float(infonce_from_logits(jnp.asarray(eye))) < float(
        infonce_from_logits(jnp.asarray(rand)))


def test_random_loss_close_to_log_batch(rng):
    # the reference normalizes loss curves by -log(1/B) (visualizations.py:123)
    B = 64
    logits = np.zeros((B, B), dtype=np.float32)
    got = float(infonce_from_logits(jnp.asarray(logits)))
    np.testing.assert_allclose(got, np.log(B), rtol=1e-6)


def test_filip_direction_loss_oracle(rng):
    logits = rng.normal(size=(10, 10)).astype(np.float32)
    # reference training_utils_filip.py:4-23 (use_dcl=False)
    exp_l = np.exp(logits.astype(np.float64))
    ref = np.mean(-np.log(np.diag(exp_l)) + np.log(exp_l.sum(axis=1)))
    got = float(filip_direction_loss(jnp.asarray(logits)))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_filip_dcl_masks_diagonal(rng):
    logits = rng.normal(size=(6, 6)).astype(np.float32)
    exp_l = np.exp(logits.astype(np.float64))
    masked = exp_l * (1 - np.eye(6))
    ref = np.mean(-np.log(np.diag(exp_l)) + np.log(masked.sum(axis=1)))
    got = float(filip_direction_loss(jnp.asarray(logits), use_dcl=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_filip_loss_symmetric_average(rng):
    a = rng.normal(size=(5, 5)).astype(np.float32)
    b = rng.normal(size=(5, 5)).astype(np.float32)
    got = float(filip_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = 0.5 * (float(filip_direction_loss(jnp.asarray(a)))
                 + float(filip_direction_loss(jnp.asarray(b))))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_fused_infonce_vmem_guard_thresholds():
    """Negative-pool scaling: the reference batch (256x128) and 4x it fit
    the single-shot kernel; huge pools and odd dims fall back to lax."""
    from protein_clip_tpu.train.clip_engine import fused_infonce_fits

    assert fused_infonce_fits(256, 128)      # reference global batch
    assert fused_infonce_fits(512, 128)      # 2x negative pool
    assert not fused_infonce_fits(1024, 128)  # 9.4 MB working set -> lax
    assert not fused_infonce_fits(256, 100)   # off sublane alignment
