"""Fused dh=32 segment-aware attention vs eager (interpret on CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from protein_clip_tpu.models import esm2
from protein_clip_tpu.ops.attention_pallas import (
    _eager_reference, fused_attention)


def _qkvm(rng, B=2, T=128, NH=4, DH=32):
    q = rng.normal(size=(B, T, NH, DH)).astype(np.float32) * 0.3
    k = rng.normal(size=(B, T, NH, DH)).astype(np.float32) * 0.3
    v = rng.normal(size=(B, T, NH, DH)).astype(np.float32)
    mask = np.ones((B, T), np.int32)
    mask[0, T // 2:] = 0
    mask[1 % B, T - 5:] = 0
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask))


def test_fused_matches_eager(rng):
    q, k, v, mask = _qkvm(rng)
    got = np.asarray(fused_attention(q, k, v, mask))
    ref = np.asarray(_eager_reference(q, k, v, mask))
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=1e-5)


def test_fused_q_blocking_matches_eager(rng):
    """T larger than the 512 q-block: block loop must tile exactly."""
    q, k, v, mask = _qkvm(rng, B=1, T=1024, NH=2)
    got = np.asarray(fused_attention(q, k, v, mask))
    ref = np.asarray(_eager_reference(q, k, v, mask))
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=1e-5)


def test_fused_segment_mask_blocks_cross_attention(rng):
    """Packed rows: tokens must only attend within their own segment —
    the kernel's result per segment equals running that segment alone."""
    B, T, NH, DH = 1, 64, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, NH, DH)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(B, T, NH, DH)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(B, T, NH, DH)).astype(np.float32))
    seg = np.zeros((B, T), np.int32)
    seg[0, :20] = 1
    seg[0, 20:45] = 2  # 45:64 stays 0 = gap
    seg = jnp.asarray(seg)

    packed = np.asarray(fused_attention(q, k, v, seg))
    for lo, hi in ((0, 20), (20, 45)):
        solo = np.asarray(fused_attention(
            q[:, lo:hi], k[:, lo:hi], v[:, lo:hi],
            jnp.ones((B, hi - lo), jnp.int32)))
        np.testing.assert_allclose(packed[:, lo:hi], solo, atol=1e-5)


def test_fused_grads_match_eager(rng):
    q, k, v, mask = _qkvm(rng, B=1, T=16)

    def loss_fused(q_, k_, v_):
        return jnp.sum(fused_attention(q_, k_, v_, mask) ** 2)

    def loss_eager(q_, k_, v_):
        return jnp.sum(_eager_reference(q_, k_, v_, mask) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_eager, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_grads_match_eager_single_shot(rng):
    """Flash-style Pallas backward, single-block regime (T <= the bwd
    score-tile cap): dq/dk/dv must match the eager VJP, including the
    pad-query rows whose uniform softmax routes do into dv but not dq/dk."""
    q, k, v, mask = _qkvm(rng, B=2, T=256, NH=4)

    def run(f):
        return jax.grad(lambda q_, k_, v_: jnp.sum(f(q_, k_, v_, mask) ** 2),
                        argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(run(fused_attention), run(_eager_reference)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_grads_match_eager_q_blocked(rng):
    """T past the backward cap: the q-block loop with f32 dk/dv carries
    must still match the eager VJP exactly."""
    from protein_clip_tpu.ops.attention_pallas import _bwd_q_block

    T = 1024
    assert _bwd_q_block(T) < T  # really exercises the blocked path
    q, k, v, mask = _qkvm(rng, B=1, T=T, NH=2)

    def run(f):
        return jax.grad(lambda q_, k_, v_: jnp.sum(f(q_, k_, v_, mask) ** 2),
                        argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(run(fused_attention), run(_eager_reference)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_grads_match_eager_multirow_bwd(rng, monkeypatch):
    """Multi-row backward programs (R rows per program, like the forward's
    rows-per-program amortization): forcing R=4 over an 8-row batch must
    leave every per-row gradient exactly where the R=1 kernel put it."""
    monkeypatch.setenv("PCT_ATTN_BWD_ROWS_PER_PROGRAM", "4")
    q, k, v, mask = _qkvm(rng, B=8, T=64, NH=4)

    def run(f):
        return jax.grad(lambda q_, k_, v_: jnp.sum(f(q_, k_, v_, mask) ** 2),
                        argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(run(fused_attention), run(_eager_reference)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_grads_match_eager_packed_segments(rng):
    """Packed rows (multi-segment + gap): backward must respect the
    segment mask exactly as the eager where() does."""
    B, T, NH, DH = 1, 128, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, NH, DH)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(B, T, NH, DH)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(B, T, NH, DH)).astype(np.float32))
    seg = np.zeros((B, T), np.int32)
    seg[0, :40] = 1
    seg[0, 40:90] = 2  # 90: stays 0 = gap
    seg = jnp.asarray(seg)

    def run(f):
        return jax.grad(lambda q_, k_, v_: jnp.sum(f(q_, k_, v_, seg) ** 2),
                        argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(run(fused_attention), run(_eager_reference)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_esm_forward_fused_matches_eager(rng):
    cfg_e = esm2.ESM2Config.tiny()
    # fused path only engages on TPU; on CPU this exercises the dispatch
    # logic falling back to eager — outputs must be identical either way.
    cfg_f = dataclasses.replace(cfg_e, attention_impl="fused",
                                fused_min_seq_len=8)
    params = esm2.init_params(jax.random.key(0), cfg_e)
    ids = jnp.asarray(rng.integers(4, 24, (3, 24)), jnp.int32)
    mask = jnp.ones((3, 24), jnp.int32)
    a = esm2.forward(params, ids, mask, cfg_e)
    b = esm2.forward(params, ids, mask, cfg_f)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_choose_q_block_alignment():
    """Every pad bucket must get a q block that is either the full T
    (static slices) or a 128-multiple divisor of T (dynamic lane slices) —
    Mosaic rejects other lane offsets (192/320/448 broke round 2's first
    chooser on the TPU)."""
    from protein_clip_tpu.data.tokenizer import DEFAULT_BUCKETS
    from protein_clip_tpu.ops.attention_pallas import _choose_q_block

    for T in tuple(DEFAULT_BUCKETS) + (2048,):
        qb = _choose_q_block(T)
        assert qb == T or (qb % 128 == 0 and T % qb == 0), (T, qb)
        # VMEM bound: the f32 score tile stays ~<=2 MB for multi-block Ts
        if qb != T:
            assert qb * T * 4 <= (1 << 21), (T, qb)


def test_fused_matches_eager_at_odd_buckets(rng):
    """192/320/448-token buckets through the kernel dispatch path."""
    for T in (192, 320, 448):
        q, k, v, mask = _qkvm(rng, B=1, T=T, NH=2)
        got = np.asarray(fused_attention(q, k, v, mask))
        ref = np.asarray(_eager_reference(q, k, v, mask))
        m = np.asarray(mask).astype(bool)
        np.testing.assert_allclose(got[m], ref[m], atol=1e-5)
