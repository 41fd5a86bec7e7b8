"""FILIP similarity parity vs a NumPy oracle of the reference formula
(models.py:292-356): pairwise token scores / t, pad fill with dtype-min,
max over the other side, eps-clamped masked mean over own side.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protein_clip_tpu.models import filip
from protein_clip_tpu.models.filip import filip_similarity


def numpy_filip_oracle(ha, hb, mask_a, mask_b, temperature, eps=1e-6):
    A, TA, D = ha.shape
    B, TB, _ = hb.shape
    scores = np.einsum("atd,bsd->abts", ha, hb) / temperature
    pm = (mask_a[:, None, :, None].astype(bool)
          & mask_b[None, :, None, :].astype(bool))
    filled = np.where(pm, scores, np.finfo(scores.dtype).min)
    s_a = filled.max(axis=3)  # (A,B,TA)
    s_b = filled.max(axis=2)  # (A,B,TB)
    ma = mask_a[:, None, :].astype(bool)
    mb = mask_b[None, :, :].astype(bool)
    sim_a = np.where(ma, s_a, 0).sum(-1) / np.maximum(
        ma.sum(-1).astype(np.float64), eps)
    sim_b = np.where(mb, s_b, 0).sum(-1) / np.maximum(
        mb.sum(-1).astype(np.float64), eps)
    return sim_a, sim_b


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture
def data(rng):
    B, TA, TB, D = 6, 9, 13, 8
    ha = _norm(rng.normal(size=(B, TA, D))).astype(np.float32)
    hb = _norm(rng.normal(size=(B, TB, D))).astype(np.float32)
    mask_a = np.ones((B, TA), np.int32)
    mask_b = np.ones((B, TB), np.int32)
    mask_a[1, 5:] = 0
    mask_a[2, 2:] = 0
    mask_b[0, 7:] = 0
    mask_b[3, 1:] = 0
    return ha, hb, mask_a, mask_b


def test_filip_similarity_matches_oracle(data):
    ha, hb, mask_a, mask_b = data
    t = 0.8
    sim_a, sim_b = filip_similarity(
        jnp.asarray(ha), jnp.asarray(hb), jnp.asarray(mask_a),
        jnp.asarray(mask_b), jnp.asarray(t))
    ref_a, ref_b = numpy_filip_oracle(
        ha.astype(np.float64), hb.astype(np.float64), mask_a, mask_b, t)
    np.testing.assert_allclose(np.asarray(sim_a), ref_a, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim_b), ref_b, atol=1e-5)


def test_filip_similarity_grouped_matches_per_pair(data):
    """include_group form (reference models.py:326-330,353-354): each (m, n)
    group pair must score exactly as the plain pairwise call on its slices."""
    ha, hb, mask_a, mask_b = data
    M, N, t = 2, 3, 0.7
    gha = jnp.stack([jnp.asarray(ha) * s for s in (1.0, -1.0)])      # (M,B,TA,D)
    ghb = jnp.stack([jnp.roll(jnp.asarray(hb), n, axis=0)
                     for n in range(N)])                             # (N,B,TB,D)
    gma = jnp.stack([jnp.asarray(mask_a)] * M)
    gmb = jnp.stack([jnp.roll(jnp.asarray(mask_b), n, axis=0)
                     for n in range(N)])
    sa, sb = filip.filip_similarity_grouped(gha, ghb, gma, gmb,
                                            jnp.asarray(t))
    assert sa.shape == sb.shape == (M, N, ha.shape[0], hb.shape[0])
    for m in range(M):
        for n in range(N):
            ea, eb = filip_similarity(gha[m], ghb[n], gma[m], gmb[n],
                                      jnp.asarray(t))
            np.testing.assert_allclose(np.asarray(sa[m, n]), np.asarray(ea),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(sb[m, n]), np.asarray(eb),
                                       atol=1e-6)


def test_filip_self_similarity_diag_is_one(rng):
    # identical normalized sequences at t=1: max-sim of a token with itself = 1
    B, T, D = 4, 6, 8
    h = _norm(rng.normal(size=(B, T, D))).astype(np.float32)
    m = np.ones((B, T), np.int32)
    sim_a, sim_b = filip_similarity(jnp.asarray(h), jnp.asarray(h),
                                    jnp.asarray(m), jnp.asarray(m),
                                    jnp.asarray(1.0))
    np.testing.assert_allclose(np.diag(np.asarray(sim_a)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.diag(np.asarray(sim_b)), 1.0, atol=1e-5)


def test_filip_grads_finite(data):
    ha, hb, mask_a, mask_b = data

    def loss(ha_):
        sa, sb = filip_similarity(ha_, jnp.asarray(hb), jnp.asarray(mask_a),
                                  jnp.asarray(mask_b), jnp.asarray(1.0))
        return jnp.sum(sa) + jnp.sum(sb)

    g = jax.grad(loss)(jnp.asarray(ha))
    assert np.isfinite(np.asarray(g)).all()


def test_filip_forward_end_to_end(rng):
    from protein_clip_tpu.models import esm2
    cfg = filip.FILIPConfig(input_dim=64, embedding_dim=16, h1=2, h2=2,
                            esm=esm2.ESM2Config.tiny())
    params = filip.init_params(jax.random.key(0), cfg)
    esm_params = esm2.init_params(jax.random.key(1), cfg.esm)
    B, T = 3, 8
    batch = {
        "pep_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "pep_mask": jnp.asarray(np.tri(B, T, k=T - B) > -1, jnp.int32),
        "rec_ids": jnp.asarray(rng.integers(4, 24, (B, T)), jnp.int32),
        "rec_mask": jnp.ones((B, T), jnp.int32),
    }
    sim_a, sim_b = filip.forward(params, esm_params, batch, cfg)
    assert sim_a.shape == (B, B) and sim_b.shape == (B, B)
    assert np.isfinite(np.asarray(sim_a)).all()


def test_mean_average_similarity_matches_oracle(rng):
    B, T, D = 4, 5, 6
    ha = rng.normal(size=(B, T, D)).astype(np.float32)
    hb = rng.normal(size=(B, T, D)).astype(np.float32)
    ma = np.ones((B, T), np.int32); ma[0, 3:] = 0
    mb = np.ones((B, T), np.int32)
    got = np.asarray(filip.mean_average_similarity(
        jnp.asarray(ha), jnp.asarray(hb), jnp.asarray(ma), jnp.asarray(mb),
        jnp.asarray(2.0)))
    pa = (ha * ma[..., None]).mean(1)
    pb = (hb * mb[..., None]).mean(1)
    ref = pa @ pb.T / 2.0
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_filip_grouped_step_matches_plain(rng):
    """Length-grouped FILIP step (block-assembled similarity) == plain step
    on the same pairs: negatives span groups, diagonal stays aligned."""
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.train import clip_engine, filip_engine

    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = lambda n, lo, hi: ["".join(rng.choice(aas, int(L)))
                              for L in rng.integers(lo, hi, n)]
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = filip.FILIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                             h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = filip.init_params(jax.random.key(1), mcfg)
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params)
    tok = EsmTokenizer()
    peps, recs = seqs(8, 5, 20), seqs(8, 10, 60)

    plain_cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                         accumulated_batches=1, num_chunks=2,
                                         remat=False)
    plain = filip_engine.make_train_step(plain_cfg, optimizer)
    b = clip_engine.tokenize_pair_batch(tok, peps, recs)
    p1, _, l1 = plain(params, opt0, esm_params, b, jax.random.key(2))

    grp_cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                       accumulated_batches=1, num_chunks=2,
                                       length_groups=2, remat=False)
    grouped = filip_engine.make_train_step(grp_cfg, optimizer)
    gb = clip_engine.tokenize_grouped(tok, peps, recs, 2)
    p2, _, l2 = grouped(params, opt0, esm_params, gb, jax.random.key(2))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5, rtol=1e-3)


def test_filip_fused_kernel_rectangular(rng):
    """Ba != Bb (grouped cross blocks): fused kernel == lax oracle."""
    from protein_clip_tpu.ops.filip_pallas import filip_similarity_fused

    Ba, Bb, TA, TB, D = 3, 5, 12, 40, 16
    ha = rng.normal(size=(Ba, TA, D)).astype(np.float32)
    hb = rng.normal(size=(Bb, TB, D)).astype(np.float32)
    ha /= np.linalg.norm(ha, axis=-1, keepdims=True)
    hb /= np.linalg.norm(hb, axis=-1, keepdims=True)
    ma = np.ones((Ba, TA), np.int32); ma[0, 7:] = 0
    mb = np.ones((Bb, TB), np.int32); mb[2, 25:] = 0
    t = jnp.asarray(0.7)
    got_a, got_b = filip_similarity_fused(
        jnp.asarray(ha), jnp.asarray(hb), jnp.asarray(ma), jnp.asarray(mb), t)
    ref_a, ref_b = filip.filip_similarity(
        jnp.asarray(ha), jnp.asarray(hb), jnp.asarray(ma), jnp.asarray(mb), t)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               atol=2e-5)


def test_filip_packed_step_matches_plain(rng):
    """Packed FILIP step (packed backbone + token scatter-back) == plain
    step on the same pairs: per-sequence token sets are identical, so the
    max-sim matrices and head grads must match."""
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.train import clip_engine, filip_engine
    from protein_clip_tpu.train.filip_packed import (
        make_train_step_packed_filip, tokenize_packed)

    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = lambda n, lo, hi: ["".join(rng.choice(aas, int(L)))
                              for L in rng.integers(lo, hi, n)]
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = filip.FILIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                             h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = filip.init_params(jax.random.key(1), mcfg)
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params)
    tok = EsmTokenizer()
    peps, recs = seqs(8, 5, 20), seqs(8, 10, 60)

    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   remat=False)
    plain = filip_engine.make_train_step(cfg, optimizer)
    b = clip_engine.tokenize_pair_batch(tok, peps, recs)
    p1, _, l1 = plain(params, opt0, esm_params, b, jax.random.key(2))

    packed_step = make_train_step_packed_filip(cfg, optimizer,
                                               rows_per_chunk=2)
    pb = tokenize_packed(tok, peps, recs)
    p2, _, l2 = packed_step(params, opt0, esm_params, pb, jax.random.key(2))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5, rtol=1e-3)


def test_filip_tiered_packed_step_matches_plain(rng):
    """Width-tiered packed FILIP step == plain step: tiers scatter into one
    (B, T_max, D) buffer, so the max-sim kernel sees identical token sets."""
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.train import clip_engine, filip_engine
    from protein_clip_tpu.train.filip_packed import (
        make_train_step_packed_filip, tokenize_packed)

    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = lambda n, lo, hi: ["".join(rng.choice(aas, int(L)))
                              for L in rng.integers(lo, hi, n)]
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = filip.FILIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                             h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = filip.init_params(jax.random.key(1), mcfg)
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params)
    tok = EsmTokenizer()
    # rec lengths straddle the 128/256 tier split at rec_row_len=256
    peps, recs = seqs(8, 5, 20), seqs(8, 10, 250)

    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   remat=False)
    plain = filip_engine.make_train_step(cfg, optimizer)
    b = clip_engine.tokenize_pair_batch(tok, peps, recs)
    p1, _, l1 = plain(params, opt0, esm_params, b, jax.random.key(2))

    packed_step = make_train_step_packed_filip(cfg, optimizer,
                                               rows_per_chunk=2)
    pb = tokenize_packed(tok, peps, recs, rec_row_len=256,
                         tier_widths=[128, 256])
    assert "rec_packs" in pb
    p2, _, l2 = packed_step(params, opt0, esm_params, pb, jax.random.key(2))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5, rtol=1e-3)


def test_filip_scatter_tier_step_matches_flat_packed(rng):
    """Scatter-tier packed FILIP (flat backbone pack + per-length-tier
    token buffers + tier-pair block assembly) must match the flat packed
    step exactly — same loss AND same SGD-updated params (SGD so a grad
    discrepancy through the tiered scatter cannot hide)."""
    import optax

    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.train import clip_engine
    from protein_clip_tpu.train.filip_packed import (
        make_train_step_packed_filip, tokenize_packed)

    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = lambda n, lo, hi: ["".join(rng.choice(aas, int(L)))
                              for L in rng.integers(lo, hi, n)]
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = filip.FILIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                             h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = filip.init_params(jax.random.key(1), mcfg)
    optimizer = optax.sgd(5e-2)
    opt0 = optimizer.init(params)
    tok = EsmTokenizer()
    # wide length spread so several scatter tiers are non-empty
    peps, recs = seqs(8, 5, 120), seqs(8, 10, 300)

    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2,
                                   remat=False)
    step = make_train_step_packed_filip(
        cfg, optimizer, similarity_fn=filip.filip_similarity,
        rows_per_chunk=1)

    b_flat = tokenize_packed(tok, peps, recs)
    p1, _, l1 = step(params, opt0, esm_params, b_flat, jax.random.key(2))

    b_st = tokenize_packed(tok, peps, recs, scatter_tiers=4)
    assert "pep_stiers" in b_st and len(b_st["rec_stiers"]) > 1
    # backbone wire identical: stiers only add scatter metadata
    np.testing.assert_array_equal(np.asarray(b_st["pep_ids"]),
                                  np.asarray(b_flat["pep_ids"]))
    p2, _, l2 = step(params, opt0, esm_params, b_st, jax.random.key(2))

    np.testing.assert_allclose(float(l2), float(l1), rtol=2e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5, rtol=1e-3)

    # Chain a SECOND step through the FUSED kernel's hand-written backward
    # (interpret mode here): the padded-operm sentinel once produced NaN
    # grads via the scatter-transpose NaN fill — invisible to a single
    # step's loss, fatal to the next. Both chained paths must stay finite
    # and equal.
    fstep = make_train_step_packed_filip(cfg, optimizer, rows_per_chunk=1)
    pf, of, _ = fstep(params, opt0, esm_params, b_st, jax.random.key(2))
    for leaf in jax.tree.leaves(pf):
        assert np.isfinite(np.asarray(leaf)).all()
    _, _, l_next = fstep(pf, of, esm_params, b_st, jax.random.key(3))
    pf1, of1, _ = fstep(params, opt0, esm_params, b_flat, jax.random.key(2))
    _, _, l_next_flat = fstep(pf1, of1, esm_params, b_flat,
                              jax.random.key(3))
    assert np.isfinite(float(l_next))
    np.testing.assert_allclose(float(l_next), float(l_next_flat), rtol=2e-4)


def test_filip_scatter_tier_eval_matches(rng):
    from protein_clip_tpu.data.tokenizer import EsmTokenizer
    from protein_clip_tpu.models import esm2
    from protein_clip_tpu.train import clip_engine
    from protein_clip_tpu.train.filip_packed import (
        make_eval_step_packed_filip, tokenize_packed)

    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = lambda n, lo, hi: ["".join(rng.choice(aas, int(L)))
                              for L in rng.integers(lo, hi, n)]
    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = filip.FILIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                             h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg)
    params = filip.init_params(jax.random.key(1), mcfg)
    tok = EsmTokenizer()
    peps, recs = seqs(8, 5, 120), seqs(8, 10, 300)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=8,
                                   accumulated_batches=1, num_chunks=2)
    step = make_eval_step_packed_filip(
        cfg, similarity_fn=filip.filip_similarity, rows_per_chunk=1)
    l1 = step(params, esm_params, tokenize_packed(tok, peps, recs))
    l2 = step(params, esm_params,
              tokenize_packed(tok, peps, recs, scatter_tiers=4))
    np.testing.assert_allclose(float(l2), float(l1), rtol=2e-5)
