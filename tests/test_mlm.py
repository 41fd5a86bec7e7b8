"""MLM capability: masking utilities, sweep, masked-CE objective."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from protein_clip_tpu.data.tokenizer import EsmTokenizer, MASK_ID
from protein_clip_tpu.eval.mlm_sweep import sweep
from protein_clip_tpu.models import esm2
from protein_clip_tpu.models.mlm import (
    changed_fraction, mask_sequence, mask_tokens, mlm_loss,
)


def test_mask_sequence_rate():
    rng = random.Random(0)
    seq = "M" * 10000
    masked = mask_sequence(seq, 0.3, ".", rng)
    frac = masked.count(".") / len(seq)
    assert abs(frac - 0.3) < 0.02
    assert len(masked) == len(seq)


def test_mask_sequence_zero_and_one():
    rng = random.Random(0)
    assert mask_sequence("MKTV", 0.0, ".", rng) == "MKTV"
    assert mask_sequence("MKTV", 1.0, ".", rng) == "...."


def test_changed_fraction_via_tokenizer():
    tok = EsmTokenizer()
    seq = "MKTVRQERLK"
    masked = "MK.VRQ.RLK"
    a, b = tok.encode(seq), tok.encode(masked)
    frac = changed_fraction(a, b, np.ones_like(a))
    # 2 residues of 10 changed; cls/eos unchanged -> 2/12
    np.testing.assert_allclose(frac, 2 / 12)


def test_sweep_monotone(rng):
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = ["".join(rng.choice(aas, 50)) for _ in range(20)]
    result = sweep(seqs, probs=(0.1, 0.5), seed=0)
    assert np.mean(result[0.5]) > np.mean(result[0.1])


def test_mask_tokens_respects_specials(rng):
    tok = EsmTokenizer()
    batch = tok(["MKTVRQERLKMKTVRQERLK"] * 4)
    ids = jnp.asarray(batch["input_ids"])
    mask = jnp.asarray(batch["attention_mask"])
    masked, labels = mask_tokens(jax.random.key(0), ids, mask, 0.5)
    m = np.asarray(masked)
    l = np.asarray(labels)
    # cls/eos/pad never masked
    assert (m[:, 0] == 0).all()
    assert not ((m == MASK_ID) & (np.asarray(ids) <= 3)).any()
    # labels only at masked positions and hold the original id
    at = l != -100
    assert (m[at] == MASK_ID).all()
    assert (l[at] == np.asarray(ids)[at]).all()
    assert at.sum() > 0


def test_mlm_loss_decreases_prob_of_uniform(rng):
    cfg = esm2.ESM2Config.tiny()
    esm_params = esm2.init_params(jax.random.key(0), cfg)
    lm_head = esm2.init_lm_head(jax.random.key(1), cfg)
    tok = EsmTokenizer()
    batch = tok(["MKTVRQERLKMKTVRQERLK"] * 4)
    ids = jnp.asarray(batch["input_ids"])
    mask = jnp.asarray(batch["attention_mask"])
    masked, labels = mask_tokens(jax.random.key(2), ids, mask, 0.3)
    loss = float(mlm_loss(esm_params, lm_head, masked, mask, labels, cfg))
    assert np.isfinite(loss)
    # random init: close to uniform over 33 tokens
    assert abs(loss - np.log(33)) < 1.0


def _host_mask(encs, rng, probs):
    """Deterministic host-side masking of residue positions (never
    cls/eos), per-sequence probability — so segments in one packed row
    carry DIFFERENT observed mask ratios, the case a row-level
    token-dropout rescale gets wrong."""
    masked = []
    for e, p in zip(encs, probs):
        e2 = e.copy()
        for t in range(1, len(e) - 1):
            if rng.random() < p:
                e2[t] = MASK_ID
        masked.append(e2)
    return masked


def test_packed_mlm_hidden_matches_unpacked(rng):
    """Segment-aware token-dropout: a packed row whose segments have very
    different mask ratios must reproduce each sequence's solo hidden
    states (esm2.embed computes the rescale per segment)."""
    from protein_clip_tpu.data.packing import pack_sequences

    cfg = esm2.ESM2Config.tiny()
    assert cfg.token_dropout
    params = esm2.init_params(jax.random.key(0), cfg)
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = ["".join(rng.choice(aas, int(L)))
            for L in rng.integers(6, 28, 6)]
    encs = [tok.encode(s) for s in seqs]
    masked = _host_mask(encs, rng, probs=[0.6, 0.0, 0.3, 0.1, 0.5, 0.2])

    packed = pack_sequences(masked, row_len=64, row_multiple=1)
    mask = (packed.segment_ids > 0).astype(np.int32)
    h_packed = np.asarray(esm2.forward(
        params, jnp.asarray(packed.ids), jnp.asarray(mask), cfg,
        segment_ids=jnp.asarray(packed.segment_ids),
        positions=jnp.asarray(packed.positions)))

    for i, e in enumerate(masked):
        ids = jnp.asarray(e[None, :], jnp.int32)
        m = jnp.ones((1, len(e)), jnp.int32)
        h_solo = np.asarray(esm2.forward(params, ids, m, cfg))[0]
        r, k = packed.owner_row[i], packed.owner_seg[i]
        at = packed.segment_ids[r] == k
        np.testing.assert_allclose(h_packed[r][at], h_solo,
                                   atol=2e-5, rtol=2e-4)


def test_packed_mlm_loss_matches_unpacked(rng):
    """(sum CE, masked count) from packed rows == from the padded batch."""
    from protein_clip_tpu.data.packing import pack_sequences
    from protein_clip_tpu.models.mlm import mlm_loss_terms

    cfg = esm2.ESM2Config.tiny()
    params = esm2.init_params(jax.random.key(0), cfg)
    lm_head = esm2.init_lm_head(jax.random.key(1), cfg)
    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = ["".join(rng.choice(aas, int(L)))
            for L in rng.integers(6, 28, 6)]
    encs = [tok.encode(s) for s in seqs]
    masked = _host_mask(encs, rng, probs=[0.5, 0.1, 0.4, 0.0, 0.3, 0.2])

    # unpacked reference: pad-to-longest batch
    T = max(len(e) for e in encs)
    ids_u = np.ones((len(encs), T), np.int32)          # <pad>
    msk_u = np.zeros((len(encs), T), np.int32)
    lbl_u = np.full((len(encs), T), -100, np.int32)
    for i, (o, m) in enumerate(zip(encs, masked)):
        ids_u[i, :len(m)] = m
        msk_u[i, :len(m)] = 1
        lbl_u[i, :len(m)] = np.where(m != o, o, -100)
    s_u, c_u = mlm_loss_terms(params, lm_head, jnp.asarray(ids_u),
                              jnp.asarray(msk_u), jnp.asarray(lbl_u), cfg)

    # packed: same encodings (masking preserves lengths, so the
    # first-fit-decreasing placement is identical for orig and masked)
    pk_m = pack_sequences(masked, row_len=64, row_multiple=1)
    pk_o = pack_sequences(encs, row_len=64, row_multiple=1)
    lbl_p = np.where(pk_m.ids != pk_o.ids, pk_o.ids, -100)
    mask_p = (pk_m.segment_ids > 0).astype(np.int32)
    s_p, c_p = mlm_loss_terms(
        params, lm_head, jnp.asarray(pk_m.ids), jnp.asarray(mask_p),
        jnp.asarray(lbl_p), cfg,
        segment_ids=jnp.asarray(pk_m.segment_ids),
        positions=jnp.asarray(pk_m.positions))
    assert float(c_p) == float(c_u) > 0
    np.testing.assert_allclose(float(s_p), float(s_u), rtol=1e-5)


def test_tokenize_packed_rows_wire(rng):
    """Single-side int8 wire + device-side segment derivation round-trip."""
    from protein_clip_tpu.train.packed_engine import (derive_segments,
                                                      tokenize_packed_rows)

    tok = EsmTokenizer()
    aas = list("LAGVSERTIDPKQNFYMHWC")
    seqs = ["".join(rng.choice(aas, int(L)))
            for L in rng.integers(5, 60, 20)]
    ids8 = tokenize_packed_rows(tok, seqs)
    assert ids8.dtype == jnp.int8
    R, L = ids8.shape
    assert L % 128 == 0 and R % 16 == 0
    ids, seg, pos = derive_segments(ids8)
    # every sequence appears exactly once, tokens intact
    ids_np, seg_np, pos_np = map(np.asarray, (ids, seg, pos))
    found = 0
    encs = {tuple(tok.encode(s)) for s in seqs}
    for r in range(R):
        for k in range(1, seg_np[r].max() + 1):
            at = seg_np[r] == k
            e = tuple(ids_np[r][at])
            assert e in encs
            np.testing.assert_array_equal(pos_np[r][at],
                                          np.arange(at.sum()))
            found += 1
    assert found == len(seqs)


def test_mlm_loss_grads_flow_to_head(rng):
    cfg = esm2.ESM2Config.tiny()
    esm_params = esm2.init_params(jax.random.key(0), cfg)
    lm_head = esm2.init_lm_head(jax.random.key(1), cfg)
    tok = EsmTokenizer()
    batch = tok(["MKTVRQERLK"] * 2)
    ids = jnp.asarray(batch["input_ids"])
    mask = jnp.asarray(batch["attention_mask"])
    masked, labels = mask_tokens(jax.random.key(2), ids, mask, 0.4)
    g = jax.grad(lambda h: mlm_loss(esm_params, h, masked, mask, labels,
                                    cfg))(lm_head)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in jax.tree.leaves(g))
