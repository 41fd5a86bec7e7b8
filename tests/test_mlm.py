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
