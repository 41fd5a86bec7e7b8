"""Masked-language-model capability over the shared ESM-2 stack.

The reference explores MLM in notebooks/MLM_Testing.ipynb (N1 in SURVEY.md):
char-level masking with '.' (ESM vocab id 29), a dataset yielding
(pep, rec, masked_pep, masked_rec), and a sweep measuring the fraction of
token ids changed per masking probability. The README's "Masked Language
Model" section frames it as an objective over the same frozen encoder.

Here: string- and token-level masking utilities plus a jit-able masked-CE
objective through models.esm2.lm_logits (the ESM LM head with tied decoder).
"""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp

from ..data.tokenizer import MASK_ID, PAD_ID, CLS_ID, EOS_ID
from . import esm2


def mask_sequence(seq: str, p: float, mask_char: str = ".",
                  rng: random.Random | None = None) -> str:
    """Character-level masking (MLM_Testing.ipynb cell 5): each residue is
    replaced by mask_char with probability p."""
    rng = rng or random
    return "".join(mask_char if rng.random() < p else c for c in seq)


def changed_fraction(ids_orig, ids_masked, mask) -> float:
    """Fraction of valid token ids changed by masking — the notebook's
    empirical check that the masking rate reaches the tokenizer (cells 7-9)."""
    import numpy as np
    valid = np.asarray(mask).astype(bool)
    diff = (np.asarray(ids_orig) != np.asarray(ids_masked)) & valid
    return float(diff.sum() / max(valid.sum(), 1))


def mask_tokens(key: jax.Array, input_ids: jax.Array,
                attention_mask: jax.Array, p: float,
                mask_token_id: int = MASK_ID):
    """Token-level masking for training: valid non-special positions become
    <mask> with prob p. Returns (masked_ids, labels) with labels=-100 at
    unmasked positions (ignored by the loss)."""
    special = ((input_ids == PAD_ID) | (input_ids == CLS_ID)
               | (input_ids == EOS_ID))
    eligible = (attention_mask > 0) & ~special
    bern = jax.random.bernoulli(key, p, input_ids.shape)
    chosen = bern & eligible
    masked = jnp.where(chosen, mask_token_id, input_ids)
    labels = jnp.where(chosen, input_ids, -100)
    return masked, labels


def mlm_loss(esm_params, lm_head, masked_ids, attention_mask, labels,
             cfg: esm2.ESM2Config, remat: bool = False,
             segment_ids=None, positions=None) -> jax.Array:
    """Masked cross-entropy at masked positions only.

    segment_ids/positions (packed rows, data/packing.py): block-diagonal
    attention, per-segment RoPE restart AND per-segment token-dropout
    ratios, so the packed loss terms equal the unpacked ones exactly
    (tests/test_mlm.py::test_packed_mlm_loss_matches_unpacked)."""
    s, c = mlm_loss_terms(esm_params, lm_head, masked_ids, attention_mask,
                          labels, cfg, remat=remat,
                          segment_ids=segment_ids, positions=positions)
    return s / jnp.maximum(c, 1.0)


def mlm_loss_terms(esm_params, lm_head, masked_ids, attention_mask, labels,
                   cfg: esm2.ESM2Config, remat: bool = False,
                   segment_ids=None, positions=None
                   ) -> tuple[jax.Array, jax.Array]:
    """(sum of masked-position CE, masked count) — the shard-local terms a
    data-parallel step psums before dividing (parallel/mlm_step.py), so the
    global loss is the true mean over ALL masked positions regardless of
    how many landed on each shard."""
    hidden = esm2.forward(esm_params, masked_ids, attention_mask, cfg,
                          remat=remat, segment_ids=segment_ids,
                          positions=positions)
    logits = esm2.lm_logits(esm_params, lm_head, hidden, cfg)
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.clip(labels, 0, cfg.vocab_size - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    is_masked = (labels != -100).astype(jnp.float32)
    return jnp.sum(nll * is_masked), jnp.sum(is_masked)
