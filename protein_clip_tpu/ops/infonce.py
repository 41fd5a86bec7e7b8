"""Symmetric InfoNCE for dual-encoder contrastive training.

The reference computes ``exp(logits)`` then logs
(``/root/reference/modules/training_utils.py:74-89``) — numerically naive and
overflow-prone once the learnable temperature grows (logits carry a factor
``exp(t)``, models.py:51). The TPU-native loss uses logsumexp, which is equal
in exact arithmetic; ``naive_infonce`` reproduces the reference's exact
floating-point recipe for parity tests.

Also hosts the FILIP direction loss (training_utils_filip.py:4-39) with the
optional DCL diagonal masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_infonce(pep: jax.Array, rec: jax.Array) -> jax.Array:
    """Symmetric InfoNCE over scaled embeddings (stable logsumexp form).

    pep, rec: (B, D) embeddings already scaled by exp(t/2) each, so
    ``logits = pep @ rec.T`` carries exp(t) — the reference's convention
    (models.py:51, training_utils.py:257-264).
    """
    logits = jnp.einsum("id,jd->ij", pep, rec,
                        preferred_element_type=jnp.float32)
    return infonce_from_logits(logits)


def infonce_from_logits(logits: jax.Array) -> jax.Array:
    logits = logits.astype(jnp.float32)
    diag = jnp.diagonal(logits)
    l_r = jnp.mean(jax.nn.logsumexp(logits, axis=1) - diag)
    l_p = jnp.mean(jax.nn.logsumexp(logits, axis=0) - diag)
    return 0.5 * (l_r + l_p)


def naive_infonce_from_logits(logits: jax.Array) -> jax.Array:
    """The reference's exact exp-then-log recipe (training_utils.py:85-89).

    Used only as a parity oracle; do not train with this.
    """
    logits = logits.astype(jnp.float32)
    exp_logits = jnp.exp(logits)
    diag = jnp.diagonal(logits)
    l_r = -jnp.mean(jnp.log(jnp.exp(diag) / jnp.sum(exp_logits, axis=1)))
    l_p = -jnp.mean(jnp.log(jnp.exp(diag) / jnp.sum(exp_logits, axis=0)))
    return 0.5 * (l_r + l_p)


def filip_direction_loss(logits: jax.Array, use_dcl: bool = False) -> jax.Array:
    """Per-direction FILIP CE (training_utils_filip.py:4-23), stable form.

    With use_dcl the diagonal is removed from the denominator.
    """
    logits = logits.astype(jnp.float32)
    diag = jnp.diagonal(logits)
    if use_dcl:
        b = logits.shape[0]
        eye = jnp.eye(b, dtype=bool)
        denom_logits = jnp.where(eye, -jnp.inf, logits)
    else:
        denom_logits = logits
    lse = jax.nn.logsumexp(denom_logits, axis=1)
    return jnp.mean(lse - diag)


def filip_loss(sim_a: jax.Array, sim_b: jax.Array,
               use_dcl: bool = False) -> jax.Array:
    """Symmetric average of the two direction losses (training_utils_filip.py:26-39)."""
    return 0.5 * (filip_direction_loss(sim_a, use_dcl)
                  + filip_direction_loss(sim_b, use_dcl))
