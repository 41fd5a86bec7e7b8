"""Dual-encoder CLIP model (reference ``ExtendedCLIP``, models.py:92-130).

Two head stacks (peptide / receptor) share one frozen ESM-2 backbone —
the reference passes the same frozen module to both encoders
(``/root/reference/main.py:21,31``) — plus a learnable scalar temperature
(init 1.0, models.py:113).

TPU-native split: trainable head params live in a separate pytree from the
frozen backbone params so the optimizer/grad only ever touches the small
head pytree, and the backbone can sit in bf16 while heads train in f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from . import esm2, heads

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    input_dim: int = 640          # ESM-2 t30 hidden (main.py:24)
    embedding_dim: int = 128      # main.py:27
    h1: int = 2                   # main.py:28
    h2: int = 2                   # main.py:29
    dropout: float = 0.1          # main.py:30
    # FFN activation: 'relu' (reference), 'tanh' (notebook N5 variant), 'gelu'
    activation: str = "relu"
    esm: esm2.ESM2Config = dataclasses.field(default_factory=esm2.ESM2Config.t30_150M)


def init_params(key: jax.Array, cfg: CLIPConfig, dtype=jnp.float32) -> Params:
    """Trainable params only (frozen backbone initialised/loaded separately)."""
    kp, kr = jax.random.split(key)
    return {
        "pep": heads.init_head(kp, cfg.input_dim, cfg.embedding_dim,
                               cfg.h1, cfg.h2, dtype),
        "rec": heads.init_head(kr, cfg.input_dim, cfg.embedding_dim,
                               cfg.h1, cfg.h2, dtype),
        "temperature": jnp.asarray(1.0, dtype),
    }


def encode_side(params: Params, side: str, hidden: jax.Array,
                mask: jax.Array, cfg: CLIPConfig, *, train: bool = False,
                rng: jax.Array | None = None) -> jax.Array:
    """Head pipeline for one side over precomputed backbone hidden states."""
    return heads.encode_pooled(
        params[side], hidden, mask, params["temperature"],
        dropout_rate=cfg.dropout, train=train, rng=rng,
        activation=cfg.activation)


def forward(params: Params, esm_params: Params, batch: dict[str, jax.Array],
            cfg: CLIPConfig, *, train: bool = False,
            rng: jax.Array | None = None,
            remat: bool = False) -> tuple[jax.Array, jax.Array]:
    """Full forward: (pep_embedding, rec_embedding), both (B, D) scaled.

    batch keys: pep_ids, pep_mask, rec_ids, rec_mask.
    The backbone runs under stop_gradient — it is frozen by contract
    (main.py:22-23), so no cotangents are ever built for its 150M params.
    """
    rp = rr = None
    if rng is not None:
        rp, rr = jax.random.split(rng)
    hp = jax.lax.stop_gradient(
        esm2.forward(esm_params, batch["pep_ids"], batch["pep_mask"],
                     cfg.esm, remat=remat))
    hr = jax.lax.stop_gradient(
        esm2.forward(esm_params, batch["rec_ids"], batch["rec_mask"],
                     cfg.esm, remat=remat))
    pep = encode_side(params, "pep", hp.astype(jnp.float32), batch["pep_mask"],
                      cfg, train=train, rng=rp)
    rec = encode_side(params, "rec", hr.astype(jnp.float32), batch["rec_mask"],
                      cfg, train=train, rng=rr)
    return pep, rec


def cosine_similarity_matrix(pep: jax.Array, rec: jax.Array,
                             temperature: jax.Array) -> jax.Array:
    """Raw cosine matrix: logits de-scaled by exp(-t) (visualizations.py:38-52)."""
    logits = jnp.einsum("id,jd->ij", pep, rec,
                        preferred_element_type=jnp.float32)
    return logits * jnp.exp(-temperature.astype(jnp.float32))
