"""FILIP late-interaction model (reference ``ExtendedFILIP``, models.py:198-356).

Per-token embeddings from both sides, L2-normalised, then the FILIP
similarity: for each pair (i, j) take the max over the *other* side's tokens
and the masked mean over one's own tokens — in both directions.

``filip_similarity`` here is the straightforward lax reference used for
correctness and as the oracle for the fused Pallas kernel
(``protein_clip_tpu/ops/filip_pallas.py``), which never materialises the
(B, B, TA, TB) score tensor — the reference's memory hot spot
(models.py:332) that forces its batch size down to 10
(main_2protein_filip.py:33).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from . import esm2, heads

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FILIPConfig:
    input_dim: int = 640
    embedding_dim: int = 128
    h1: int = 2
    h2: int = 2
    dropout: float = 0.1
    activation: str = "relu"
    esm: esm2.ESM2Config = dataclasses.field(default_factory=esm2.ESM2Config.t30_150M)


def init_params(key: jax.Array, cfg: FILIPConfig, dtype=jnp.float32) -> Params:
    kp, kr = jax.random.split(key)
    return {
        "pep": heads.init_head(kp, cfg.input_dim, cfg.embedding_dim,
                               cfg.h1, cfg.h2, dtype),
        "rec": heads.init_head(kr, cfg.input_dim, cfg.embedding_dim,
                               cfg.h1, cfg.h2, dtype),
        "temperature": jnp.asarray(1.0, dtype),
    }


def encode_side_tokens(params: Params, side: str, hidden: jax.Array,
                       cfg: FILIPConfig, *, train: bool = False,
                       rng: jax.Array | None = None) -> jax.Array:
    """Per-token embeddings, L2-normalised along d (models.py:238-239)."""
    x = heads.encode_tokens(params[side], hidden,
                            dropout_rate=cfg.dropout, train=train, rng=rng,
                            activation=cfg.activation)
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                            keepdims=True))
    return (x.astype(jnp.float32) / norm).astype(x.dtype)


def filip_similarity(ha: jax.Array, hb: jax.Array, mask_a: jax.Array,
                     mask_b: jax.Array, temperature: jax.Array
                     ) -> tuple[jax.Array, jax.Array]:
    """Reference FILIP score (models.py:292-356), lax implementation.

    ha: (B, TA, D) normalised; hb: (B, TB, D) normalised;
    masks: (B, T) {0,1}. Returns (sim_a, sim_b), each (B, B).
    """
    mask_a = mask_a.astype(bool)
    mask_b = mask_b.astype(bool)
    scores = jnp.einsum("atd,bsd->abts", ha, hb,
                        preferred_element_type=jnp.float32)
    scores = scores / temperature.astype(jnp.float32)
    pair_mask = mask_a[:, None, :, None] & mask_b[None, :, None, :]
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(pair_mask, scores, neg)

    # max over the other side's tokens
    s_a = jnp.max(masked, axis=3)          # (A, B, TA)
    s_b = jnp.max(masked, axis=2)          # (A, B, TB)

    # masked mean over own tokens (eps-clamped denom, models.py:247-264)
    def mmean(t, m, eps=1e-6):
        t = jnp.where(m, t, 0.0)
        return t.sum(-1) / jnp.clip(m.sum(-1).astype(jnp.float32), eps, None)

    sim_a = mmean(s_a, mask_a[:, None, :])
    sim_b = mmean(s_b, mask_b[None, :, :])
    return sim_a, sim_b


def filip_similarity_grouped(ha: jax.Array, hb: jax.Array,
                             mask_a: jax.Array, mask_b: jax.Array,
                             temperature: jax.Array
                             ) -> tuple[jax.Array, jax.Array]:
    """The reference's ``include_group=True`` form (models.py:299,326-330,
    353-354): inputs carry leading group dims — ha (M, B, TA, D),
    hb (N, B, TB, D), masks likewise — and every (m, n) group pair scores
    independently. Returns (sim_a, sim_b), each (M, N, B, B).

    No reference entry point ever passes include_group=True (dead option
    there); kept as the idiomatic JAX form — two vmaps over the pairwise
    ``filip_similarity`` — for API completeness.
    """
    def one_m(a, ma):
        return jax.vmap(
            lambda b, mb: filip_similarity(a, b, ma, mb, temperature)
        )(hb, mask_b)

    return jax.vmap(one_m)(ha, mask_a)


def token_max_similarity(ha: jax.Array, hb: jax.Array) -> jax.Array:
    """Per-pair token max-similarity (the notebooks/filip.ipynb prototype,
    N2): for aligned pair i, mean over hA[i]'s tokens of the max dot product
    against hB[i]'s tokens. Returns (B,)."""
    scores = jnp.einsum("btd,bsd->bts", ha, hb,
                        preferred_element_type=jnp.float32)
    return jnp.mean(jnp.max(scores, axis=-1), axis=-1)


def mean_average_similarity(ha, hb, mask_a, mask_b, temperature):
    """Unused-in-training reference variant (models.py:266-290): plain mean
    pooling over tokens (divides by T, not valid count) then dot / t."""
    pa = jnp.mean(ha * mask_a[..., None].astype(ha.dtype), axis=1)
    pb = jnp.mean(hb * mask_b[..., None].astype(hb.dtype), axis=1)
    return jnp.einsum("ad,bd->ab", pa, pb,
                      preferred_element_type=jnp.float32) / temperature


def encode_batch_tokens(params: Params, esm_params: Params,
                        batch: dict[str, jax.Array], cfg: FILIPConfig, *,
                        train: bool = False, rng: jax.Array | None = None,
                        remat: bool = False, num_chunks: int = 1
                        ) -> tuple[jax.Array, jax.Array]:
    """Both sides' normalised per-token embeddings (ha, hb).

    num_chunks > 1 scans the frozen backbone over microbatches
    (train/gradcache.encode_hidden_chunked) so FILIP batches scale far past
    the reference's memory wall of 10 (main_2protein_filip.py:33)."""
    from ..train.gradcache import encode_hidden_chunked

    rp = rr = None
    if rng is not None:
        rp, rr = jax.random.split(rng)
    if num_chunks > 1:
        hp = encode_hidden_chunked(esm_params, batch["pep_ids"],
                                   batch["pep_mask"], cfg.esm, num_chunks,
                                   remat)
        hr = encode_hidden_chunked(esm_params, batch["rec_ids"],
                                   batch["rec_mask"], cfg.esm, num_chunks,
                                   remat)
    else:
        hp = jax.lax.stop_gradient(
            esm2.forward(esm_params, batch["pep_ids"], batch["pep_mask"],
                         cfg.esm, remat=remat))
        hr = jax.lax.stop_gradient(
            esm2.forward(esm_params, batch["rec_ids"], batch["rec_mask"],
                         cfg.esm, remat=remat))
    ha = encode_side_tokens(params, "pep", hp.astype(jnp.float32), cfg,
                            train=train, rng=rp)
    hb = encode_side_tokens(params, "rec", hr.astype(jnp.float32), cfg,
                            train=train, rng=rr)
    return ha, hb


def forward(params: Params, esm_params: Params, batch: dict[str, jax.Array],
            cfg: FILIPConfig, *, train: bool = False,
            rng: jax.Array | None = None, remat: bool = False,
            similarity_fn=filip_similarity,
            num_chunks: int = 1) -> tuple[jax.Array, jax.Array]:
    """Full FILIP forward -> (sim_a, sim_b), each (B, B).

    similarity_fn is pluggable so the Pallas fused kernel can slot in.
    """
    ha, hb = encode_batch_tokens(params, esm_params, batch, cfg, train=train,
                                 rng=rng, remat=remat, num_chunks=num_chunks)
    return similarity_fn(ha, hb, batch["pep_mask"], batch["rec_mask"],
                         params["temperature"])
