"""Batch embedding service — the serving-side API.

The reference has no inference story beyond its eval scripts; production use
of a trained dual encoder is "embed a corpus, answer similarity queries".
This module embeds arbitrary sequence lists through either trained side with
length-bucketed batching (one compiled program per bucket) and exposes a
nearest-partner query over precomputed embeddings.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import EsmTokenizer
from ..models import clip
from ..train.gradcache import encode_hidden_chunked


@dataclasses.dataclass
class Embedder:
    """Embeds sequences with one side ('pep' or 'rec') of a trained CLIP."""

    params: dict
    esm_params: dict
    mcfg: clip.CLIPConfig
    side: str = "rec"
    batch_size: int = 64
    num_chunks: int = 4
    tokenizer: EsmTokenizer = dataclasses.field(default_factory=EsmTokenizer)

    def __post_init__(self):
        mcfg = self.mcfg
        side = self.side

        @jax.jit
        def _embed(params, esm_params, ids, mask):
            h = encode_hidden_chunked(esm_params, ids, mask, mcfg.esm,
                                      self.num_chunks)
            return clip.encode_side(params, side, h.astype(jnp.float32),
                                    mask, mcfg, train=False)

        self._embed = _embed

    def __call__(self, sequences: list[str]) -> np.ndarray:
        """(N, D) scaled embeddings; order preserved. Batches are length-
        sorted so each compiled bucket is reused maximally, then unsorted."""
        order = sorted(range(len(sequences)), key=lambda i: len(sequences[i]))
        out = np.empty((len(sequences), self.mcfg.embedding_dim), np.float32)
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            batch = [sequences[i] for i in idx]
            # pad ragged tail to a full batch (static shape), drop extras
            pad = bs - len(batch)
            enc = self.tokenizer(batch + [""] * pad)
            emb = self._embed(self.params, self.esm_params,
                              jnp.asarray(enc["input_ids"]),
                              jnp.asarray(enc["attention_mask"]))
            out[idx] = np.asarray(emb)[: len(batch)]
        return out


def nearest_partners(query_emb: np.ndarray, corpus_emb: np.ndarray,
                     k: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Top-k corpus indices + scores per query (dot product — embeddings
    already carry the exp(t) scaling symmetrically)."""
    scores = np.asarray(query_emb) @ np.asarray(corpus_emb).T
    idx = np.argsort(-scores, axis=1)[:, :k]
    top = np.take_along_axis(scores, idx, axis=1)
    return idx, top
