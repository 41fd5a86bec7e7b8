"""Trainable projection heads over the frozen ESM-2 backbone.

Re-creates the reference ``Encoder`` head pipeline
(``/root/reference/modules/models.py:7-90``):

    esm last_hidden_state (B,T,640)
      -> Linear 640->128 (projection)
      -> per-token FFN  [ (Linear, ReLU, LayerNorm, Dropout) x (h1-1), Linear ]
      -> masked mean over tokens
      -> pooled FFN     [ same structure, depth h2 ]
      -> L2 normalize * exp(temperature/2)

as pure functions over a params pytree. FFN hidden blocks are stacked on a
leading depth axis and scanned, so h1/h2 are config — not architecture — and
compile cost is depth-independent.

Dropout uses explicit PRNG keys (functional); pass ``train=False`` for the
deterministic eval path the reference gets from ``model.eval()``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def _uniform_linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), dtype, -bound, bound),
    }


def init_ffn(key, dim: int, depth: int, dtype=jnp.float32) -> Params:
    """(Linear→ReLU→LayerNorm→Dropout) x (depth-1) + Linear (models.py:54-73)."""
    n_blocks = depth - 1
    keys = jax.random.split(key, n_blocks + 1)
    if n_blocks > 0:
        blocks = [_uniform_linear_init(keys[i], dim, dim, dtype) for i in range(n_blocks)]
        stacked = {
            "w": jnp.stack([b["w"] for b in blocks]),
            "b": jnp.stack([b["b"] for b in blocks]),
            "ln_w": jnp.ones((n_blocks, dim), dtype),
            "ln_b": jnp.zeros((n_blocks, dim), dtype),
        }
    else:
        stacked = {
            "w": jnp.zeros((0, dim, dim), dtype),
            "b": jnp.zeros((0, dim), dtype),
            "ln_w": jnp.zeros((0, dim), dtype),
            "ln_b": jnp.zeros((0, dim), dtype),
        }
    return {"blocks": stacked, "out": _uniform_linear_init(keys[-1], dim, dim, dtype)}


def init_head(key, input_dim: int, embedding_dim: int, h1: int, h2: int,
              dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "projection": _uniform_linear_init(k1, input_dim, embedding_dim, dtype),
        "aa_ffn": init_ffn(k2, embedding_dim, h1, dtype),
        "emb_ffn": init_ffn(k3, embedding_dim, h2, dtype),
    }


def _layer_norm(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,        # notebooks/negative_cosine_similarities.ipynb (N5)
    "gelu": jax.nn.gelu,
}


def apply_ffn(params: Params, x: jax.Array, *, dropout_rate: float,
              train: bool, rng: jax.Array | None,
              activation: str = "relu") -> jax.Array:
    """Scan the hidden blocks, then the output linear."""
    n_blocks = params["blocks"]["w"].shape[0]
    use_dropout = train and dropout_rate > 0.0 and n_blocks > 0
    if use_dropout and rng is None:
        raise ValueError("dropout requires an rng key in train mode")

    def block_body(h, bp, bkey):
        h = jnp.einsum("...d,de->...e", h, bp["w"],
                       preferred_element_type=jnp.float32).astype(h.dtype) + bp["b"]
        h = ACTIVATIONS[activation](h)
        h = _layer_norm(h, bp["ln_w"], bp["ln_b"])
        if use_dropout:
            keep = jax.random.bernoulli(bkey, 1.0 - dropout_rate, h.shape)
            h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)
        return h

    if n_blocks > 0:
        if use_dropout:
            x, _ = jax.lax.scan(
                lambda h, inp: (block_body(h, inp[0], inp[1]), None),
                x, (params["blocks"], jax.random.split(rng, n_blocks)))
        else:
            x, _ = jax.lax.scan(
                lambda h, bp: (block_body(h, bp, None), None),
                x, params["blocks"])
    out = params["out"]
    return (jnp.einsum("...d,de->...e", x, out["w"],
                       preferred_element_type=jnp.float32).astype(x.dtype)
            + out["b"])


def masked_mean(h: jax.Array, mask: jax.Array) -> jax.Array:
    """sum(h*mask)/clamp(count,1) over the token axis (models.py:75-90)."""
    mask_f = mask.astype(h.dtype)
    s = jnp.sum(h * mask_f[..., None], axis=-2)
    cnt = jnp.clip(jnp.sum(mask_f, axis=-1, keepdims=True), 1.0, None)
    return s / cnt


def encode_pooled(params: Params, hidden: jax.Array, mask: jax.Array,
                  temperature: jax.Array, *, dropout_rate: float = 0.1,
                  train: bool = False, rng: jax.Array | None = None,
                  activation: str = "relu") -> jax.Array:
    """Full head pipeline -> scaled pooled embedding (models.py:32-52)."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    proj = params["projection"]
    x = (jnp.einsum("btd,de->bte", hidden, proj["w"],
                    preferred_element_type=jnp.float32).astype(hidden.dtype)
         + proj["b"])
    x = apply_ffn(params["aa_ffn"], x, dropout_rate=dropout_rate,
                  train=train, rng=r1, activation=activation)
    pooled = masked_mean(x, mask)
    pooled = apply_ffn(params["emb_ffn"], pooled, dropout_rate=dropout_rate,
                       train=train, rng=r2, activation=activation)
    normed = pooled * jax.lax.rsqrt(
        jnp.sum(jnp.square(pooled.astype(jnp.float32)), axis=-1, keepdims=True)
        .astype(pooled.dtype) + jnp.finfo(jnp.float32).tiny)
    return normed * jnp.exp(temperature.astype(normed.dtype) / 2.0)


def encode_pooled_packed(params: Params, hidden: jax.Array, sel: jax.Array,
                         temperature: jax.Array, *,
                         dropout_rate: float = 0.1, train: bool = False,
                         rng: jax.Array | None = None,
                         activation: str = "relu") -> jax.Array:
    """encode_pooled over PACKED rows (data/packing.py).

    hidden: (R, L, H) backbone states of packed rows; sel: (N, R, L) one-hot
    segment selector. Returns (N, D) scaled embeddings in original sequence
    order — numerically the unpacked pipeline's output per sequence.
    """
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    proj = params["projection"]
    x = (jnp.einsum("rlh,hd->rld", hidden, proj["w"],
                    preferred_element_type=jnp.float32).astype(hidden.dtype)
         + proj["b"])
    x = apply_ffn(params["aa_ffn"], x, dropout_rate=dropout_rate,
                  train=train, rng=r1, activation=activation)
    sums = jnp.einsum("nrl,rld->nd", sel.astype(x.dtype), x,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    cnt = jnp.clip(jnp.sum(sel, axis=(1, 2)), 1.0, None).astype(x.dtype)
    pooled = sums / cnt[:, None]
    pooled = apply_ffn(params["emb_ffn"], pooled, dropout_rate=dropout_rate,
                       train=train, rng=r2, activation=activation)
    normed = pooled * jax.lax.rsqrt(
        jnp.sum(jnp.square(pooled.astype(jnp.float32)), axis=-1,
                keepdims=True).astype(pooled.dtype)
        + jnp.finfo(jnp.float32).tiny)
    return normed * jnp.exp(temperature.astype(normed.dtype) / 2.0)


def encode_tokens(params: Params, hidden: jax.Array, *,
                  dropout_rate: float = 0.1, train: bool = False,
                  rng: jax.Array | None = None,
                  activation: str = "relu") -> jax.Array:
    """FILIP variant: per-token embeddings, no pool/normalize (models.py:178-196)."""
    proj = params["projection"]
    x = (jnp.einsum("btd,de->bte", hidden, proj["w"],
                    preferred_element_type=jnp.float32).astype(hidden.dtype)
         + proj["b"])
    return apply_ffn(params["aa_ffn"], x, dropout_rate=dropout_rate,
                     train=train, rng=rng, activation=activation)
