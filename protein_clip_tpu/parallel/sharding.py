"""Sharding rules (PartitionSpec trees) for model/optimizer state.

Tensor-parallel layout for the ESM-2 backbone (Megatron-style column/row
split mapped onto our stacked-layer pytree, leading axis = layer):

- attention q/k/v: column-parallel — output (head) dim over 'model';
- attention o   : row-parallel — input dim over 'model';
- FFN wi        : column-parallel — intermediate dim over 'model';
- FFN wo        : row-parallel — intermediate (input) dim over 'model';
- embeddings / LayerNorms / biases of row-parallel layers: replicated.

With these constraints XLA's SPMD partitioner inserts exactly one
reduce-scatter/all-reduce pair per block over ICI — the standard TP recipe
(jax-ml.github.io/scaling-book) — no manual collectives needed.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def esm_param_specs(params_like: Any) -> Any:
    """PartitionSpec pytree matching models.esm2.init_params structure."""
    M = MODEL_AXIS
    lin_col = {"w": P(None, None, M), "b": P(None, M)}   # (L, in, out) col-split
    lin_row = {"w": P(None, M, None), "b": P(None)}      # (L, in, out) row-split
    ln = {"w": P(None), "b": P(None)}
    specs = {
        "embed": {"word": P()},
        "layers": {
            "attn": {
                "q": dict(lin_col), "k": dict(lin_col), "v": dict(lin_col),
                "o": dict(lin_row),
                "ln": dict(ln),
            },
            "ffn": {"wi": dict(lin_col), "wo": dict(lin_row), "ln": dict(ln)},
        },
        "final_ln": {"w": P(), "b": P()},
    }
    return specs


def head_param_specs(params_like: Any) -> Any:
    """Trainable heads are tiny (<1M params): replicate everything."""
    return jax.tree.map(lambda _: P(), params_like)


def to_shardings(mesh: Mesh, specs: Any) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    shardings = to_shardings(mesh, specs)
    return jax.tree.map(jax.device_put, params, shardings)
