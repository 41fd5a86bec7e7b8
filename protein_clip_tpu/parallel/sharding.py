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
    """PartitionSpec pytree matching models.esm2.init_params structure.

    Handles BOTH weight layouts per linear (dispatch on ``params_like``):
    - bf16/f32: {"w" (L, in, out), "b" (L, out)};
    - int8 from esm2.quantize_params: {"w_q" (L, in, out) int8,
      "w_s" (L, out) per-output-channel scales, "b"} — w_q splits like w;
      w_s/b follow the OUT axis, so they split on column-parallel linears
      (q/k/v/wi) and replicate on row-parallel ones (o/wo), whose
      s32-accumulator dequant needs every shard's full scale row.
    int8 x TP is VERDICT r4 #4: the big-width win (+51% at 3B) composed
    with the big-width axis.
    """
    M = MODEL_AXIS

    def lin(like: Any, col: bool) -> dict[str, P]:
        w_spec = P(None, None, M) if col else P(None, M, None)
        out_vec = P(None, M) if col else P(None)
        if "w_q" in like:
            return {"w_q": w_spec, "w_s": out_vec, "b": out_vec}
        return {"w": w_spec, "b": out_vec}

    attn = params_like["layers"]["attn"]
    ffn = params_like["layers"]["ffn"]
    ln = {"w": P(None), "b": P(None)}
    specs = {
        "embed": {"word": P()},
        "layers": {
            "attn": {
                "q": lin(attn["q"], True), "k": lin(attn["k"], True),
                "v": lin(attn["v"], True), "o": lin(attn["o"], False),
                "ln": dict(ln),
            },
            "ffn": {"wi": lin(ffn["wi"], True), "wo": lin(ffn["wo"], False),
                    "ln": dict(ln)},
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
    """Place params onto their Megatron shardings. Multi-host: params are
    identical on every process (seeded init / npz load), so
    ``make_array_from_process_local_data`` with the full array materialises
    only the addressable shards (device_put can't target remote devices)."""
    shardings = to_shardings(mesh, specs)
    if jax.process_count() > 1:
        import numpy as np

        def put(v, s):
            host = np.asarray(v)
            return jax.make_array_from_process_local_data(s, host,
                                                          host.shape)
        return jax.tree.map(put, params, shardings)
    return jax.tree.map(jax.device_put, params, shardings)
