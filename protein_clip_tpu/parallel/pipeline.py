"""Pipeline parallelism — design stub (SURVEY.md §2.3: "not needed at 150M;
not planned beyond a stub").

At the reference's scale the frozen ESM-2 t30 (150M) fits one v5e chip with
room for the 256-pair global batch, so the profitable axes are data and
tensor parallelism (parallel/step.py, parallel/sharding.py). Pipeline
parallelism becomes relevant only for esm2_t48_15B-class backbones; the
design reserved here is:

- stage boundary at the stacked-layer axis: split ``params['layers']``
  (leading dim L) into S contiguous stage slices, one mesh 'stage' axis;
- the frozen-backbone case is embarrassingly pipelinable: microbatches
  already stream through ``lax.scan`` (train/gradcache.py), so GPipe-style
  fill/drain costs 1/num_chunks bubble with no recompute;
- collectives: point-to-point ``ppermute`` of (chunk, T, H) activations
  between neighbouring stages over ICI.

``split_layer_stages`` implements the parameter split so checkpoints and
shardings are already stage-aware; the scheduler lands when a backbone that
needs it does.
"""

from __future__ import annotations

from typing import Any

import jax


def split_layer_stages(esm_params: dict[str, Any], num_stages: int
                       ) -> list[dict[str, Any]]:
    """Split the stacked-layer pytree into contiguous stage slices.

    Embedding joins stage 0; the final LayerNorm joins the last stage.
    """
    layers = esm_params["layers"]
    n_layers = jax.tree.leaves(layers)[0].shape[0]
    if n_layers % num_stages:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{num_stages} stages")
    per = n_layers // num_stages
    stages = []
    for s in range(num_stages):
        stage: dict[str, Any] = {
            "layers": jax.tree.map(lambda x: x[s * per:(s + 1) * per], layers)
        }
        if s == 0:
            stage["embed"] = esm_params["embed"]
        if s == num_stages - 1:
            stage["final_ln"] = esm_params["final_ln"]
        stages.append(stage)
    return stages
