"""Sequence-parallel FILIP similarity (SURVEY.md §2.3 SP row).

The FILIP score tensor's memory pressure scales with TA*TB per pair
(models.py:332). The fused kernel (ops/filip_pallas.py) removes the
materialisation on one chip; this module additionally *shards the TA token
axis across the 'data' mesh axis* so sequences longer than one chip's
comfort zone split their token work across ICI:

- each shard computes row-maxes for its TA slice (the max over TB is local
  to a pair);
- sim_a's masked mean over tA = psum of shard-local masked sums / psum of
  counts;
- sim_b's max over tA = pmax across shards, then the local masked mean
  over tB (replicated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS


def filip_similarity_seqsharded(mesh, ha, hb, mask_a, mask_b, temperature):
    """(sim_a, sim_b) with hA's token axis sharded over 'data'.

    ha: (B, TA, D) with TA divisible by the data-axis size; hb replicated.
    Matches models.filip.filip_similarity numerically (pad fill = f32 min).
    """
    neg = jnp.finfo(jnp.float32).min

    def local(ha_shard, ma_shard, hb_full, mb_full, t):
        # shard-local scores: (B, B, TA_local, TB)
        scores = jnp.einsum("atd,bsd->abts", ha_shard, hb_full,
                            preferred_element_type=jnp.float32)
        scores = scores / t.astype(jnp.float32)
        pm = (ma_shard[:, None, :, None].astype(bool)
              & mb_full[None, :, None, :].astype(bool))
        filled = jnp.where(pm, scores, neg)

        # sim_a: local row maxes + masked sum, combined by psum
        s_a = jnp.max(filled, axis=3)                      # (A,B,TA_local)
        ma_b = ma_shard[:, None, :].astype(bool)
        local_sum = jnp.where(ma_b, s_a, 0.0).sum(-1)      # (A,B)
        local_cnt = ma_shard.sum(-1).astype(jnp.float32)   # (A,)
        num = jax.lax.psum(local_sum, DATA_AXIS)
        cnt = jax.lax.psum(local_cnt, DATA_AXIS)
        sim_a = num / jnp.clip(cnt[:, None], 1e-6, None)

        # sim_b: max over the sharded tA axis -> pmax across shards
        s_b_local = jnp.max(filled, axis=2)                # (A,B,TB)
        s_b = jax.lax.pmax(s_b_local, DATA_AXIS)
        mb_b = mb_full[None, :, :].astype(bool)
        sim_b = (jnp.where(mb_b, s_b, 0.0).sum(-1)
                 / jnp.clip(mb_b.sum(-1).astype(jnp.float32), 1e-6, None))
        return sim_a, sim_b

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P(None, DATA_AXIS), P(), P(),
                  P()),
        out_specs=(P(), P()),
        axis_names={DATA_AXIS},
    )
    return fn(ha, mask_a, hb, mask_b, temperature)
