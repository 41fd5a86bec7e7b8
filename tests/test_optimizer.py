"""Optimizer factory (train/optimizer.py): the production-trainer knobs —
decoupled weight decay, warmup, cosine schedule — and their device-count
independence (the property the pmean-corrected DP grads exist for)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from protein_clip_tpu.train import optimizer as opt_mod


def _run_steps(opt, n, lr_probe_grad):
    """Apply n identical unit-gradient steps to a scalar; return the
    per-step parameter deltas (== the effective per-step step sizes for
    Adam with a constant gradient)."""
    p = jnp.zeros(())
    state = opt.init(p)
    deltas = []
    for _ in range(n):
        upd, state = opt.update(lr_probe_grad, state, p)
        p2 = optax.apply_updates(p, upd)
        deltas.append(float(jnp.abs(p2 - p)))
        p = p2
    return deltas


def test_default_is_reference_adam():
    """build() with no knobs == the reference's plain Adam."""
    a = _run_steps(opt_mod.build(1e-3), 3, jnp.asarray(1.0))
    b = _run_steps(opt_mod.adam(1e-3), 3, jnp.asarray(1.0))
    np.testing.assert_allclose(a, b)


def test_warmup_ramps_then_flat():
    opt = opt_mod.build(1e-2, warmup_steps=4)
    d = _run_steps(opt, 8, jnp.asarray(1.0))
    # linear warmup: first steps strictly smaller, then flat at peak
    assert d[0] < d[3] < d[5]
    np.testing.assert_allclose(d[5], d[7], rtol=1e-4)
    np.testing.assert_allclose(d[5], 1e-2, rtol=1e-3)  # Adam |g|=const -> lr


def test_cosine_decays_to_zero():
    opt = opt_mod.build(1e-2, schedule="cosine", warmup_steps=2,
                        total_steps=10)
    d = _run_steps(opt, 10, jnp.asarray(1.0))
    assert d[1] < max(d), "warmup starts low"
    # decay_steps=10: the last APPLIED step is at count 9, one short of
    # the exact zero — assert a >20x drop from the peak instead
    assert d[-1] < 0.05 * max(d), f"cosine should end near 0, got {d}"
    with pytest.raises(ValueError, match="total_steps"):
        opt_mod.build(1e-2, schedule="cosine")


def test_weight_decay_shrinks_without_grads():
    """AdamW decay is decoupled: zero gradient still shrinks params."""
    opt = opt_mod.build(1e-2, weight_decay=0.1)
    p = jnp.asarray(4.0)
    state = opt.init(p)
    upd, _ = opt.update(jnp.zeros(()), state, p)
    p2 = optax.apply_updates(p, upd)
    assert float(p2) < 4.0


def test_grad_clip_matches_manual_chain_and_binds():
    """build(grad_clip=c) == optax.chain(clip_by_global_norm(c), adam).

    Adam is invariant to a UNIFORM grad rescale (per step), so the binding
    check uses a varying-norm gradient sequence — clipping step 1 (norm 10)
    but not step 2 (norm 0.1) changes the moment mix and the trajectory."""
    grads = [jnp.asarray(10.0), jnp.asarray(0.1)]

    def run(opt):
        p = jnp.zeros(())
        s = opt.init(p)
        for g in grads:
            u, s = opt.update(g, s, p)
            p = optax.apply_updates(p, u)
        return float(p)

    got = run(opt_mod.build(1e-2, grad_clip=1.0))
    want = run(optax.chain(optax.clip_by_global_norm(1.0),
                           opt_mod.build(1e-2)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert abs(got - run(opt_mod.build(1e-2))) > 1e-5, \
        "clip at 1.0 must bind on the norm-10 step"


def test_two_group_clip_is_whole_tree():
    """finetune.make_optimizer hoists the clip OUTSIDE the two-group
    multi_transform: the norm spans backbone + heads together. Pinned by
    exact equality with the manual hoisted chain AND divergence from the
    per-group-clipped construction (group norms 30 vs 40 clip differently
    per group than their joint norm 50)."""
    import optax as _optax

    from protein_clip_tpu.train import finetune
    from protein_clip_tpu.train import optimizer as _opt
    from protein_clip_tpu.train.clip_engine import EngineConfig

    cfg = EngineConfig(model=None, grad_clip=5.0, backbone_lr=1e-3,
                       learning_rate=1e-3)
    params = {"esm": {"w": jnp.zeros((2,))}, "heads": {"w": jnp.zeros((2,))}}
    grad_seq = [
        {"esm": {"w": jnp.full((2,), 30.0 / np.sqrt(2))},
         "heads": {"w": jnp.full((2,), 40.0 / np.sqrt(2))}},
        {"esm": {"w": jnp.full((2,), 0.1)},
         "heads": {"w": jnp.full((2,), 0.1)}},
    ]

    def run(opt):
        p, s = params, opt.init(params)
        for g in grad_seq:
            u, s = opt.update(g, s, p)
            p = _optax.apply_updates(p, u)
        return p

    def groups(grad_clip):
        return _optax.multi_transform(
            {"esm": _opt.from_config(cfg, lr=1e-3, grad_clip=grad_clip),
             "heads": _opt.from_config(cfg, grad_clip=grad_clip)},
            lambda t: {"esm": jax.tree.map(lambda _: "esm", t["esm"]),
                       "heads": jax.tree.map(lambda _: "heads",
                                             t["heads"])})

    got = run(finetune.make_optimizer(cfg))
    want = run(_optax.chain(_optax.clip_by_global_norm(5.0), groups(0.0)))
    per_group = run(groups(5.0))
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert not np.allclose(np.asarray(got["esm"]["w"]),
                           np.asarray(per_group["esm"]["w"]), atol=1e-7), \
        "whole-tree clip must differ from per-group clip"


def test_dp_adamw_matches_single_device(rng):
    """Weight decay is NOT scale-invariant — this is the transform the
    DP gradient-scale fix (pmean over 'data') exists for. One AdamW step
    sharded 8 ways must equal the single-device step exactly."""
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.parallel import mesh as mesh_mod
    from protein_clip_tpu.parallel.step import (make_sharded_train_step,
                                                shard_batch)
    from protein_clip_tpu.train import clip_engine

    esm_cfg = esm2.ESM2Config.tiny()
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, embedding_dim=16,
                           h1=2, h2=2, dropout=0.0, esm=esm_cfg)
    esm_params = esm2.init_params(jax.random.key(1), esm_cfg)
    params = clip.init_params(jax.random.key(2), mcfg)
    cfg = clip_engine.EngineConfig(model=mcfg, batch_size=2,
                                   accumulated_batches=8, num_chunks=8,
                                   remat=False, weight_decay=0.1)
    b = {
        "pep_ids": jnp.asarray(rng.integers(4, 24, (16, 12)), jnp.int32),
        "pep_mask": jnp.ones((16, 12), jnp.int32),
        "rec_ids": jnp.asarray(rng.integers(4, 24, (16, 12)), jnp.int32),
        "rec_mask": jnp.ones((16, 12), jnp.int32),
    }
    optimizer = opt_mod.from_config(cfg)
    opt0 = optimizer.init(params)
    key = jax.random.key(9)

    p1, _, l1 = clip_engine.make_train_step(cfg, optimizer)(
        params, opt0, esm_params, b, key)
    m = mesh_mod.make_mesh()
    p2, _, l2 = make_sharded_train_step(cfg, optimizer, m)(
        params, opt0, esm_params, shard_batch(m, b), key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)
